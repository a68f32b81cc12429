from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dup,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_bucketed_topk,
)
from .text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_metrics,
    token_count,
)
