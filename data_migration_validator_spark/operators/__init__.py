from .dedup import (  # noqa: F401
    decontaminate,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_near_dup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup,
    simhash_signatures,
)
from .order import global_row_number, pack_shards  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_sample,
    sample_exact_k,
    stratified_sample,
)
from .scrub import (  # noqa: F401
    DEFAULT_PATTERNS,
    scrub_report,
    scrub_text,
)
from .projection import (  # noqa: F401
    cast_all_to_string,
    column_union,
    exclude_metadata_columns,
    first_seen_union,
    mapped_projection,
    null_safe_string_projection,
    suffix_projection,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
    train_coarse_quantizer,
)
from .text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_metrics,
    token_count,
)
