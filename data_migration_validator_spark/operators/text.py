"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all pyspark.sql built-ins (regexp_count / split /
array ops), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "por"],
}


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(text_col: str | Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split, or 'bpe' — a BPE-ish regex that
    counts word pieces, numbers, and individual punctuation separately."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if mode == "whitespace":
        t = F.trim(c)
        return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    if mode == "bpe":
        return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    raise ValueError(f"unknown mode {mode!r}")


def quality_metrics(text_col: str | Column) -> dict[str, Column]:
    """Quality-scoring columns: length, tokens, mean token length,
    punctuation/digit/uppercase ratios, stopword ratio, and a composite
    [0,1] quality score (heuristics in the C4/Gopher-rules spirit)."""
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    # coalesce ONCE and use the null-safe form everywhere: regexp_count on
    # a NULL yields NULL, which would make every ratio (and the composite
    # score) NULL for null docs — rows that then vanish from BOTH branches
    # of any score-threshold filter
    c = F.coalesce(raw, F.lit(""))
    n_chars = F.length(c)
    toks = _tokens(c)
    n_tokens = token_count(c)
    punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    digits = F.regexp_count(c, F.lit(r"[0-9]"))
    uppers = F.regexp_count(c, F.lit(r"[A-Z]"))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    safe_toks = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(1.0))
    m = {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": n_chars.cast("double") / safe_toks,
        "punct_ratio": punct.cast("double") / safe_chars,
        "digit_ratio": digits.cast("double") / safe_chars,
        "upper_ratio": uppers.cast("double") / safe_chars,
        "stopword_ratio": stop_hits.cast("double") / F.least(safe_toks, F.lit(10.0)),
    }
    # composite: long enough, not punctuation/digit soup, some stopwords
    score = (
        F.least(n_chars.cast("double") / 200.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(m["punct_ratio"] * 4.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(m["digit_ratio"] * 4.0, F.lit(1.0))) * 0.2
        + F.least(m["stopword_ratio"], F.lit(1.0)) * 0.2
    )
    m["quality_score"] = F.round(score, 4)
    return m


def language_id(text_col: str | Column) -> Column:
    """Stopword-hit language heuristic: argmax over per-language distinct
    stopword hits; 'und' (undetermined) when nothing hits."""
    toks = F.array_distinct(_tokens(text_col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties deterministically
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def document_fingerprint(text_col: str | Column, ngram: int = 5) -> Column:
    """Normalization-robust fingerprint: sha256 of the lowercased,
    punctuation-stripped, whitespace-collapsed text.  Two documents differing
    only in case/punctuation/spacing collide — the classic "fingerprint
    clustering" key."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"[^\w\s]", ""),
            r"\s+",
            " ",
        )
    )
    return F.sha2(norm, 256)


def repetition_metrics(df, text_col: str = "text", id_cols=("doc_id",), n: int = 2):
    """Per-document word n-gram repetition metrics (the Gopher/MassiveText
    "repetitious text" filter family: fraction of text inside repeated /
    top n-grams — boilerplate and template spam score high and get culled
    before training).

    Relational plan, no per-doc quadratic work: tokens → n-grams via one
    ``transform(sequence(...))`` (JVM HOF), explode, then TWO hash
    aggregates — (doc, gram) counts, then per-doc rollup.  Partial (map-
    side) aggregation collapses repeats before the shuffle, so a pathological
    doc repeating one gram a million times ships one partial row per task,
    not a million — the plan survives 100 TB and skew alike.

    Output: ``id_cols`` + exact counts (``n_ngrams``, ``dup_ngrams``,
    ``top_ngram_cnt`` — BIGINT, hash-stable for oracles) + derived
    ``dup_ngram_frac`` / ``top_ngram_frac``.  Documents with fewer than
    ``n`` tokens have no n-grams and are absent (nothing to score)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    raw = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(raw)
    sz = F.size(toks)

    def _gram(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(n)]
        )

    # the empty-text guard matters at n=1: split("") is [""], which would
    # otherwise count one phantom empty token
    grams = F.when(
        (sz >= n) & (F.length(F.trim(raw)) > 0),
        F.transform(F.sequence(F.lit(1), sz - n + 1), _gram),
    )
    exploded = df.select(*id_cols, F.explode(grams).alias("__gram"))
    per_gram = exploded.groupBy(*id_cols, "__gram").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    total = F.sum("__cnt").cast("bigint")
    dup = F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt")).otherwise(0)).cast("bigint")
    top = F.max("__cnt").cast("bigint")
    out = per_gram.groupBy(*id_cols).agg(
        total.alias("n_ngrams"), dup.alias("dup_ngrams"), top.alias("top_ngram_cnt")
    )
    return out.select(
        *id_cols,
        "n_ngrams",
        "dup_ngrams",
        "top_ngram_cnt",
        F.round(F.col("dup_ngrams") / F.col("n_ngrams"), 6).alias("dup_ngram_frac"),
        F.round(F.col("top_ngram_cnt") / F.col("n_ngrams"), 6).alias("top_ngram_frac"),
    )


def rolling_min_hash(text_col: str | Column, ngram: int = 5) -> Column:
    """Winnowing-style content key: min xxhash64 over character n-gram
    windows — robust to small edits (one changed region only shifts a few
    windows)."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col, F.lit(""))
    n = F.length(c)
    windows = F.when(
        n >= ngram,
        F.transform(
            F.sequence(F.lit(1), n - ngram + 1),
            lambda i: F.xxhash64(F.substr(c, i, F.lit(ngram))),
        ),
    ).otherwise(F.array(F.xxhash64(c)))
    return F.array_min(windows)
