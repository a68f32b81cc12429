"""Similarity search over embedding columns (array<float>).

- :func:`brute_force_topk` — exact cosine top-k, the correctness baseline.
  Query side broadcasts (queries ≪ corpus); dot product and norms are JVM
  higher-order functions (``zip_with`` + ``aggregate``) so the O(Q×N×D) work
  runs in codegen, partitioned by the corpus — linear scan, embarrassingly
  parallel, no shuffle except the final per-query top-k.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  shrink each query's candidate set; same ranking inside buckets.  Multiple
  hash tables trade recall for cost.
- :func:`cosine_near_dup_pairs` — embedding-cosine near-duplicate detection
  (dedup use-case): LSH-bucketed self-join + threshold.
- :func:`cosine_near_dup_exact` — the exact all-pairs leg of the same
  operator, tiled into B(B+1)/2 balanced block-pair tasks (oracle-checkable;
  the LSH form above is the recall/cost trade at scale).
- :func:`ivf_topk` — IVF (inverted-file) ANN: a k-means coarse quantizer
  trained on a bounded deterministic sample partitions the corpus into
  centroid lists; each query probes only its ``n_probe`` nearest lists.
  Complements LSH: data-adaptive buckets, tunable recall via n_probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, cosine, rank).

    Self-matches (same id) are excluded.  Rank ties broken by neighbor id
    for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        ).filter(_norm(F.col("__qv")) > 0)
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).filter(_norm(F.col("__cv")) > 0)  # zero vectors have no direction;
    # their NaN cosines would otherwise rank FIRST (NaN > any double)
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_sig(vec_col, n_planes: int, seed: int):
    """Sign-bit signature under deterministic pseudo-random hyperplanes.

    Plane p, dim d weight = centered xxhash of (p, d, seed) — seeded and
    identical across executors without shipping a matrix.  The dimension
    index comes from the 2-arg ``transform`` lambda (value, index), so no
    driver action ever inspects a vector to learn its length.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def _weight_fn(p):
        # genuine 2-arg lambda → Spark passes (element, index)
        return lambda x, d: (
            x.cast("double")
            * (
                (F.pmod(F.xxhash64(d, F.lit(p), F.lit(seed)), F.lit(2001)) - 1000)
                / 1000.0
            )
        )

    sig_bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.transform(vec, _weight_fn(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p))
    out = sig_bits[0]
    for b in sig_bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates = corpus vectors sharing an LSH
    bucket with the query in ANY of ``n_tables`` hyperplane tables; exact
    cosine ranking within candidates.  Output shape = brute_force_topk."""

    def with_sigs(df, idc, vc, alias_prefix):
        out = df.select(
            F.col(idc).alias(f"{alias_prefix}_id"), F.col(vc).alias(f"__{alias_prefix}v")
        ).filter(_norm(F.col(f"__{alias_prefix}v")) > 0)
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _hyperplane_sig(f"__{alias_prefix}v", n_planes, seed + 101 * t).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return out.withColumn("__bk", F.explode(tables)).select(
            f"{alias_prefix}_id", f"__{alias_prefix}v", "__bk.tbl", "__bk.sig"
        )

    cs = with_sigs(corpus, id_col, vec_col, "neighbor")
    qs = with_sigs(queries, id_col, vec_col, "query")
    cand = (
        cs.join(qs, on=["tbl", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__queryv", "__neighborv")
        .distinct()
        .withColumn("cosine", cosine(F.col("__queryv"), F.col("__neighborv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t) via
    LSH-bucketed self-join — the embedding leg of the dedup suite."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).filter(_norm(F.col("__v")) > 0)  # zero vectors: NaN cosine sorts ABOVE
    # any double in Spark, so they would pass every >= threshold filter
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _hyperplane_sig("__v", n_planes, seed + 101 * t).alias("sig"),
            )
            for t in range(n_tables)
        ]
    )
    sigs = base.withColumn("__bk", F.explode(tables)).select(
        "__id", "__v", "__bk.tbl", "__bk.sig"
    )
    a = sigs.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), "tbl", "sig")
    b = sigs.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), "tbl", "sig")
    return (
        a.join(b, on=["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .distinct()
        .withColumn("cosine", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_near_dup_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
    impl: str = "arrow",
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    The correctness baseline for :func:`cosine_near_dup_pairs` (LSH is the
    scale path; this is the exact leg, also the right tool when the corpus
    is small enough that O(n²/P) per task is affordable).

    Scale shape — triangle block decomposition, not a cross join: each
    vector hashes to one of ``n_blocks`` blocks, the B(B+1)/2 unordered
    block pairs become the join key, and both sides replicate ~B/2× via a
    broadcast of the tiny block-pair grid.  The comparison work lands in
    B(B+1)/2 equal-size, independent reduce groups (pick B ≈ √parallelism),
    so no task ever holds more than (2n/B) vectors — the all-pairs square
    is tiled, never materialized on one node.  Same-block pairs are ordered
    by id, cross-block pairs by block, so every unordered pair is produced
    exactly once (no ``distinct``).

    Cost shape: vectors are L2-NORMALIZED ONCE, before replication — O(n)
    norm work instead of O(n²) — so each of the n²/2 pairs pays exactly one
    dot product (measured 3× on the 2k-vector bench; the factor grows with
    pair count).

    ``impl``: "arrow" (default) computes each block-pair cell as ONE numpy
    matmul inside ``applyInPandas`` — Catalyst higher-order functions run
    interpreted (no whole-stage codegen), so the per-pair HOF dot product
    is the hot path's slow form; the Arrow cell kernel turns the n²/2
    interpreted array folds into B(B+1)/2 BLAS calls (measured ~5x on the
    sf0.1 corpus).  "hof" keeps the pure-JVM expression form — the
    cross-checked reference implementation (tested equal) and the fallback
    when Arrow is unavailable.  Both forms emit identical pair MEMBERSHIP;
    the cosine value may differ at float-addition-order precision (~1e-15)
    — thresholds are expected to sit clear of real pairs, as the bench
    corpus does by construction.
    """
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__raw"),
            blk.alias("__blk"),
        )
        # materialize the norm as its own projection so the per-element
        # divide below references a computed column, not a re-evaluated
        # aggregate per element
        .withColumn("__n", _norm(F.col("__raw")))
        # a zero vector has no direction: dividing by its norm makes NaN
        # cosines, and Spark sorts NaN ABOVE every double, so the threshold
        # filter would emit spurious pairs — drop them up front
        .filter(F.col("__n") > 0)
        .select(
            "__id",
            F.transform(
                F.col("__raw"), lambda x: x.cast("double") / F.col("__n")
            ).alias("__v"),
            "__blk",
        )
        # lazy localCheckpoint: the normalized frame materializes once on
        # first use and BOTH self-join sides read the checkpoint — without
        # it each side re-runs the source scan + O(n*d) normalization
        .localCheckpoint(eager=False)
    )
    grid = df.sparkSession.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    if impl == "arrow":
        id_type = df.schema[id_col].dataType.simpleString()
        a = base.select(
            F.col("__blk").alias("bi"), "__id", "__v"
        ).join(F.broadcast(grid), on="bi").select(
            "bi", "bj", F.lit("a").alias("__side"), "__id", "__v"
        )
        b = base.select(
            F.col("__blk").alias("bj"), "__id", "__v"
        ).join(F.broadcast(grid), on="bj").select(
            "bi", "bj", F.lit("b").alias("__side"), "__id", "__v"
        )
        both = a.unionByName(b)
        out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

        def cell(pdf):
            import numpy as np
            import pandas as pd

            A = pdf[pdf["__side"] == "a"]
            B = pdf[pdf["__side"] == "b"]
            empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            if A.empty or B.empty:
                return empty
            bi = int(pdf["bi"].iloc[0])
            bj = int(pdf["bj"].iloc[0])
            Ma = np.vstack(A["__v"].to_numpy())
            Mb = np.vstack(B["__v"].to_numpy())
            S = Ma @ Mb.T  # unit vectors: cosine == dot, one BLAS call
            ia, jb = np.nonzero(S >= threshold)
            if not len(ia):
                return empty
            ids_a = A["__id"].to_numpy()[ia]
            ids_b = B["__id"].to_numpy()[jb]
            cs = S[ia, jb]
            if bi == bj:
                keep = ids_a < ids_b  # each unordered pair once
                ids_a, ids_b, cs = ids_a[keep], ids_b[keep], cs[keep]
            else:
                lo = np.minimum(ids_a, ids_b)
                hi = np.maximum(ids_a, ids_b)
                ids_a, ids_b = lo, hi
            return pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "cosine": cs})

        return both.groupBy("bi", "bj").applyInPandas(cell, schema=out_schema)

    a = base.select(
        F.col("__id").alias("__ida"), F.col("__v").alias("__va"),
        F.col("__blk").alias("bi"),
    ).join(F.broadcast(grid), on="bi")
    b = base.select(
        F.col("__id").alias("__idb"), F.col("__v").alias("__vb"),
        F.col("__blk").alias("bj"),
    ).join(F.broadcast(grid), on="bj")
    pairs = (
        a.join(b, on=["bi", "bj"])
        .filter((F.col("bi") < F.col("bj")) | (F.col("__ida") < F.col("__idb")))
        # both sides are unit vectors: cosine == dot, one HOF per pair
        .withColumn("cosine", _dot(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.select(
        F.least("__ida", "__idb").alias("id_a"),
        F.greatest("__ida", "__idb").alias("id_b"),
        "cosine",
    )


# --------------------------------------------------------------------------- #
# IVF (inverted-file) approximate nearest neighbor
# --------------------------------------------------------------------------- #
def train_coarse_quantizer(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    train_sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
):
    """K-means coarse quantizer on a BOUNDED deterministic sample.

    The sample (``train_sample`` rows, xxhash64-ranked so it is seed-stable
    and independent of partitioning) is the only thing that ever reaches the
    driver — at 100 TB the training cost is constant, not data-scale.
    Vectors are L2-normalized before clustering so Euclidean k-means
    optimizes the cosine geometry the search uses.  Returns the centroid
    matrix as a plain list-of-lists (rows L2-normalized).
    """
    sample = (
        corpus.select(F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(train_sample)
        .collect()
    )
    X = np.asarray([r["__v"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        # cosine assignment == argmax dot on normalized rows
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent.tolist()


def _nearest_lists_udf(centroids, n_probe: int):
    """Arrow-vectorized assignment: embedding batch → n_probe nearest
    centroid ids (one matmul per Arrow batch; no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))

    @pandas_udf("array<int>")
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return nearest


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """IVF approximate cosine top-k: output shape = :func:`brute_force_topk`.

    Scale shape: corpus vectors are assigned to their single nearest
    centroid list (one Arrow matmul pass, shuffle keyed by ``list_id`` —
    at 1000 executors each list is a co-located partition family); queries
    explode to their ``n_probe`` nearest lists and equi-join, so per-query
    work is ``n_probe/n_centroids`` of the corpus instead of all of it.
    Exact cosine ranks candidates inside the probed lists.  Recall rises
    with n_probe (n_probe == n_centroids degrades to exact brute force).
    """
    if centroids is None:
        centroids = train_coarse_quantizer(
            corpus, id_col, vec_col, n_centroids, train_sample, seed=seed
        )
    assign1 = _nearest_lists_udf(centroids, 1)
    probe = _nearest_lists_udf(centroids, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("list_id", F.element_at(assign1(F.col("__cv")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("list_id", F.explode(probe(F.col("__qv"))))

    cand = (
        c.join(q, on="list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
