"""Document chunking: split long texts into overlapping fixed-size windows.

Every RAG/pretraining pipeline shards documents into model-window-sized
pieces before embedding or tokenizing; at corpus scale the operator must be
NARROW — chunking is embarrassingly row-local, so any implementation that
shuffles (repartition-by-chunk, window functions) or leaves the JVM
(per-row Python split) is wasted money.  This one is a single
whole-stage-codegen projection: ``sequence`` generates the chunk start
offsets, ``transform`` + ``substring`` slices, ``posexplode`` flattens —
zero exchanges (plan-asserted in tests), and the output inherits the
input's partitioning.

Chunk geometry (char-based; token-budgeted packing is ``order.pack_shards``
downstream): stride = size - overlap; starts at 0, stride, 2·stride, …
while start < length; the FINAL chunk is whatever remains (may be shorter);
a chunk is emitted for empty/whitespace docs only if ``keep_empty``.  Chunk
ids are (doc key, chunk_index) — deterministic, rerun-stable, no global
counter (a ``monotonically_increasing_id`` would be partitioning-dependent).

Cited parity: the reference has no chunker (its unit is whole table rows);
this is beyond-reference surface for the training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 512,
    overlap: int = 64,
    keep_empty: bool = False,
) -> DataFrame:
    """All input columns + (chunk_index, chunk_text, chunk_start, chunk_len).

    ``size`` > ``overlap`` ≥ 0; character units.  NULL text yields no
    chunks (it is dropped like empty unless ``keep_empty``, which emits a
    single empty chunk with NULL text preserved as '').
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"overlap must be in [0, size), got {overlap}")
    stride = size - overlap

    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(txt)
    # start offsets 0, stride, … strictly below length (so no zero-width
    # tail chunk); empty docs get one start=0 only in keep_empty mode
    last = F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int"), F.lit(0)
    )
    starts = F.when(n > 0, F.sequence(F.lit(0), last * stride, F.lit(stride)))
    if keep_empty:
        starts = starts.otherwise(F.array(F.lit(0)))
    pieces = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("chunk_start"),
            F.substring(txt, s + 1, size).alias("chunk_text"),
        ),
    )
    exploded = df.select(
        "*", F.posexplode(pieces).alias("chunk_index", "__c")
    )
    return exploded.select(
        *df.columns,
        "chunk_index",
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.chunk_start").alias("chunk_start"),
        F.length("__c.chunk_text").alias("chunk_len"),
    )
