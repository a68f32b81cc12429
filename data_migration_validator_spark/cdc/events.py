"""Deterministic, distributed change-event generator (FIXTURES.md §F2).

Generates an ordered insert/update/delete stream over the
``repo_content(repo, path, commit, lang, content)`` key space with Zipf-hot
repos, entirely with JVM-side expressions over ``spark.range`` — no driver
loops, no Python UDFs — so the same code synthesizes 10^4 events for a test
or 10^10 for a cluster bench.  Seeded: identical (n_events, seed, knobs) →
identical stream, which the replay-equivalence tests rely on.

Oracle semantics (reference-mirrored, cf. latest-per-key window at
``migration-data-validation.py:1802-1804``): final state = per (repo, path)
the payload of the max-event_seq event, dropped if that event is a delete.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["py", "java", "scala", "sql", "md", "yaml", "c", "go"]


def _unit_uniform(col, seed: int):
    """Deterministic uniform in (0,1) from a bigint column."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000)) + 0.5) / 1_000_000.0


def change_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    seed: int = 42,
    skew: float = 2.0,
    batch_size: int = 10_000,
    delete_ratio: float = 0.10,
    schema_change_at: dict[int, str] | None = None,
    partitions: int | None = None,
    key_locality: int | None = None,
) -> DataFrame:
    """Ordered change-event stream as a DataFrame.

    Columns: event_seq, op, repo, path, commit, lang, content,
    schema_change (JSON or null), batch_hint.

    ``skew`` > 1 concentrates traffic on low-index repos (hot-repo skew the
    applier must defuse).  ``schema_change_at`` maps event_seq → JSON action
    (op='schema', payload null) for evolution tests.

    ``key_locality``: None (default) keeps the uniform key space — every
    event hashes to an arbitrary key, the worst case for file pruning.
    An int switches to the MONOTONE-FRONTIER shape real CDC streams have
    (autoincrement PKs, updates skewed recent): event e touches key index
    ``frontier(e) - backoff`` where frontier grows linearly with
    event_seq and backoff is uniform in [0, key_locality).  Repo indices
    are zero-padded in this mode so LEXICAL string order == numeric key
    order — per-file repo bounds then slice the frontier, which is what
    lets the MERGE file prune keep old files untouched.  Still fully
    seeded/deterministic and generated with the same JVM expressions.
    """
    base = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    ev = base.select(F.col("id").alias("event_seq"))

    if key_locality is not None:
        if key_locality < 1:
            # pmod(hash, 0) is NULL (or DIVIDE_BY_ZERO under ANSI): every
            # event would silently collapse onto key 0 — fail loudly
            raise ValueError("key_locality must be >= 1")
        total_keys = max(1, n_repos * paths_per_repo)
        frontier = F.floor(
            F.col("event_seq") * F.lit(total_keys) / F.lit(max(1, n_events))
        )
        backoff = F.pmod(
            F.xxhash64(F.col("event_seq"), F.lit(seed + 3)), F.lit(key_locality)
        )
        key_idx = F.greatest(F.lit(0), frontier - backoff).cast("bigint")
        repo_idx = (key_idx / paths_per_repo).cast("int")
        path_idx = F.pmod(key_idx, F.lit(paths_per_repo)).cast("int")
        repo_col = F.format_string("org%03d/repo%06d", (repo_idx / 10).cast("int"), repo_idx)
    else:
        u_repo = _unit_uniform(F.col("event_seq"), seed)
        repo_idx = F.floor(F.pow(u_repo, F.lit(skew)) * n_repos).cast("int")
        path_idx = F.pmod(F.xxhash64(F.col("event_seq"), F.lit(seed + 7)), F.lit(paths_per_repo)).cast("int")
        repo_col = F.format_string("org%d/repo%d", (repo_idx / 10).cast("int"), repo_idx)
    lang_idx = F.pmod(path_idx, F.lit(len(LANGS)))

    ev = ev.withColumns(
        {
            "repo": repo_col,
            "path": F.format_string(
                "src/d%d/d%d/file_%d.%s",
                F.pmod(path_idx, F.lit(7)),
                F.pmod(path_idx, F.lit(13)),
                path_idx,
                F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx + 1),
            ),
            "lang": F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx + 1),
        }
    )

    # first event for a key is an insert; later events split update/delete
    w = Window.partitionBy("repo", "path").orderBy("event_seq")
    is_first = F.row_number().over(w) == 1
    u_op = _unit_uniform(F.col("event_seq"), seed + 13)
    op = F.when(is_first, F.lit("insert")).when(
        u_op < delete_ratio, F.lit("delete")
    ).otherwise(F.lit("update"))
    ev = ev.withColumn("op", op)

    commit = F.substring(
        F.sha2(F.concat_ws(":", "repo", "path", F.col("event_seq").cast("string")), 256),
        1,
        40,
    )
    body_len = (5 + F.pmod(F.xxhash64("event_seq", F.lit(seed + 29)), F.lit(60))).cast("int")
    body = F.repeat(
        F.format_string(
            "tok%d ", F.pmod(F.xxhash64("event_seq", F.lit(seed + 31)), F.lit(9973))
        ),
        body_len,
    )
    content = F.when(
        F.col("op") == "delete", F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.format_string("// %s/%s@%d\n", "repo", "path", "event_seq"), body
        )
    )
    ev = ev.withColumns(
        {
            "commit": commit,
            "content": content,
            "batch_hint": (F.col("event_seq") / batch_size).cast("int"),
        }
    )

    if schema_change_at:
        sc = F.lit(None).cast("string")
        for seq, action_json in sorted(schema_change_at.items()):
            sc = F.when(F.col("event_seq") == seq, F.lit(action_json)).otherwise(sc)
        ev = ev.withColumn("schema_change", sc)
        ev = ev.withColumn(
            "op", F.when(F.col("schema_change").isNotNull(), F.lit("schema")).otherwise(F.col("op"))
        )
        for c in ("repo", "path", "commit", "lang", "content"):
            ev = ev.withColumn(
                c,
                F.when(F.col("op") == "schema", F.lit(None).cast("string")).otherwise(F.col(c)),
            )
    else:
        ev = ev.withColumn("schema_change", F.lit(None).cast("string"))

    return ev.select(
        "event_seq", "op", "repo", "path", "commit", "lang", "content",
        "schema_change", "batch_hint",
    )


def write_events_batched(
    events: DataFrame, out_dir: str, files_per_batch: int = 16
) -> list[int]:
    """Persist the stream partitioned by batch_hint (one dir per micro-batch).

    Replay/streaming then reads each batch with directory pruning instead of
    re-scanning the whole stream per batch.  Returns the ordered batch ids.

    Each batch is laid out as ~``files_per_batch`` files, NOT one: a
    one-file-per-batch layout caps the replay's scan/dedup-map side at one
    task per batch regardless of executor count, serialising every narrow
    stage before the first shuffle (this was measured to cut N→4N scaling
    efficiency to 0.29-0.45).

    Two invariants make the layout safe for the *streaming* reader, which
    pulls ``maxFilesPerTrigger`` files per micro-batch in modification-time
    order and may therefore split one batch dir across triggers:

    - the slice key is a hash of (repo, path), so ALL of a key's events
      within a batch land in the SAME file — no trigger split can apply a
      key's events out of order within a batch;
    - file mtimes are stamped strictly increasing in (batch, file) order,
      so the file source's time-ordered listing replays batches in stream
      order — exactly the arrival order a real tailing source would see,
      which a single bulk parquet write job otherwise erases.
    """
    # Explicit partition count: an AQE-coalescible exchange would fold the
    # small shuffle back into one partition and re-serialise the layout.
    n_parts = max(64, files_per_batch)
    slice_col = F.pmod(F.xxhash64("repo", "path"), F.lit(files_per_batch))
    (
        events.repartition(n_parts, F.col("batch_hint"), slice_col)
        .sortWithinPartitions("event_seq")
        .write.mode("overwrite")
        .partitionBy("batch_hint")
        .parquet(out_dir)
    )
    batches = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("batch_hint=")
    )
    # Restore arrival order: one bulk write gives every file the same mtime,
    # but batch N's files must sort before batch N+1's for the file stream.
    t0 = time.time() - len(batches) * files_per_batch * 2e-3 - 60
    tick = 0
    for b in batches:
        bdir = os.path.join(out_dir, f"batch_hint={b}")
        for name in sorted(os.listdir(bdir)):
            if name.startswith("part-"):
                tick += 1
                ts = t0 + tick * 2e-3
                os.utime(os.path.join(bdir, name), (ts, ts))
    return batches
