"""Per-batch change application: schema evolution → salted last-writer-wins
dedup → MERGE, with lineage metrics and exactly-once batch commits.

This is the engine core demanded by the north rule.  The skew story is
explicit (not left to AQE alone): hot repos at 10^10-event scale would
funnel one (repo, path) — or one repo's whole path family — into a single
reducer if we naively ``groupBy(repo, path)``.  We instead dedup in two
phases with an explicit salt:

  phase 1: repartition on (repo, path, salt) where salt = pmod(xxhash64(
           event_seq), K) — a hot key's events spread over K reducers, each
           computing a partial max_by;
  phase 2: groupBy(repo, path) over the ≤K partial winners per key — the
           second shuffle moves at most K rows per key regardless of how hot
           the key was.

Event payload fields map to current table columns **by field id**, so events
that still say ``lang`` keep landing in the column even after it is renamed
to ``language`` (schema evolution by id, not by name).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import LakeTable

# immutable ids of the event payload fields == ids of the initial
# repo_content schema columns (FIXTURES.md §F1/F2).
EVENT_FIELD_IDS: dict[str, int] = {
    "repo": 1,
    "path": 2,
    "commit": 3,
    "lang": 4,
    "content": 5,
}


def dedup_last_writer_wins(
    events: DataFrame,
    key_cols: list[str] = ("repo", "path"),
    order_col: str = "event_seq",
    salt_buckets: int = 16,
) -> DataFrame:
    """One row per key: the max-``order_col`` event (ties broken by commit).

    Two-phase salted aggregation (see module docstring).  ``max_by`` over a
    struct keeps the whole payload with the winning order key — no second
    join back.
    """
    payload_cols = [c for c in events.columns if c not in key_cols]
    winner = F.struct(F.col(order_col), F.col("commit"), *[F.col(c) for c in payload_cols if c not in (order_col, "commit")])
    order_key = F.struct(F.col(order_col), F.col("commit"))

    # Phase 1 groups by (key, salt): the salt column IS the explicit skew
    # defusal (north rule) — a hot key's events spread over ``salt_buckets``
    # reducers.  No repartition() before it: the hash aggregate's map-side
    # partial max_by already collapses each (key, salt) to one row per task,
    # so the only full-width shuffle moves ≤ tasks × keys × salt partial
    # winners, not the raw events.
    salted = events.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.max_by(winner, order_key).alias("__w"), F.max(order_key).alias("__k")
    )
    final = partial.groupBy(*key_cols).agg(F.max_by("__w", "__k").alias("__w"))
    return final.select(
        *key_cols, *[F.col(f"__w.{c}").alias(c) for c in payload_cols]
    )


def _apply_schema_changes(table: LakeTable, actions: list[dict]) -> list[str]:
    """Apply ordered schema-change actions (JSON per FIXTURES.md §F2)."""
    applied = []
    for a in actions:
        kind = a["action"]
        if kind == "add_column":
            table.add_column(a["name"], a["type"])
        elif kind == "rename_column":
            table.rename_column(a["from"], a["to"])
        elif kind == "widen_type":
            table.widen_type(a["name"], a["to"])
        else:
            raise ValueError(f"unknown schema_change action {kind!r}")
        applied.append(kind)
    return applied


def _project_to_table(table: LakeTable, changes: DataFrame, op_col: str) -> DataFrame:
    """Map event payload columns to current table columns by field id."""
    cur = table.schema
    id_to_event = {fid: name for name, fid in EVENT_FIELD_IDS.items()}
    proj = []
    for fld in cur.fields:
        ev_name = id_to_event.get(fld.id)
        if ev_name is not None and ev_name in changes.columns:
            proj.append(F.col(ev_name).cast(fld.type).alias(fld.name))
        elif fld.name in changes.columns:
            proj.append(F.col(fld.name).cast(fld.type).alias(fld.name))
        else:
            proj.append(F.lit(None).cast(fld.type).alias(fld.name))
    proj.append(F.col(op_col))
    return changes.select(*proj)


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id=None,
    lineage: LakeTable | None = None,
    salt_buckets: int = 16,
    count_deletes: bool = False,
) -> dict:
    """Apply one micro-batch of change events to ``table``.

    Idempotent on ``batch_id``: a redelivered or replayed-after-crash batch
    is a no-op (generalizes the reference's skip of already-validated
    batches, ``migration-data-validation.py:1816-1817``).

    ``count_deletes=True`` adds an exact semi-join accounting pass so
    ``rows_deleted`` counts only deletes of keys actually present; the
    default hot path reports ``rows_delete_requested`` only.
    """
    t0 = time.monotonic()
    if batch_id is not None and table.has_batch(batch_id):
        return {"skipped": True, "batch_id": batch_id}

    # 1. DML: salted last-writer-wins dedup (schema-agnostic — it works on
    #    the fixed event payload names, so it can be BUILT before schema
    #    changes are known).  Persist the deduped change-set once — every
    #    downstream action reuses it instead of re-running the salted
    #    two-phase shuffle.
    dml = events.filter(F.col("op").isin("insert", "update", "delete"))
    deduped = dedup_last_writer_wins(
        dml.select("event_seq", "op", "repo", "path", "commit", "lang", "content"),
        key_cols=list(table.key_cols),
        salt_buckets=salt_buckets,
    ).persist()
    try:
        # 2. ONE combined driver action per batch: per-bucket stats over the
        #    deduped change-set (they feed the MERGE's touched-bucket
        #    discovery + broadcast decision AND the lineage rows) unioned
        #    with the batch's rare schema-change events.  Fusing the three
        #    former collects (schema scan, bucket stats, lineage agg) into
        #    one job matters at high batch rates: each extra action is a
        #    fixed driver/planning cost that no executor count can shrink —
        #    exactly the serial term the N→4N scaling gate punishes.  This
        #    action also populates the ``deduped`` cache for the write.
        bucket_stats_df = (
            deduped.withColumn("__bucket", table.bucket_expr())
            .groupBy("__bucket")
            .agg(
                F.min("event_seq").alias("first_event_seq"),
                F.max("event_seq").alias("last_event_seq"),
                F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("n_up"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_del"),
            )
            .select(
                F.lit("stats").alias("kind"),
                "__bucket", "first_event_seq", "last_event_seq", "n_up", "n_del",
                F.lit(None).cast("string").alias("schema_change"),
            )
        )
        schema_df = events.filter(F.col("schema_change").isNotNull()).select(
            F.lit("schema").alias("kind"),
            F.lit(None).cast("int").alias("__bucket"),
            F.col("event_seq").alias("first_event_seq"),
            F.lit(None).cast("long").alias("last_event_seq"),
            F.lit(None).cast("long").alias("n_up"),
            F.lit(None).cast("long").alias("n_del"),
            "schema_change",
        )
        combined = bucket_stats_df.unionByName(schema_df).collect()
        bucket_stats = [r for r in combined if r["kind"] == "stats"]
        sc_rows = sorted(
            (r for r in combined if r["kind"] == "schema"),
            key=lambda r: r["first_event_seq"],
        )

        # 3. schema evolution (rare; applied driver-side, BEFORE the change
        #    projection below is constructed against the current schema).
        schema_applied = _apply_schema_changes(
            table, [json.loads(r["schema_change"]) for r in sc_rows]
        )

        lineage_rows = bucket_stats if lineage is not None else None

        changes = _project_to_table(table, deduped, op_col="op")

        # 4. MERGE (exactly-once marker written inside) — bucket stats are
        #    handed over, so the write is the batch's only other action.
        #    Exact-delete accounting (semi-join vs existing) is skipped on
        #    the hot path — the stats then carry only rows_delete_requested,
        #    never an approximate value under the exact stat's name.
        stats = table.merge(
            changes,
            op_col="op",
            batch_id=batch_id,
            count_deletes=count_deletes,
            bucket_stats=[
                {"__bucket": r["__bucket"], "n_up": r["n_up"], "n_del": r["n_del"]}
                for r in bucket_stats
            ],
        )
    finally:
        deduped.unpersist()
    stats["schema_changes_applied"] = schema_applied
    latency_ms = int((time.monotonic() - t0) * 1000)
    stats["apply_latency_ms"] = latency_ms

    if lineage is not None and lineage_rows:
        now = time.time()
        ldf = lineage.spark.createDataFrame(
            [
                (
                    int(batch_id) if batch_id is not None and str(batch_id).isdigit() else -1,
                    int(r["__bucket"]),
                    int(r["first_event_seq"]),
                    int(r["last_event_seq"]),
                    int(r["n_up"]),
                    int(r["n_del"]),
                    latency_ms,
                    now,
                )
                for r in lineage_rows
            ],
            schema=(
                "batch_id long, partition_id int, first_event_seq long, "
                "last_event_seq long, rows_upserted long, rows_delete_requested long, "
                "apply_latency_ms long, committed_at double"
            ),
        )
        lineage.append(ldf)
    return stats


LINEAGE_SCHEMA = [
    ("batch_id", "bigint"),
    ("partition_id", "int"),
    ("first_event_seq", "bigint"),
    ("last_event_seq", "bigint"),
    ("rows_upserted", "bigint"),
    ("rows_delete_requested", "bigint"),
    ("apply_latency_ms", "bigint"),
    ("committed_at", "double"),
]


def make_lineage_table(spark, root: str) -> LakeTable:
    """Create (or load) the lineage/metrics table (FIXTURES.md §F4) — the
    analog of the reference's ``validation_log_table`` (setup_ddls.py:136-149)."""
    if LakeTable.exists(root):
        return LakeTable.load(spark, root)
    return LakeTable.create(
        spark,
        root,
        LINEAGE_SCHEMA,
        key_cols=["batch_id", "partition_id"],
        bucket_col="batch_id",
        num_buckets=4,
    )
