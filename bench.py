"""Benchmark harness: headline queries + CDC replay throughput.

Runs the headline operator queries from ``__spark_entry__`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and a seeded CDC replay (the engine's core
path: synthesize → batched MERGE replay → digest-verified vs the batch
oracle).  Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "cdc": {"events": N, "events_per_sec": X, "verified": true}}

Scaling evidence (N vs 4N parallelism) lives in scripts/scaling_bench.py →
BASELINE.md; this file is the per-round driver entrypoint.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from data_migration_validator_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "top_orders",
    "region_revenue",
    "window_latest_event",
    "window_dedup_first",
    "anti_join_extras",
    "semi_join_filter",
    "groupby_date_bucket",
    "pk_validation",
    "recon_counts",
    "column_mismatch_metrics",
    "row_level_mismatches",
    "full_outer_report",
    "windowed_validation",
    "text_stats",
    "lang_id",
    "exact_dedup",
    "fingerprint_dedup",
    "embedding_norms",
    "knn_bruteforce",
    "simhash_near_dup",
    "minhash_near_dup",
]


def bench_cdc_replay(spark, n_events: int, n_batches: int = 8) -> dict:
    """Seeded end-to-end replay: generate → write batched → MERGE replay →
    reconcile vs oracle.  Returns events/sec for the replay phase only."""
    from pyspark.sql import functions as F

    from data_migration_validator_spark.cdc.events import change_events, write_events_batched
    from data_migration_validator_spark.cdc.oracle import expected_final_state
    from data_migration_validator_spark.cdc.replay import replay
    from data_migration_validator_spark.lake.schema import TableSchema
    from data_migration_validator_spark.lake.table import LakeTable
    from data_migration_validator_spark.validation.reconcile import hash_reconcile

    ev = change_events(
        spark, n_events=n_events, n_repos=200, seed=42,
        batch_size=max(1, n_events // n_batches),
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_events_batched(ev, f"{tmp}/events")
        table = LakeTable.create(
            spark,
            f"{tmp}/repo_content",
            TableSchema.from_pairs(
                [("repo", "string"), ("path", "string"), ("commit", "string"),
                 ("lang", "string"), ("content", "string")]
            ),
            key_cols=["repo", "path"],
            bucket_col="repo",
            num_buckets=16,
        )
        t0 = time.monotonic()
        stats = replay(table, f"{tmp}/events")
        replay_s = time.monotonic() - t0
        rec = hash_reconcile(
            table.read(), expected_final_state(ev),
            ["repo", "path"], ["commit", "lang", "content"],
        )
        bad = rec.filter(F.col("status") != "MATCH").count()
        return {
            "events": n_events,
            "batches": stats["batches_applied"],
            "replay_sec": round(replay_s, 3),
            "events_per_sec": round(n_events / replay_s, 1),
            "verified": bad == 0,
        }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("bench", cores=cpus)

    qs = E.queries()
    per_query = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        per_query[name] = round(time.monotonic() - t0, 3)

    cdc = bench_cdc_replay(spark, n_events=int(400_000 * max(sf / 0.1, 0.1)), n_batches=4)
    per_query["cdc_replay"] = cdc["replay_sec"]

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite + verified CDC replay, total wall",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "cpus": cpus,
                "cdc": cdc,
            }
        )
    )


if __name__ == "__main__":
    main()
