"""Per-phase scaling probe — the compute-plane companion to
``scaling_bench.py``.

Times each phase of one replay batch (batch scan, salted two-phase dedup
materialization, bucket-stats aggregation, bucketed rewrite) at two
parallelism levels in fresh spark-submit processes, and reports per-phase
walls + efficiency.  This isolates the JOB's scaling behavior from the
driver bookkeeping (manifest/commit JSON, py4j) that ``scaling_bench.py``
deliberately includes — on a real cluster the bookkeeping is a fixed
few hundred ms per 10^8-event batch; on a 2-minute sandbox run it is a
visible constant.

Usage:
    python scripts/phase_scaling.py [n_events] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

PROBE = r"""
import json, sys, tempfile, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_migration_validator_spark.cdc.events import change_events, write_events_batched
from data_migration_validator_spark.cdc.apply import dedup_last_writer_wins, _project_to_table
from data_migration_validator_spark.lake.table import LakeTable

n_events, cores = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate())

with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
    ev = change_events(spark, n_events=n_events, n_repos=5000, paths_per_repo=2000,
                       seed=42, batch_size=n_events)
    write_events_batched(ev, f"{tmp}/events")
    t = LakeTable.create(spark, f"{tmp}/t",
        [("repo","string"),("path","string"),("commit","string"),
         ("lang","string"),("content","string")],
        key_cols=["repo","path"], bucket_col="repo", num_buckets=32)

    T = {}
    def clock(name, fn):
        t0 = time.monotonic(); r = fn(); T[name] = round(time.monotonic()-t0, 2)
        return r

    batch = spark.read.parquet(f"{tmp}/events/batch_hint=0")
    dml = batch.filter(F.col("op").isin("insert","update","delete"))
    deduped = dedup_last_writer_wins(
        dml.select("event_seq","op","repo","path","commit","lang","content"),
        key_cols=["repo","path"]).persist()
    clock("dedup", lambda: deduped.count())
    changes = (_project_to_table(t, deduped, op_col="op")
               .withColumn("__bucket", t.bucket_expr()).persist())
    clock("bucket_stats", lambda: changes.groupBy("__bucket").agg(
        F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("n")).collect())
    upserts = t._conform(changes.filter(F.col("op") != "delete"))
    clock("write", lambda: t._write_files(upserts))
    deduped.unpersist(); changes.unpersist()
    T["total"] = round(sum(T.values()), 2)
    print("PHASES " + json.dumps({"cores": cores, **T}))
"""


def run(cores: int, n_events: int) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(PROBE)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(tempfile.gettempdir(), "dmvs_pkg.zip")
    if True:  # always rebuild: a cached zip silently benches stale code
        subprocess.run(
            ["zip", "-qr", pkg, "data_migration_validator_spark"],
            cwd=repo, check=True,
        )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    # taskset pin, same as scaling_bench: an unpinned local[1] leg burns
    # 1.3-1.8 cores via GC/Netty helper threads and inflates low-core
    # efficiency, so unpinned per-phase numbers would disagree with the
    # scaling evidence they exist to explain
    pin = []
    if os.environ.get("SCALING_NO_TASKSET") != "1":
        pin = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]
    out = subprocess.run(
        [*pin, "spark-submit", "--master", f"local[{cores}]",
         "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"),
         "--conf", f"spark.local.dir={local_dir}",
         "--py-files", pkg, path, str(n_events), str(cores)],
        capture_output=True, text=True, cwd=repo, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("PHASES ")][0]
    return json.loads(line[len("PHASES "):])


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    runs = {low: [], high: []}
    for _ in range(repeats):
        for cores in (low, high):
            runs[cores].append(run(cores, n_events))
    best = {c: min(rs, key=lambda r: r["total"]) for c, rs in runs.items()}
    ratio = high / low
    out = {
        "n_events": n_events,
        "low": best[low],
        "high": best[high],
        "all": {str(c): [r["total"] for r in rs] for c, rs in runs.items()},
        "per_phase_efficiency": {
            k: round(best[low][k] / best[high][k] / ratio, 3)
            for k in ("dedup", "bucket_stats", "write", "total")
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
