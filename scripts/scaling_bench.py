"""N-vs-4N scaling evidence (BASELINE.json sandbox protocol).

Runs the IDENTICAL CDC replay job (same seeded input, same batch plan) at
two local parallelism levels, each in a fresh spark-submit process, and
reports events/sec at both plus scaling efficiency =
(T_N_wall / T_4N_wall) / (high/low).

Usage:
    python scripts/scaling_bench.py [n_events] [low_cores] [high_cores]

Env knobs: SCALING_REPEATS (clean interleaved repeats, min-of-k per level,
default 3), SCALING_REPOS (key-space breadth, default 5000),
SCALING_BATCHES (micro-batches; 1 = one big batch, default 4),
SCALING_MAX_STEAL (co-tenant steal fraction above which a leg is discarded
as storm-dirty, default 0.05), SCALING_MAX_DIRTY_FACTOR (attempt budget =
repeats x this, default 4).

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


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def steal_fraction(window_s: float = 3.0) -> float:
    """Fraction of CPU time stolen by OTHER tenants of the physical host
    over a short window.  This VM's loadavg cannot see co-tenant storms
    (their load is not on our runqueue — our threads just silently run
    slower); /proc/stat's steal ticks are the direct signal.  Measured
    storms here reach >50% steal and inflate identical legs 5-10x."""
    import time as _time

    s0, t0 = _cpu_ticks()
    _time.sleep(window_s)
    s1, t1 = _cpu_ticks()
    return (s1 - s0) / max(1, t1 - t0)


def wait_for_quiet(max_load: float = 3.0, timeout_s: int = 600,
                   max_steal: float = 0.05) -> None:
    """Gate each leg on 1-min loadavg (our own stragglers) AND a sampled
    steal fraction (co-tenant storms).  Mid-leg storms remain possible —
    each leg's steal is measured across its whole run and dirty legs are
    discarded (see main)."""
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while _time.monotonic() < deadline:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 <= max_load and steal_fraction(3.0) <= max_steal:
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

        # The physical host is shared: co-tenant storms steal >50% CPU and
        # inflate identical legs 5-10x, invisibly to loadavg.  Protocol:
        # interleave the two levels; measure each leg's steal fraction
        # across its whole wall; a leg with steal > max_steal is DIRTY and
        # does not count toward `repeats` (retried, up to a cap).  Estimate
        # = min wall over clean legs — together, "min over certified-quiet
        # runs" rather than hoping k repeats caught a quiet window.
        max_steal = float(os.environ.get("SCALING_MAX_STEAL", "0.05"))
        max_load = float(os.environ.get("SCALING_MAX_LOAD", "3.0"))
        max_attempts = repeats * int(os.environ.get("SCALING_MAX_DIRTY_FACTOR", "4"))
        runs: dict[int, list[dict]] = {low: [], high: []}
        dirty: dict[int, int] = {low: 0, high: 0}
        attempts = 0
        while (
            min(len(runs[low]), len(runs[high])) < repeats
            and attempts < max_attempts
        ):
            attempts += 1
            for cores in (low, high):
                if len(runs[cores]) >= repeats:
                    continue
                wait_for_quiet(max_load, max_steal=max_steal)
                s0, t0 = _cpu_ticks()
                stdout = spark_submit(
                    cores, DRIVER, [str(n_events), str(cores), events_dir,
                    str(n_repos), str(n_batches)]
                )
                s1, t1 = _cpu_ticks()
                leg_steal = (s1 - s0) / max(1, t1 - t0)
                line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][0]
                r = json.loads(line[len("RESULT "):])
                r["steal"] = round(leg_steal, 4)
                if leg_steal > max_steal:
                    dirty[cores] += 1
                    continue
                runs[cores].append(r)
        for c in (low, high):
            if not runs[c]:
                raise SystemExit(
                    f"no clean leg at {c} cores after {max_attempts} attempts "
                    f"({dirty[c]} storm-dirty); raise SCALING_MAX_DIRTY_FACTOR "
                    "or rerun when the host calms down"
                )
        results = {
            c: min(rs, key=lambda r: r["wall_s"]) for c, rs in runs.items()
        }
        for c in (low, high):
            results[c]["all_wall_s"] = [r["wall_s"] for r in runs[c]]
            results[c]["all_steal"] = [r["steal"] for r in runs[c]]
            results[c]["dirty_legs_discarded"] = dirty[c]
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
