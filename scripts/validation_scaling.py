"""N-vs-4N scaling evidence for the VALIDATION half of the engine.

The CDC replay pipeline's scaling is certified by scripts/scaling_bench.py;
this runs the same protocol over the other 100-TB hot path — the
config-driven comparison pipeline (validation/pipeline.py: annotated
full-outer join → one-pass conditional counts → per-column metrics →
row-level mismatch capture → summary) on a synthesized src/tgt pair with
seeded, arithmetically-known anomalies.

Protocol (identical to scaling_bench — the module docstring there explains
the host-noise model and why min-of-k over steal-gated legs is the
estimator): interleaved legs at two parallelism levels in fresh pinned
spark-submit JVMs, untimed warm-up inside each leg, per-leg steal/canary
certification, verification on every leg (the report digest must agree
across levels AND the summary counts must equal the injected-anomaly
arithmetic — a wrong-but-fast leg is worthless).

Usage:
    python scripts/validation_scaling.py [n_rows] [low_cores] [high_cores]

Env: SCALING_REPEATS (default 2), SCALING_MAX_STEAL, SCALING_MIN_CANARY,
SCALING_MAX_LOAD, SPARK_GRAFT_BENCH_DIR (fixture dir, default /dev/shm).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_bench import (  # noqa: E402
    CanaryThread,
    _cpu_ticks,
    quiet_reference,
    spark_submit,
    wait_for_quiet,
)

# The leg: build the seeded pair IN-LEG from spark.range (deterministic,
# no shared fixture needed — generation is cheap relative to the join) and
# time ONLY the validation pipeline actions.
DRIVER = r"""
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_migration_validator_spark.validation import run_validation

n_rows, cores = int(sys.argv[1]), int(sys.argv[2])
spark = (
    SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

MISM_MOD, DROP_MOD, EXTRA = 1009, 5003, 1000

def pair(n):
    src = spark.range(1, n + 1).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("price"),
        F.concat(F.lit("f"), (F.col("id") % 5).cast("string")).alias("flag"),
        (F.col("id") % 100).cast("int").alias("qty"),
    )
    tgt = (
        src.withColumn(
            "price",
            F.when(
                (F.col("id") % MISM_MOD == 0) & (F.col("id") % DROP_MOD != 0),
                F.col("price") + 1,
            ).otherwise(F.col("price")),
        )
        .filter(F.col("id") % DROP_MOD != 0)
        .unionByName(
            spark.range(n + 1, n + 1 + EXTRA).select(
                F.col("id"), (F.col("id") * 1.0).alias("price"),
                F.lit("fx").alias("flag"), F.lit(0).alias("qty"),
            )
        )
    )
    return src, tgt

def digest(df):
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    return df.select(h).agg(F.expr("bit_xor(__h)")).collect()[0][0]

def run_once(n):
    reports = run_validation(src_tgt[0], src_tgt[1], key_cols=["id"])
    s = reports["summary"]
    d_mism = digest(reports["mismatch_rows"])
    d_cols = digest(reports["column_metrics"])
    reports["annotated"].unpersist()
    return s, d_mism, d_cols

# untimed warm-up: small pair pays JIT/codegen outside the timed region
src_tgt = pair(50_000)
run_once(50_000)

src_tgt = pair(n_rows)
t0 = time.time()
summary, d_mism, d_cols = run_once(n_rows)
wall = round(time.time() - t0, 2)

exp_dropped = n_rows // DROP_MOD
exp_mism = sum(1 for i in range(MISM_MOD, n_rows + 1, MISM_MOD) if i % DROP_MOD)
ok = (
    summary["mismatches"] == exp_mism
    and summary["src_extras"] == exp_dropped
    and summary["tgt_extras"] == EXTRA
    and summary["matches"] == (n_rows - exp_dropped - exp_mism)
)
print("RESULT " + json.dumps({
    "cores": cores, "rows": n_rows, "wall_s": wall,
    "rows_per_sec": round(n_rows / wall, 1),
    "digest_mismatch_rows": d_mism, "digest_column_metrics": d_cols,
    "counts": {k: summary[k] for k in
               ("matches", "mismatches", "src_extras", "tgt_extras")},
    "verified": bool(ok),
}))
"""


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    max_steal = float(os.environ.get("SCALING_MAX_STEAL", "0.05"))
    max_load = float(os.environ.get("SCALING_MAX_LOAD", "3.0"))
    min_canary = float(os.environ.get("SCALING_MIN_CANARY", "0.1"))
    max_attempts = repeats * int(os.environ.get("SCALING_MAX_DIRTY_FACTOR", "4"))

    ref = quiet_reference()
    print(f"# canary quiet reference: {ref}", file=sys.stderr)
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
            wait_for_quiet(max_load, max_steal=max_steal, ref=ref,
                           min_canary=min_canary)
            s0, t0 = _cpu_ticks()
            with CanaryThread() as can:
                stdout = spark_submit(
                    cores, DRIVER, [str(n_rows), str(cores)]
                )
            s1, t1 = _cpu_ticks()
            steal = (s1 - s0) / max(1, t1 - t0)
            leg = json.loads(
                [l for l in stdout.splitlines() if l.startswith("RESULT ")][-1][7:]
            )
            mins = can.mins()
            leg["steal"] = round(steal, 4)
            leg["canary_min_touch"] = round(mins["touch"], 1)
            clean = steal <= max_steal and (
                min_canary <= 0 or mins["touch"] >= min_canary * ref["touch"]
            )
            if not leg["verified"]:
                print(f"# REJECT (verification failed): {leg}", file=sys.stderr)
                sys.exit(2)
            if clean:
                runs[cores].append(leg)
            else:
                dirty[cores] += 1
            print(f"# leg {json.dumps(leg)} clean={clean}", file=sys.stderr)

    if not runs[low] or not runs[high]:
        print(json.dumps({"error": "no clean legs", "dirty": dirty}))
        sys.exit(1)
    # cross-level digest agreement: the pipeline must produce identical
    # reports at both parallelism levels
    digs = {
        (leg["digest_mismatch_rows"], leg["digest_column_metrics"])
        for legs in runs.values()
        for leg in legs
    }
    lo = min(runs[low], key=lambda r: r["wall_s"])
    hi = min(runs[high], key=lambda r: r["wall_s"])
    eff = (lo["wall_s"] / hi["wall_s"]) / (high / low)
    print(json.dumps({
        "pipeline": "config-driven validation (annotated compare)",
        "rows": n_rows,
        "low_cores": low, "high_cores": high,
        "low_wall_s": lo["wall_s"], "high_wall_s": hi["wall_s"],
        "low_rows_per_sec": lo["rows_per_sec"],
        "high_rows_per_sec": hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "digests_agree_across_levels": len(digs) == 1,
        "verified": True,
        "all_low_wall_s": sorted(r["wall_s"] for r in runs[low]),
        "all_high_wall_s": sorted(r["wall_s"] for r in runs[high]),
        "dirty_legs": dirty,
    }))


if __name__ == "__main__":
    main()
