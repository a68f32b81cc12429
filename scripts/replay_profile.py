"""Replay profiler: splits each batch's wall into executor work vs driver gap.

Runs the replay loop once at a given core count (taskset-pinned, fresh
spark-submit, warmed) with the Spark UI's REST API enabled, and after each
batch pulls per-stage executorRunTime / executorCpuTime / shuffle + input
volumes.  The interesting derived numbers per batch:

    wall            batch wall seconds (driver-observed)
    task_s          sum of task executorRunTime (seconds of occupied slot)
    cpu_s           sum of task executorCpuTime (on-CPU seconds)
    ideal_s         task_s / cores — the wall if scheduling were perfect
    driver_gap_s    wall - ideal_s — driver bookkeeping, planning, py4j,
                    scheduling stalls, and task-count raggedness

If driver_gap_s is flat across levels it is the serial term the N→4N gate
punishes; if task_s itself inflates at 4 cores the job has a contention
problem (memory bandwidth, GC, tmpfs locks), not a serial one.

Usage: python scripts/replay_profile.py [n_events] [cores] [n_batches]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

PROBE = r"""
import json, os, sys, tempfile, time, urllib.request
from pyspark.sql import SparkSession
from data_migration_validator_spark.cdc.events import change_events, write_events_batched
from data_migration_validator_spark.cdc.replay import replay, pending_batches
from data_migration_validator_spark.lake.table import LakeTable

n_events, cores, n_batches = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = (SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4055")
    .getOrCreate())
app_id = spark.sparkContext.applicationId

def stages():
    # derive from the bound UI (port 4055 may be taken; Spark then binds
    # the next free port and a hardcoded URL would 404)
    base = spark.sparkContext.uiWebUrl
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return json.load(r)

def totals():
    t = {"task_ms": 0, "cpu_ns": 0, "gc_ms": 0, "stages": 0, "tasks": 0,
         "input_mb": 0.0, "shuffle_w_mb": 0.0}
    for s in stages():
        t["task_ms"] += s["executorRunTime"]
        t["cpu_ns"] += s["executorCpuTime"]
        t["gc_ms"] += s["jvmGcTime"]
        t["stages"] += 1
        t["tasks"] += s["numCompleteTasks"]
        t["input_mb"] += s["inputBytes"] / 1e6
        t["shuffle_w_mb"] += s["shuffleWriteBytes"] / 1e6
    return t

def stage_rows(seen):
    rows = []
    for s in stages():
        sid = (s["stageId"], s["attemptId"])
        if sid in seen:
            continue
        seen.add(sid)
        rows.append({
            "id": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "task_s": round(s["executorRunTime"] / 1e3, 2),
            "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
            "gc_s": round(s["jvmGcTime"] / 1e3, 2),
            "tasks": s["numCompleteTasks"],
            "input_mb": round(s["inputBytes"] / 1e6, 1),
            "sw_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
        })
    return rows

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
    ev = change_events(spark, n_events=n_events, n_repos=5000,
                       paths_per_repo=2000, seed=42,
                       batch_size=max(1, n_events // n_batches))
    write_events_batched(ev, f"{tmp}/events")
    # warmup (untimed, separate table)
    warm = LakeTable.create(spark, f"{tmp}/warm", SCHEMA,
                            key_cols=["repo", "path"], bucket_col="repo",
                            num_buckets=32)
    wev = change_events(spark, n_events=40_000, n_repos=500,
                        paths_per_repo=200, seed=7, batch_size=20_000)
    write_events_batched(wev, f"{tmp}/warm_events")
    replay(warm, f"{tmp}/warm_events",
           merge_mode=os.environ.get("REPLAY_MERGE_MODE") or None)
    warm.compact()

    table = LakeTable.create(spark, f"{tmp}/repo_content", SCHEMA,
                             key_cols=["repo", "path"], bucket_col="repo",
                             num_buckets=32)
    out = []
    prev = totals()
    seen = set()
    stage_rows(seen)  # swallow warmup stages
    merge_mode = os.environ.get("REPLAY_MERGE_MODE") or None
    # library default (single-phase): profiling a salted job would diagnose
    # a code path the scaling benchmark never runs
    salt = int(os.environ.get("REPLAY_SALT_BUCKETS", "1"))
    for bid in pending_batches(table, f"{tmp}/events"):
        t0 = time.monotonic()
        replay(table, f"{tmp}/events", batch_ids=[bid], merge_mode=merge_mode,
               salt_buckets=salt)
        wall = time.monotonic() - t0
        cur = totals()
        d = {k: cur[k] - prev[k] for k in cur}
        prev = cur
        task_s = d["task_ms"] / 1e3
        out.append({
            "batch": bid, "wall": round(wall, 2),
            "task_s": round(task_s, 2),
            "cpu_s": round(d["cpu_ns"] / 1e9, 2),
            "gc_s": round(d["gc_ms"] / 1e3, 2),
            "ideal_s": round(task_s / cores, 2),
            "driver_gap_s": round(wall - task_s / cores, 2),
            "stages": d["stages"], "tasks": d["tasks"],
            "input_mb": round(d["input_mb"], 1),
            "shuffle_w_mb": round(d["shuffle_w_mb"], 1),
            "stage_detail": sorted(stage_rows(seen),
                                   key=lambda r: -r["task_s"])[:6],
        })
    print("PROFILE " + json.dumps({"cores": cores, "batches": out}))
"""


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(PROBE)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(tempfile.gettempdir(), "dmvs_pkg.zip")
    if True:  # always rebuild: a cached zip silently benches stale code
        subprocess.run(["zip", "-qr", pkg, "data_migration_validator_spark"],
                       cwd=repo, check=True)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)
    pin = [] if os.environ.get("SCALING_NO_TASKSET") else [
        "taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]
    extra = [a for kv in os.environ.get("PROFILE_CONFS", "").split(";") if kv
             for a in ("--conf", kv)]
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g")
    out = subprocess.run(
        [*pin, "spark-submit", "--master", f"local[{cores}]",
         "--driver-memory", mem,
         "--conf", f"spark.local.dir={local_dir}",
         *extra,
         "--py-files", pkg, path, str(n_events), str(cores), str(n_batches)],
        capture_output=True, text=True, cwd=repo, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("PROFILE ")][0]
    print(line[len("PROFILE "):])


if __name__ == "__main__":
    main()
