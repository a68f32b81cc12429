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
as storm-dirty, default 0.05), SCALING_MIN_CANARY (fraction of the quiet
canary reference below which a leg is memory-storm-dirty, default 0.1),
SCALING_MAX_DIRTY_FACTOR (attempt budget = repeats x this, default 4).

At ≥8M-event fixtures the in-leg canary is NOT trustworthy: the leg's own
tmpfs writes + JVM page faulting depress the parent's page-touch rate
30-180x below the quiet reference even while the leg itself runs clean
(measured 2026-08-18: back-to-back 1-core legs walled 466.63s and 463.66s
— 0.6% apart, impossible mid-storm where walls inflate 1.5-10x — with
touch mins of 9.8 and 6.3 MB/s vs a 1746 MB/s reference).  For big
fixtures run with SCALING_MIN_CANARY=0 and certify on the steal gate plus
WALL REPRODUCIBILITY instead: k interleaved legs per level whose min-of-k
spread is reported in the output (all_wall_s); a storm cannot make a leg
faster, so tight agreement across legs IS the cleanliness certificate.

Why MIN_CANARY is a CATASTROPHE filter (0.1x), not a cleanliness gate:
host noise is strictly additive — a wall can only be inflated, never
deflated — so the min over k legs converges on the clean wall from above.
The canary's job is only to reject legs caught in the two catastrophic
modes (steal storm, ballooning/memory collapse: touch rate drops 100-400x)
whose walls are 2-10x garbage and would waste a repeat slot.  Moderate
canary dips (0.2-0.5x) mostly reflect co-tenant traffic on the OTHER
cores of the box — measured: they barely move the wall of a busy leg but
false-flag 1-core legs (31 idle cores hand the memory bus to neighbors,
depressing the canary while our single busy core runs at speed).  A
strict 0.5x gate therefore rejects legs whose walls are within a few
percent of clean and starves the estimator on busy nights; min-of-k over
non-catastrophic legs is the robust estimate.

Host-noise model (measured on this sandbox; both modes are co-tenant
interference on the shared physical box):

1. STEAL STORMS — co-tenants pin the physical cores; /proc/stat steal
   jumps past 50% and identical legs inflate 5-10x.  Detected by the
   per-leg steal fraction.
2. KERNEL/MEMORY STORMS — steal stays under 5% but the memory subsystem
   collapses: an anonymous 128 MB page-touch that takes ~0.1s quiet was
   measured taking 20s+ of pure sys time mid-storm (~200x).  Spark's
   shuffle/parquet work is memory-heavy and inflates 1.5-5x, while
   loadavg and steal look clean.  CRITICALLY, this mode is partly
   SELF-INFLICTED: the sandbox hypervisor overcommits memory, and a JVM
   whose resident set grows past ~20 GB triggers ballooning that
   throttles the whole VM (measured: a 24g pre-touched heap collapsed
   the canary to 4 MB/s and ran every batch 4-5x slow; the identical
   leg with a 6g heap ran all batches clean).  Hence the default driver
   memory here is 6g (SPARK_GRAFT_DRIVER_MEM to override) — plenty for
   8M-event batches, and small enough to stay under the ballooning
   threshold.  Residual co-tenant storms are detected by an in-leg
   CANARY thread
   sampling the anonymous-mmap page-touch rate every ~6s; a leg whose
   slowest sample drops below SCALING_MIN_CANARY x the quiet reference is
   discarded.  (A 64 MB streaming-sum rate is recorded as a diagnostic but
   not gated on — the leg's own memory traffic depresses it ~40% even on a
   quiet host, while the page-touch rate is immune to own-load and
   collapses ~200x in a storm.)

Protocol per leg: gate on loadavg + steal + instantaneous canary, run the
leg in a fresh spark-submit with an untimed warm-up replay (JIT/codegen paid
outside the timed region), sample the canary throughout, then certify.
Estimate = min wall over certified-clean legs, interleaved across levels.
Row-level verification (hash_reconcile vs the batch oracle) runs on the
FIRST clean leg per level only — the job and input are deterministic, so
repeat legs reuse that verdict and keep their storm-exposure window short.

Choosing the core pair: measure the HOST's parallel-CPU ceiling first
(``scripts/host_ceiling.py``; BASELINE.md records the measured sweep) —
the N→4N pair must sit inside the host's linear region or the measurement
reports the box's SMT/memory-bandwidth rolloff, not the job's scaling.
On this sandbox 1→4 sits at pure-CPU efficiency ~1.0 (BASELINE.md sweep);
8→32 rolls off (0.64-0.83 depending on co-tenant load), so the committed
pair is 1→4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

DRIVER = r"""
import json, sys, tempfile, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from data_migration_validator_spark.cdc.events import change_events, write_events_batched
from data_migration_validator_spark.cdc.replay import replay, pending_batches
from data_migration_validator_spark.lake.table import LakeTable

import os
n_events, cores, events_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
n_repos, n_batches, verify = int(sys.argv[4]), int(sys.argv[5]), sys.argv[6] == "1"
workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/dev/shm")
# IDENTICAL job at both parallelism levels: same shuffle partitioning, same
# bucket count, same input — only the executor-thread count differs.
spark = (
    SparkSession.builder
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # 16m advisory: AQE otherwise coalesces the ~150MB dedup shuffle to a
    # handful of fat partitions, starving the high-core leg of tasks.
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    # zstd block compression exploits the event payload's redundancy far
    # better than lz4 (395 -> 147 MB shuffled per 1M-event batch measured):
    # on a memory-bandwidth-bound host, trading well-scaling CPU for bytes
    # moved is exactly the right side of the trade.
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.parquet.compression.codec", "zstd")
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
    replay(warm, f"{tmp}/warm_events",
           merge_mode=os.environ.get("SCALING_MERGE_MODE", "mor"))
    warm.compact()

    table = LakeTable.create(
        spark, f"{tmp}/repo_content", SCHEMA,
        key_cols=["repo", "path"], bucket_col="repo", num_buckets=32,
    )
    merge_mode = os.environ.get("SCALING_MERGE_MODE", "mor")
    bids = pending_batches(table, events_dir)
    batch_spans = []  # epoch [start, end] per micro-batch, for span-scoped
    # storm certification in the parent (canary samples are epoch-stamped)
    for bid in bids:
        ts = time.time()
        replay(table, events_dir, batch_ids=[bid], merge_mode=merge_mode)
        batch_spans.append([round(ts, 2), round(time.time(), 2)])
    batch_walls = [round(b - a, 2) for a, b in batch_spans]
    wall = round(batch_spans[-1][1] - batch_spans[0][0], 2)
    # MOR ingest defers the base rewrite to compaction (async maintenance on
    # a real cluster); time it separately and report both so nothing hides.
    compact_wall = 0.0
    if merge_mode == "mor":
        c0 = time.time()
        table.compact()
        compact_wall = round(time.time() - c0, 2)
    bad = -1  # verification skipped (repeat leg reuses first leg's verdict)
    if verify:
        from data_migration_validator_spark.cdc.oracle import expected_final_state
        from data_migration_validator_spark.validation.reconcile import hash_reconcile
        ev = change_events(spark, n_events=n_events, n_repos=n_repos,
                           paths_per_repo=2000, seed=42,
                           batch_size=max(1, n_events // n_batches))
        rec = hash_reconcile(table.read(), expected_final_state(ev),
                             ["repo", "path"], ["commit", "lang", "content"])
        bad = rec.filter(F.col("status") != "MATCH").count()
    print("RESULT " + json.dumps({
        "cores": cores, "events": n_events, "wall_s": wall,
        "events_per_sec": round(n_events / wall, 1),
        "merge_mode": merge_mode, "compact_wall_s": compact_wall,
        "batches": len(batch_walls), "batch_walls": batch_walls,
        "batch_spans": batch_spans,
        "verified": (bad == 0) if verify else None,
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
    s0, t0 = _cpu_ticks()
    time.sleep(window_s)
    s1, t1 = _cpu_ticks()
    return (s1 - s0) / max(1, t1 - t0)


# ---------------------------------------------------------------------- #
# Memory-storm canary: detects co-tenant kernel/memory-subsystem storms
# that steal ticks can NOT see (measured: 128 MB anonymous page-touch
# 0.1s quiet vs 20s+ sys-time mid-storm while steal stayed under 4%).
# Spark legs inflate 1.5-5x in that mode; a register-arithmetic canary
# stays at full speed, so the canary must stress the MEMORY path.
# ---------------------------------------------------------------------- #
_TOUCH_BYTES = 64 * 1024 * 1024
_PAGE = 4096


def touch_rate() -> float:
    """MB/s of anonymous mmap page-fault+zero — the storm-sensitive path."""
    import mmap

    t0 = time.monotonic()
    m = mmap.mmap(-1, _TOUCH_BYTES)
    m[::_PAGE] = b"x" * (_TOUCH_BYTES // _PAGE)
    dt = time.monotonic() - t0
    m.close()
    return (_TOUCH_BYTES / 1e6) / dt


_stream_buf = None


def stream_rate() -> float:
    """GB/s of a 64 MB (beyond-LLC) numpy streaming sum."""
    global _stream_buf
    import numpy as np

    if _stream_buf is None:
        _stream_buf = np.ones(8_000_000)
    t0 = time.monotonic()
    _stream_buf.sum()
    return (_stream_buf.nbytes / 1e9) / (time.monotonic() - t0)


def canary_sample() -> dict[str, float]:
    return {"touch": touch_rate(), "stream": stream_rate()}


def quiet_reference(k: int = 5, settle_timeout_s: float = 300.0) -> dict[str, float]:
    """Best canary rates over k seconds — the 'quiet host' yardstick.
    Max (not mean) so a storm during calibration can only make the gate
    stricter, never looser.  If the best touch rate looks ballooning-
    depressed (< 500 MB/s — e.g. right after a large-heap JVM exited),
    keep sampling until the host settles so the reference is never
    calibrated against a throttled host (which would make the dirty gate
    vacuous)."""
    deadline = time.monotonic() + settle_timeout_s
    best = {"touch": 0.0, "stream": 0.0}
    while True:
        for _ in range(k):
            s = canary_sample()
            best = {m: max(best[m], s[m]) for m in best}
            time.sleep(1)
        if best["touch"] >= 500.0 or time.monotonic() > deadline:
            return best


class CanaryThread:
    """Samples the memory canary every ~6s for the duration of a leg.
    Samples are epoch-stamped so certification can be scoped to the TIMED
    replay span: the leg also spends untimed wall on JVM start, warm-up,
    and (first leg per level) verification, and a storm there must not
    discard an otherwise-clean measurement."""

    def __init__(self) -> None:
        self.samples: list[tuple[float, dict[str, float]]] = []
        self._stop = threading.Event()
        self._th = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.samples.append((time.time(), canary_sample()))
            except Exception:
                pass
            self._stop.wait(6.0)

    def __enter__(self) -> "CanaryThread":
        self._th.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._th.join(timeout=3)

    def mins(self, span: tuple[float, float] | None = None) -> dict[str, float]:
        """Worst sample rates, optionally restricted to an epoch span.
        The span is widened by one sampling interval on the left so a
        sample straddling the span start still counts."""
        if span is None:
            sel = [s for _, s in self.samples]
        else:
            a, b = span
            sel = [s for t, s in self.samples if a - 6.5 <= t <= b + 0.5]
        if not sel:
            return {"touch": 0.0, "stream": 0.0}
        return {m: min(s[m] for s in sel) for m in ("touch", "stream")}


def wait_for_quiet(
    max_load: float = 3.0,
    timeout_s: int = 900,
    max_steal: float = 0.05,
    ref: dict[str, float] | None = None,
    min_canary: float = 0.6,
) -> None:
    """Gate each leg on 1-min loadavg (our own stragglers), a sampled steal
    fraction (co-tenant CPU storms), and the instantaneous memory canary
    (co-tenant kernel/memory storms).  Mid-leg storms remain possible —
    each leg's steal and canary are tracked across its whole run and dirty
    legs are discarded (see main)."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 > max_load:
            time.sleep(10)
            continue
        if ref is not None:
            # Gate on the page-touch canary only: the streaming-sum rate is
            # depressed ~40% by our OWN leg's memory traffic (and by the
            # co-running generator), so it would false-flag healthy legs;
            # page-touch stays at full rate under own load (measured) while
            # collapsing ~200x in a storm — it is the discriminator.
            if canary_sample()["touch"] < min_canary * ref["touch"]:
                time.sleep(10)
                continue
        if steal_fraction(3.0) <= max_steal:
            return
        time.sleep(10)


def spark_submit(cores: int, script: str, args: list[str]) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(tempfile.gettempdir(), "dmvs_pkg.zip")
    if True:  # always rebuild: a cached zip silently benches stale code
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
    # Pin the leg to exactly `cores` physical CPUs.  local[N] caps TASK
    # slots only: the JVM's GC / Netty / parquet-compression helper threads
    # still fan out over every host CPU, so an unpinned "1-core" leg
    # silently burns 1.3-1.8 cores and deflates measured N→4N efficiency
    # (this is also the faithful cluster analog — a 1-core executor
    # container is cgroup-limited to 1 CPU, helpers included).
    # SCALING_NO_TASKSET=1 opts out.
    pin: list[str] = []
    if not os.environ.get("SCALING_NO_TASKSET"):
        pin = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g")
    out = subprocess.run(
        [*pin, "spark-submit", "--master", f"local[{cores}]",
         "--driver-memory", mem,
         # preset heap = max: batch 0 otherwise runs inside G1's grow phase
         # (measured 12s GC vs 1s steady-state) and charges it to one level
         "--conf", f"spark.driver.extraJavaOptions=-Xms{mem}",
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
        spark_submit(min(32, os.cpu_count() or 32), GEN,
                     [str(n_events), events_dir, str(n_repos), str(n_batches)])

        # The physical host is shared: co-tenant storms (CPU-steal AND
        # kernel/memory modes — see module docstring) inflate identical
        # legs 1.5-10x.  Protocol: interleave the two levels; measure each
        # leg's steal fraction and in-leg memory canary across its whole
        # wall; a leg breaching either threshold is DIRTY and does not
        # count toward `repeats` (retried, up to a cap).  Estimate = min
        # wall over clean legs — "min over certified-quiet runs" rather
        # than hoping k repeats caught a quiet window.
        max_steal = float(os.environ.get("SCALING_MAX_STEAL", "0.05"))
        max_load = float(os.environ.get("SCALING_MAX_LOAD", "3.0"))
        min_canary = float(os.environ.get("SCALING_MIN_CANARY", "0.1"))
        max_attempts = repeats * int(os.environ.get("SCALING_MAX_DIRTY_FACTOR", "4"))
        ref = quiet_reference()
        print(f"# canary quiet reference: {ref}", file=sys.stderr)
        runs: dict[int, list[dict]] = {low: [], high: []}
        dirty: dict[int, int] = {low: 0, high: 0}
        verified: dict[int, bool] = {}
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
                # Verify on the first clean leg per level only: the job and
                # input are deterministic, and the (untimed) single-core
                # verification pass would otherwise double the leg's
                # storm-exposure window.
                do_verify = cores not in verified
                s0, t0 = _cpu_ticks()
                with CanaryThread() as can:
                    stdout = spark_submit(
                        cores, DRIVER,
                        [str(n_events), str(cores), events_dir,
                         str(n_repos), str(n_batches),
                         "1" if do_verify else "0"],
                    )
                s1, t1 = _cpu_ticks()
                leg_steal = (s1 - s0) / max(1, t1 - t0)
                line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][0]
                r = json.loads(line[len("RESULT "):])
                # Certify against the TIMED replay span only: warm-up and
                # verification also sit inside the leg's wall, and a storm
                # there doesn't touch the measurement.
                span = (r["batch_spans"][0][0], r["batch_spans"][-1][1])
                mins = can.mins(span)
                r["steal"] = round(leg_steal, 4)
                r["canary_touch_min"] = round(mins["touch"], 0)
                r["canary_stream_min"] = round(mins["stream"], 2)
                r["canary_touch_min_batch"] = [
                    round(can.mins((a, b))["touch"], 0)
                    for a, b in r["batch_spans"]
                ]
                # Dirty test uses steal + page-touch only; the stream rate
                # is recorded as a diagnostic but NOT gated on — our own
                # leg's memory traffic depresses it ~40% even on a quiet
                # host, which would false-flag every healthy high-core leg.
                storm = (
                    leg_steal > max_steal
                    or mins["touch"] < min_canary * ref["touch"]
                )
                print(f"# leg cores={cores} wall={r['wall_s']} "
                      f"steal={r['steal']} canary_mins={mins} "
                      f"{'DIRTY' if storm else 'clean'}", file=sys.stderr)
                if r.get("verified") is not None:
                    # a failed verification is fatal regardless of storms
                    if r["verified"] is False:
                        raise SystemExit(
                            f"replay verification FAILED at {cores} cores")
                    verified[cores] = True
                if storm:
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
            results[c]["verified"] = verified.get(c, False)

    r_lo, r_hi = results[low], results[high]
    ratio = high / low
    efficiency = (r_lo["wall_s"] / r_hi["wall_s"]) / ratio
    out = {
        "n_events": n_events,
        "n_repos": n_repos,
        "n_batches": n_batches,
        "merge_mode": r_lo.get("merge_mode"),
        "canary_ref": {k: round(v, 1) for k, v in ref.items()},
        "low": r_lo,
        "high": r_hi,
        "core_ratio": ratio,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0_8": efficiency >= 0.8,
    }
    if r_lo.get("compact_wall_s"):
        # MOR: ingest throughput is the headline (events are durably
        # applied at delta commit); also report the wall including the
        # deferred base rewrite so the maintenance cost scales visibly too.
        lo_t = r_lo["wall_s"] + r_lo["compact_wall_s"]
        hi_t = r_hi["wall_s"] + r_hi["compact_wall_s"]
        out["scaling_efficiency_incl_compact"] = round((lo_t / hi_t) / ratio, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
