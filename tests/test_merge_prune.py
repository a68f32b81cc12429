"""MERGE file pruning (LakeTable._merge_candidate_files): COW merges skip
base files whose per-file key min/max provably exclude every change key.

Scale rationale: at 10^10 rows a bucket holds many files (one per historical
append/compaction), but a CDC batch's keys usually intersect a few of them —
the classic shape is monotone keys with updates skewed recent.  Whole-bucket
COW rewrites are O(touched buckets); file-scoped rewrites are O(intersected
files).  Every test here asserts RESULT equality against an unpruned clone,
so a pruning bug can only fail loudly, plus the row-accounting invariants
(row_count / bucket_rows) that the manifest carries.
"""

import os

from pyspark.sql import functions as F

from data_migration_validator_spark.lake import LakeTable

SCHEMA = [("id", "bigint"), ("val", "string"), ("ver", "int")]
N_BUCKETS = 4


def _mk(spark, root, name, properties=None):
    props = {"write.sort.cols": "id"}
    props.update(properties or {})
    return LakeTable.create(
        spark,
        os.path.join(root, name),
        SCHEMA,
        key_cols=["id"],
        num_buckets=N_BUCKETS,
        properties=props,
    )


def _rows(spark, lo, hi, ver=0, val="base"):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.concat(F.lit(val), F.col("id")).alias("val"),
        F.lit(ver).cast("int").alias("ver"),
    )


def _build(spark, root, name, n_appends=4, span=1000, properties=None):
    """n_appends appends of disjoint key ranges -> n_appends files/bucket."""
    t = _mk(spark, root, name, properties)
    for i in range(n_appends):
        t.append(_rows(spark, i * span, (i + 1) * span))
    return t


def _changes(spark, up_lo, up_hi, del_lo, del_hi, ins_lo, ins_hi):
    ups = _rows(spark, up_lo, up_hi, ver=1, val="upd").withColumn(
        "op", F.lit("upsert")
    )
    ins = _rows(spark, ins_lo, ins_hi, ver=1, val="new").withColumn(
        "op", F.lit("upsert")
    )
    dels = _rows(spark, del_lo, del_hi, ver=1).withColumn("op", F.lit("delete"))
    return ups.unionByName(ins).unionByName(dels)


def _sorted_rows(t):
    return [tuple(r) for r in t.read().orderBy("id").collect()]


def test_pruned_merge_equals_unpruned(spark, tmp_root):
    """Same change-set, pruning on vs off: identical table state, but the
    pruned merge keeps the non-intersected files byte-identical."""
    t_on = _build(spark, tmp_root, "on")
    t_off = _build(
        spark, tmp_root, "off", properties={"write.merge.prune_files": "false"}
    )
    ch = _changes(spark, 3000, 3100, 3100, 3110, 4000, 4010)
    s_on = t_on.merge(ch, broadcast_changes=True)
    s_off = t_off.merge(ch, broadcast_changes=True)

    assert _sorted_rows(t_on) == _sorted_rows(t_off)
    assert s_on["rows_deleted"] == s_off["rows_deleted"] == 10
    assert s_on["rows_upserted"] == s_off["rows_upserted"] == 110

    # every change key is in [3000, 4010) -> only the 4th append's files
    # (range [3000, 4000)) intersect; appends 1-3 survive untouched
    assert s_off["files_kept"] == 0
    assert s_on["files_kept"] > 0
    assert s_on["files_rewritten"] < s_off["files_rewritten"]
    before = {
        e["path"] for e in LakeTable.load(spark, t_on.root).at_version(
            s_on["seq"] - 1
        ).manifest["files"]
    }
    kept_now = {e["path"] for e in t_on.manifest["files"]} & before
    assert len(kept_now) == s_on["files_kept"]


def test_fully_disjoint_batch_keeps_all_touched_files(spark, tmp_root):
    """Insert-only batch with keys beyond every file range: nothing is
    rewritten inside the touched buckets except the new files."""
    t = _build(spark, tmp_root, "t", n_appends=3)
    ins = _rows(spark, 9000, 9040, ver=1, val="new").withColumn(
        "op", F.lit("upsert")
    )
    st = t.merge(ins, broadcast_changes=True)
    assert st["files_rewritten"] == 0
    assert st["files_kept"] > 0
    assert t.read().count() == 3000 + 40
    # row accounting survives the partial rewrite
    assert sum(t.manifest["bucket_rows"].values()) == 3040


def test_row_accounting_after_pruned_merge(spark, tmp_root):
    t = _build(spark, tmp_root, "t")
    ch = _changes(spark, 3500, 3600, 100, 120, 5000, 5050)
    t.merge(ch, broadcast_changes=True)
    expect = 4000 - 20 + 50
    assert t.read().count() == expect
    assert sum(t.manifest["bucket_rows"].values()) == expect
    assert t.detail()["num_rows"] == expect


def test_delta_buckets_are_not_pruned(spark, tmp_root):
    """A bucket carrying live MOR deltas must rewrite whole (delta keys are
    not in the probe): result still equals the unpruned clone."""
    t_on = _build(spark, tmp_root, "on")
    t_off = _build(
        spark, tmp_root, "off", properties={"write.merge.prune_files": "false"}
    )
    mor = _rows(spark, 200, 260, ver=2, val="mor").withColumn(
        "op", F.lit("upsert")
    )
    for t in (t_on, t_off):
        t.merge(mor, mode="mor")
    ch = _changes(spark, 3000, 3050, 3050, 3060, 4000, 4005)
    t_on.merge(ch, broadcast_changes=True)
    t_off.merge(ch, broadcast_changes=True)
    assert _sorted_rows(t_on) == _sorted_rows(t_off)
    # the MOR rows survived the COW pass
    got = {r["id"]: r["val"] for r in t_on.read().filter("id < 260").collect()}
    assert got[200] == "mor200" and got[199] == "base199"


def test_missing_stats_file_is_always_candidate(spark, tmp_root):
    """A file without key stats (stats disabled at write time) can never be
    skipped — merge falls back to rewriting it and stays correct."""
    t = _build(
        spark, tmp_root, "t", n_appends=2, properties={"write.stats.cols": ""}
    )
    assert all("stats" not in e for e in t.manifest["files"])
    ch = _changes(spark, 100, 110, 110, 112, 5000, 5002)
    st = t.merge(ch, broadcast_changes=True)
    assert st["files_kept"] == 0
    assert t.read().count() == 2000 - 2 + 2
    got = {r["id"]: r["val"] for r in t.read().filter("id < 112").collect()}
    assert got[100] == "upd100" and 110 not in got


def test_string_key_pruning(spark, tmp_root):
    """String keys range-probe on the (possibly truncated) bounds; result
    equality vs the unpruned clone."""
    schema = [("k", "string"), ("v", "int")]

    def mk(name, props=None):
        p = {"write.sort.cols": "k"}
        p.update(props or {})
        return LakeTable.create(
            spark, os.path.join(tmp_root, name), schema,
            key_cols=["k"], num_buckets=2, properties=p,
        )

    def rows(prefix, n):
        return spark.createDataFrame(
            [(f"{prefix}{i:04d}", i) for i in range(n)], "k string, v int"
        )

    t_on, t_off = mk("on"), mk("off", {"write.merge.prune_files": "false"})
    for t in (t_on, t_off):
        t.append(rows("a", 50))
        t.append(rows("m", 50))
        t.append(rows("z", 50))
    ch = rows("m", 10).withColumn("v", F.col("v") + 100).withColumn(
        "op", F.lit("upsert")
    )
    s_on = t_on.merge(ch, broadcast_changes=True)
    s_off = t_off.merge(ch, broadcast_changes=True)
    assert s_on["files_kept"] > 0 and s_off["files_kept"] == 0
    assert (
        sorted(tuple(r) for r in t_on.read().collect())
        == sorted(tuple(r) for r in t_off.read().collect())
    )


def test_pruned_merge_change_feed_still_consistent(spark, tmp_root):
    """changes() between the pre- and post-merge snapshots sees exactly the
    merged keys even when most files were kept."""
    t = _build(spark, tmp_root, "t")
    v0 = t.manifest["seq"]
    ch = _changes(spark, 3000, 3010, 3010, 3015, 6000, 6003)
    st = t.merge(ch, broadcast_changes=True)
    assert st["files_kept"] > 0
    feed = t.changes(v0, st["seq"])
    by_type = {
        r["_change_type"]: r["cnt"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type.get("insert", 0) == 3
    assert by_type.get("delete", 0) == 5
    assert by_type.get("update_postimage", by_type.get("update", 0)) == 10


def test_decimal_column_stats_degrade_not_crash(spark, tmp_root):
    """Arrow raises ArrowNotImplementedError extracting footer stats for
    INT64-backed decimals; the commit must degrade that column to
    no-stats (prune falls back to rewrite) instead of failing the task."""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "dec"),
        [("id", "bigint"), ("amt", "decimal(10,2)")],
        key_cols=["id"], num_buckets=2,
        properties={"write.sort.cols": "id"},
    )
    rows = spark.range(200).select(
        F.col("id"), (F.col("id") / F.lit(3)).cast("decimal(10,2)").alias("amt")
    )
    t.append(rows)  # must not raise
    assert t.read().count() == 200
    # id (bigint) stats survive even though amt's are degraded
    id_fid = str(t.schema.field_by_name("id").id)
    assert all(id_fid in (e.get("stats") or {}) for e in t.manifest["files"])
    ch = (
        spark.range(500, 510)
        .select(
            F.col("id"),
            F.lit("1.00").cast("decimal(10,2)").alias("amt"),
            F.lit("upsert").alias("op"),
        )
    )
    st = t.merge(ch, broadcast_changes=True)
    assert st["files_kept"] > 0  # bigint-key prune still works
    assert t.read().count() == 210


def test_tier1_range_prune_with_probe_never(spark, tmp_root):
    """probe=never: the free per-bucket range tier alone must keep the
    disjoint files (no probe job exists to help), result-equal to the
    unpruned clone."""
    t_on = _build(
        spark, tmp_root, "on",
        properties={"write.merge.prune.probe": "never"},
    )
    t_off = _build(
        spark, tmp_root, "off",
        properties={"write.merge.prune_files": "false"},
    )
    ch = _changes(spark, 3200, 3300, 3300, 3310, 4000, 4010)
    s_on = t_on.merge(ch, broadcast_changes=True)
    s_off = t_off.merge(ch, broadcast_changes=True)
    assert s_on["files_kept"] > 0  # appends 1-3 ([0,3000)) are range-disjoint
    assert _sorted_rows(t_on) == _sorted_rows(t_off)
    assert sum(t_on.manifest["bucket_rows"].values()) == 4000 - 10 + 10


def test_probe_auto_gates_off_for_large_batches(spark, tmp_root):
    """auto mode with broadcast_max_rows=0 simulates a huge batch: the
    per-key probe must NOT run.  The fixture pins two change keys to the
    SAME bucket, one inside append 1's range and one inside append 4's, so
    that bucket's tier-1 change range spans all four files — tier 1 alone
    clears nothing, the probe clears the two middle appends.  A gated run
    must therefore keep exactly what probe=never keeps and STRICTLY fewer
    files than the probe-on run (this is what makes a gate regression —
    the probe wrongly running — detectable)."""
    bk = {
        r["id"]: r["b"]
        for r in spark.range(0, 4000)
        .select(
            "id",
            F.pmod(F.xxhash64(F.col("id")), F.lit(N_BUCKETS)).cast("int").alias("b"),
        )
        .collect()
    }
    k1 = 5
    k2 = next(i for i in range(3000, 4000) if bk[i] == bk[k1])

    def mk_change():
        return spark.createDataFrame([(k1,), (k2,)], "id bigint").select(
            F.col("id"),
            F.concat(F.lit("upd"), F.col("id")).alias("val"),
            F.lit(1).cast("int").alias("ver"),
            F.lit("upsert").alias("op"),
        )

    t_gate = _build(spark, tmp_root, "gate")
    t_never = _build(
        spark, tmp_root, "never",
        properties={"write.merge.prune.probe": "never"},
    )
    t_probe = _build(spark, tmp_root, "probe")
    s_gate = t_gate.merge(mk_change(), broadcast_max_rows=0)
    s_never = t_never.merge(mk_change())
    s_probe = t_probe.merge(mk_change())

    assert s_probe["files_kept"] > s_gate["files_kept"]
    assert s_gate["files_kept"] == s_never["files_kept"]
    assert (
        _sorted_rows(t_gate) == _sorted_rows(t_never) == _sorted_rows(t_probe)
    )
    got = {r["id"]: r["val"] for r in t_gate.read().filter(
        f"id in ({k1}, {k2})").collect()}
    assert got == {k1: f"upd{k1}", k2: f"upd{k2}"}
    assert t_gate.read().count() == 4000


def test_string_typed_change_key_disables_tier1(spark, tmp_root):
    """A change-set whose key column arrives string-typed compares in
    LEXICAL order ('10' < '9'), so its per-bucket min/max is meaningless
    in the table key's numeric domain — tier 1 must be disabled (the
    cross-domain guard), the probe (immune: Spark coerces inside the
    join) still prunes, and the result equals the unpruned clone."""
    def mk(name, props=None):
        p = {"write.sort.cols": "id"}
        p.update(props or {})
        return LakeTable.create(
            spark, os.path.join(tmp_root, name),
            [("id", "bigint"), ("grp", "string"), ("v", "int")],
            key_cols=["id"], bucket_col="grp", num_buckets=2, properties=p,
        )

    def rows(lo, hi, v=0):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(7))).alias("grp"),
            F.lit(v).cast("int").alias("v"),
        )

    t_on, t_off = mk("on"), mk("off", {"write.merge.prune_files": "false"})
    for t in (t_on, t_off):
        for i in range(3):
            t.append(rows(i * 100, (i + 1) * 100))
    # string-typed keys 9 and 10: lexical min/max is ("10", "9") — an
    # INVERTED numeric range that unguarded tier 1 would prune on
    ch = spark.createDataFrame([("9",), ("10",)], "id string").select(
        F.col("id"),
        F.concat(F.lit("g"), F.pmod(F.col("id").cast("bigint"), F.lit(7))).alias("grp"),
        F.lit(1).cast("int").alias("v"),
        F.lit("upsert").alias("op"),
    )
    s_on = t_on.merge(ch, broadcast_changes=True)
    s_off = t_off.merge(ch, broadcast_changes=True)
    assert s_on["rows_upserted"] == s_off["rows_upserted"] == 2
    assert (
        sorted(tuple(r) for r in t_on.read().collect())
        == sorted(tuple(r) for r in t_off.read().collect())
    )
    got = {r["id"]: r["v"] for r in t_on.read().filter("id in (9, 10)").collect()}
    assert got == {9: 1, 10: 1}
    assert t_on.read().count() == 300
    # the probe still prunes the file whose range excludes both keys
    assert s_on["files_kept"] > 0


def test_probe_hysteresis_disables_zero_yield_probes(spark, tmp_root):
    """Two consecutive probes that clean nothing beyond tier 1 must stop
    the handle from probing (streak freezes — no further updates), and
    compact() re-arms it."""
    t = _build(spark, tmp_root, "t", n_appends=1)  # 1 file/bucket: tier 1
    assert t._probe_miss_streak == 0               # and probe see the same
    # wide same-bucket batches -> tier 1 clears nothing, probe also clears
    # nothing (every file range contains change keys): zero-yield probes
    for i in range(3):
        ch = _rows(spark, 0, 1000, ver=i + 1, val="u").withColumn(
            "op", F.lit("upsert")
        )
        t.merge(ch, broadcast_changes=True)
        # streak counts the first two probes, then the gate skips the
        # probe entirely so the streak freezes at the limit
        assert t._probe_miss_streak == min(i + 1, 2)
    # maintenance changes the file geometry -> probe re-armed
    t.merge(
        _rows(spark, 0, 10, ver=9).withColumn("op", F.lit("upsert")),
        mode="mor",
    )
    t.compact()
    assert t._probe_miss_streak == 0
    assert t.read().count() == 1000


def test_hysteresis_never_trips_when_probe_is_only_tier(spark, tmp_root):
    """Cross-domain change keys disable tier 1, so zero-yield probes carry
    no 'shape learned' signal — the streak must NOT advance, and a later
    sparse batch still gets probe pruning.  (The bucket column is separate
    and correctly typed — a string-typed key on a key-bucketed table would
    hash wrong buckets and is not a valid merge input.)"""
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t"),
        [("id", "bigint"), ("grp", "string"), ("v", "int")],
        key_cols=["id"], bucket_col="grp", num_buckets=4,
        properties={"write.sort.cols": "id"},
    )

    def h(s):
        return spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(s)), F.lit(4)).cast("int")
        ).first()[0]

    ga = "gA"
    gb = next(g for g in ("gB", "gC", "gD", "gE") if h(g) != h(ga))
    grp_of = F.when(F.col("id") < 150, F.lit(ga)).otherwise(F.lit(gb))
    for i in range(3):
        t.append(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id"), grp_of.alias("grp"), F.lit(0).cast("int").alias("v")
            )
        )

    def str_keyed(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").cast("string").alias("id"),
            F.when(F.col("id") < 150, F.lit(ga)).otherwise(F.lit(gb)).alias("grp"),
            F.lit(1).cast("int").alias("v"),
            F.lit("upsert").alias("op"),
        )

    # two wide string-keyed batches confined to ga's bucket: probe runs,
    # cleans nothing, but the streak must stay 0 (tier 1 had no ranges to
    # learn from — WITHOUT the guard it would hit the miss limit here and
    # the later sparse probe below would be skipped)
    for _ in range(2):
        t.merge(str_keyed(0, 150), broadcast_changes=True)
        assert t._probe_miss_streak == 0
    # sparse batch on gb's UNTOUCHED bucket (3 intact files: id ranges
    # [150,200) and [200,300)): keys {160,161} exclude the [200,300) file,
    # so the probe — still armed — must keep it
    st = t.merge(str_keyed(160, 162), broadcast_changes=True)
    assert st["files_kept"] > 0
    assert t.read().count() == 300
