"""Digest-first bucket reconcile: short-circuit equality on aggregate
digests, row-level comparison only on differing buckets."""

from pyspark.sql import functions as F

from data_migration_validator_spark.validation import (
    bucket_reconcile,
    bucket_summary,
    hash_reconcile,
)
from data_migration_validator_spark.validation.bucket_reconcile import bucket_digests

KEYS = ["k1", "k2"]
CMP = ["v1", "v2"]


def _frames(spark):
    src = spark.createDataFrame(
        [(i, f"g{i % 7}", f"val{i}", float(i)) for i in range(500)],
        "k1 long, k2 string, v1 string, v2 double",
    )
    # tgt: drop 3 keys, add 2 new, corrupt 4 values
    tgt = (
        src.filter(~F.col("k1").isin(11, 99, 250))
        .withColumn(
            "v1",
            F.when(F.col("k1").isin(5, 123, 321, 480), F.lit("CORRUPT")).otherwise(
                F.col("v1")
            ),
        )
    )
    extra = spark.createDataFrame(
        [(1000, "gx", "new", 0.0), (1001, "gy", "new", 1.0)],
        "k1 long, k2 string, v1 string, v2 double",
    )
    return src, tgt.unionByName(extra)


def test_anomalies_equal_full_reconcile(spark):
    src, tgt = _frames(spark)
    bad, anomalies = bucket_reconcile(src, tgt, KEYS, CMP, n_buckets=64)
    assert bad  # 9 anomalous keys must dirty at least one bucket
    got = {(r["k1"], r["k2"], r["status"]) for r in anomalies.collect()}
    full = hash_reconcile(src, tgt, KEYS, CMP).filter(F.col("status") != "MATCH")
    want = {(r["k1"], r["k2"], r["status"]) for r in full.collect()}
    assert got == want
    assert len(want) == 3 + 2 + 4  # SRC_EXTRA + TGT_EXTRA + MISMATCH


def test_identical_tables_short_circuit(spark):
    src, _ = _frames(spark)
    tgt = src.select(*src.columns)
    bad, anomalies = bucket_reconcile(src, tgt, KEYS, CMP, n_buckets=64)
    assert bad == []
    assert anomalies.count() == 0
    summary = bucket_summary(src, tgt, KEYS, CMP, n_buckets=64)
    rows = summary.collect()
    assert rows and all(r["bucket_match"] for r in rows)
    assert sum(r["src_rows"] for r in rows) == 500


def test_digest_pass_is_one_narrow_exchange(spark):
    """The scale contract: the digest pass shuffles ≤ n_buckets aggregate
    rows, never the table — exactly one Exchange in the plan, and it is the
    groupBy(bucket) partial-aggregate exchange (no Join at all)."""
    src, _ = _frames(spark)
    plan = (
        bucket_digests(src, KEYS, CMP, n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_duplicate_rows_caught_by_row_count(spark):
    """An identical row duplicated an even number of times XOR-cancels, but
    the per-bucket row count still flags the bucket — the digest pass is
    MORE sensitive than the row-level reconcile, whose full-outer join
    classifies exact duplicate keys as MATCH."""
    src, _ = _frames(spark)
    dup = src.filter("k1 = 42")
    tgt = src.unionByName(dup).unionByName(dup)  # +2 identical copies
    bad, anomalies = bucket_reconcile(src, tgt, KEYS, CMP, n_buckets=64)
    assert bad  # count mismatch flags the bucket
    # row-level reconcile is blind to exact-duplicate keys (both full and
    # bucketed agree on that): anomalies stay empty, the summary does not
    assert anomalies.count() == 0
    summary = bucket_summary(src, tgt, KEYS, CMP, n_buckets=64)
    flagged = summary.filter(~F.col("bucket_match")).collect()
    assert len(flagged) == 1
    assert flagged[0]["tgt_rows"] == flagged[0]["src_rows"] + 2


def test_lake_bucket_reconcile_uses_table_layout(spark, tmp_path):
    """Layout-aligned variant: digests bucketed by the table's own
    expression, dirty-bucket rescan file-pruned through read(buckets=...)."""
    from data_migration_validator_spark.lake import LakeTable
    from data_migration_validator_spark.validation import lake_bucket_reconcile

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        [("repo", "string"), ("path", "string"), ("content", "string")],
        key_cols=["repo", "path"], num_buckets=8,
    )
    rows = [(f"r{i % 20}", f"p{i}", f"c{i}") for i in range(400)]
    t.append(spark.createDataFrame(rows, "repo string, path string, content string"))

    src_rows = [
        (r, p, "TAMPERED" if (r, p) == ("r3", "p3") else c) for r, p, c in rows
    ] + [("r99", "pX", "extra")]
    src = spark.createDataFrame(src_rows, "repo string, path string, content string")

    bad, anomalies = lake_bucket_reconcile(t, src)
    assert bad and len(bad) <= 2  # tampered repo r3's bucket + extra's bucket
    got = {(r["repo"], r["path"], r["status"]) for r in anomalies.collect()}
    assert got == {("r3", "p3", "MISMATCH"), ("r99", "pX", "SRC_EXTRA")}

    # clean case: empty anomalies, no dirty buckets
    bad2, anomalies2 = lake_bucket_reconcile(t, t.read())
    assert bad2 == [] and anomalies2.count() == 0

    # all of r3's keys share the storage bucket (bucket_source = repo), so
    # the dirty rescan touches at most 2 of the 8 buckets' files
    assert len(set(bad)) <= 2


def test_even_multiplicity_difference_is_detected(spark):
    """Regression for the XOR-fold blind spot: src holding row X twice vs
    tgt holding row Y twice (equal counts) cancelled every XOR fold
    deterministically and was declared clean.  The decimal-sum folds must
    flag the bucket."""
    from data_migration_validator_spark.validation.bucket_reconcile import (
        bucket_reconcile,
    )

    src = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "base")], "k long, v string"
    )
    tgt = spark.createDataFrame(
        [(1, "y"), (1, "y"), (2, "base")], "k long, v string"
    )
    bad, anomalies = bucket_reconcile(src, tgt, ["k"], ["v"], n_buckets=4)
    assert bad, "differing even-multiplicity bucket must be flagged"
    assert anomalies.count() > 0


def test_null_vs_empty_string_is_detected(spark):
    """The injective digest encoding must flag NULL-vs-'' differences the
    reference's lenient coalesce-to-'' encoding hashes identically."""
    from data_migration_validator_spark.validation.bucket_reconcile import (
        bucket_reconcile,
    )

    src = spark.createDataFrame([(1, ""), (2, "same")], "k long, v string")
    tgt = spark.createDataFrame([(1, None), (2, "same")], "k long, v string")
    bad, _ = bucket_reconcile(src, tgt, ["k"], ["v"], n_buckets=4)
    assert bad, "NULL-vs-empty-string bucket must be flagged"
