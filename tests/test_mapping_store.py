"""Config-driven multi-pair validation + persisted summary/log/metrics
tables + report read-path queries."""

import os

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.validation import (
    TableMapping,
    failed_stages,
    latest_run_per_family,
    load_mappings_csv,
    make_column_metrics_table,
    make_log_table,
    make_summary_table,
    run_mappings,
    summary_conjunction,
    top_mismatched_columns,
)


@pytest.fixture()
def stores(spark, tmp_root):
    return (
        make_summary_table(spark, os.path.join(tmp_root, "summary")),
        make_log_table(spark, os.path.join(tmp_root, "log")),
        make_column_metrics_table(spark, os.path.join(tmp_root, "colmetrics")),
    )


def _tables(spark):
    """Three configured pairs: clean, corrupted, and one that errors."""
    base = spark.createDataFrame(
        [(i, f"n{i}", i * 10.0) for i in range(100)], "id long, name string, amt double"
    )
    corrupt = base.withColumn(
        "amt", F.when(F.col("id") % 7 == 0, F.col("amt") + 1).otherwise(F.col("amt"))
    )
    return {
        "src_a": base,
        "tgt_a": base,
        "src_b": base,
        "tgt_b": corrupt,
        "src_c": base,
        # tgt_c intentionally unresolvable
    }


def test_run_mappings_three_pairs_persists_per_pair_rows(spark, tmp_root, stores):
    summary_t, log_t, metrics_t = stores
    tables = _tables(spark)
    mappings = [
        TableMapping("fam_a", "src_a", "tgt_a", ["id"]),
        TableMapping("fam_b", "src_b", "tgt_b", ["id"]),
        TableMapping("fam_c", "src_c", "tgt_c", ["id"]),  # resolve error
        TableMapping("fam_off", "src_a", "tgt_a", ["id"], is_active=False),
    ]
    results = run_mappings(
        spark,
        mappings,
        resolve=lambda n: tables[n],
        run_id="run1",
        summary_table=summary_t,
        log_table=log_t,
        column_metrics_table=metrics_t,
    )
    assert set(results) == {"fam_a", "fam_b"}  # fam_c failed, fam_off inactive

    rows = {r["table_family"]: r for r in summary_t.read().collect()}
    assert set(rows) == {"fam_a", "fam_b", "fam_c"}
    assert rows["fam_a"]["validation_status"] == "SUCCESS"
    assert rows["fam_b"]["validation_status"] == "FAILED"
    assert rows["fam_b"]["mismatches"] > 0
    assert rows["fam_c"]["validation_status"] == "FAILED"

    # per-stage log rows; the failed pair recorded the exception text
    failed = failed_stages(log_t.read()).collect()
    assert any(r["table_family"] == "fam_c" and "tgt_c" in r["message"] for r in failed)

    # per-column metrics persisted Spark-side; read-path top-k finds amt
    top = top_mismatched_columns(metrics_t.read(), k=5, run_id="run1").collect()
    assert top and top[0]["column_name"] == "amt" and top[0]["table_family"] == "fam_b"


def test_rerun_upserts_not_duplicates(spark, tmp_root, stores):
    summary_t, log_t, _ = stores
    tables = _tables(spark)
    mappings = [TableMapping("fam_a", "src_a", "tgt_a", ["id"])]
    for _ in range(2):  # same run_id twice → MERGE overwrites, no dup rows
        run_mappings(
            spark, mappings, resolve=lambda n: tables[n], run_id="r7",
            summary_table=summary_t, log_table=log_t,
        )
    assert summary_t.read().count() == 1
    assert log_t.read().filter("stage = 'validate'").count() == 1


def test_summary_conjunction_null_is_failed(spark, tmp_root, stores):
    summary_t, _, _ = stores
    from data_migration_validator_spark.validation.store import persist_summary

    persist_summary(
        summary_t, "r1", "famx",
        {"validation_status": "SUCCESS", "row_count_status": "SUCCESS"},
    )
    out = summary_conjunction(summary_t.read()).collect()[0]
    # most statuses NULL → conjunction FAILED even though the run wrote SUCCESS
    assert out["final_validation_status"] == "FAILED"


def test_latest_run_per_family(spark, tmp_root, stores):
    summary_t, _, _ = stores
    from data_migration_validator_spark.validation.store import persist_summary

    persist_summary(summary_t, "r1", "fam", {"validation_status": "FAILED"},
                    finished_at=100.0)
    persist_summary(summary_t, "r2", "fam", {"validation_status": "SUCCESS"},
                    finished_at=200.0)
    latest = latest_run_per_family(summary_t.read()).collect()
    assert len(latest) == 1 and latest[0]["run_id"] == "r2"


def test_resolve_connections_broadcast_join(spark):
    from data_migration_validator_spark.validation import resolve_connections

    mapping = spark.createDataFrame(
        [("fam1", "netezza_prod", "dbx"), ("fam2", "oracle_dw", "dbx"),
         ("fam3", "unknown_conn", "dbx")],
        "table_family string, src_connection_name string, tgt_connection_name string",
    )
    config = spark.createDataFrame(
        [("netezza_prod", "netezza", '{"url":"x"}', True),
         ("oracle_dw", "oracle", '{"url":"y"}', False),
         ("dbx", "databricks", "{}", False)],
        "connection_name string, warehouse string, jdbc_options string, cast_to_string boolean",
    )
    out = {r["table_family"]: r for r in resolve_connections(mapping, config).collect()}
    assert out["fam1"]["src_warehouse"] == "netezza" and out["fam1"]["src_cast_to_string"]
    assert out["fam1"]["tgt_warehouse"] == "databricks"
    assert out["fam2"]["src_jdbc_options"] == '{"url":"y"}'
    assert out["fam3"]["src_warehouse"] is None  # left outer keeps the row
    plan = resolve_connections(mapping, config)
    assert "BroadcastHashJoin" in plan._jdf.queryExecution().executedPlan().toString()


def test_column_union_and_first_seen_union(spark):
    from data_migration_validator_spark.operators import column_union, first_seen_union

    assert column_union(["a", "b", "c"], ["b", "d", "a", "e"]) == [
        "a", "b", "c", "d", "e"
    ]
    a = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    b = spark.createDataFrame([("k2", 20), ("k3", 30)], "k string, v int")
    out = {r["k"]: r["v"] for r in first_seen_union(a, b, "k", ["v"]).collect()}
    assert out == {"k1": 1, "k2": 2, "k3": 30}  # a-side wins on overlap


def test_load_mappings_csv_roundtrip(spark, tmp_root):
    p = os.path.join(tmp_root, "mappings.csv")
    with open(p, "w") as f:
        f.write(
            "table_family,src_table,tgt_table,key_cols,compare_cols,filter,"
            "date_col,quick_validation,is_active\n"
            "fam1,s1,t1,id|region,,amt > 0,,false,true\n"
            'fam2,s2,t2,id,"a|b",,ts,true,false\n'
        )
    ms = load_mappings_csv(spark, p)
    assert len(ms) == 2
    assert ms[0].key_cols == ["id", "region"] and ms[0].filter == "amt > 0"
    assert ms[0].compare_cols is None and ms[0].is_active
    assert ms[1].compare_cols == ["a", "b"] and ms[1].quick and not ms[1].is_active


def test_run_mappings_persists_anomaly_windowed_pk_tables(spark, tmp_root):
    """VERDICT r2 ask #4: mismatch/extras rows, windowed buckets and PK
    checks land in durable LakeTables and read back after the run."""
    from data_migration_validator_spark.validation import (
        anomaly_browser,
        make_anomaly_table,
        make_pk_table,
        make_windowed_table,
    )

    src = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 2), float(i)) for i in range(20)]
        + [(100, "2024-01-01", 100.0)],
        "id long, d string, amt double",
    )
    tgt = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 2), float(i) if i % 7 else float(i) + 1)
         for i in range(20)]
        + [(200, "2024-01-02", 200.0)],
        "id long, d string, amt double",
    )
    anomaly_t = make_anomaly_table(spark, os.path.join(tmp_root, "anom"))
    windowed_t = make_windowed_table(spark, os.path.join(tmp_root, "win"))
    pk_t = make_pk_table(spark, os.path.join(tmp_root, "pk"))

    mappings = [TableMapping("fam_x", "s", "t", ["id"], date_col="d")]
    for _ in range(2):  # rerun same run_id → MERGE upsert, no duplicates
        run_mappings(
            spark,
            mappings,
            resolve=lambda n: src if n == "s" else tgt,
            run_id="runA",
            anomaly_table=anomaly_t,
            windowed_table=windowed_t,
            pk_table=pk_t,
        )

    anoms = anomaly_t.read().collect()
    by_status = {}
    for r in anoms:
        by_status.setdefault(r["status"], []).append(r)
    # ids 0,7,14 are corrupted (i%7==0 → amt+1); the other 17 match
    assert len(by_status["MISMATCH_SRC"]) == 3
    assert len(by_status["MISMATCH_TGT"]) == 3
    assert len(by_status["SRC_EXTRA"]) == 1
    assert len(by_status["TGT_EXTRA"]) == 1
    extra = by_status["SRC_EXTRA"][0]
    assert '"id":100' in extra["key_json"].replace(" ", "")
    assert extra["row"]["amt"] == "100.0"
    # browser read-path over the persisted table
    assert anomaly_browser(anomaly_t.read(), status="SRC_EXTRA").count() == 1

    wins = {str(r["bucket_date"]): r for r in windowed_t.read().collect()}
    assert wins["2024-01-01"]["src_extras"] == 1
    assert wins["2024-01-02"]["tgt_extras"] == 1
    assert sum(r["mismatched_rows"] for r in wins.values()) == 3

    pks = {r["side"]: r for r in pk_t.read().collect()}
    assert pks["src"]["total_count"] == 21 and pks["src"]["pk_violations"] == 0
    assert pks["tgt"]["pk_violations"] == 0


def test_run_mappings_persists_profiles(spark, tmp_root):
    """profile_table: per-side HLL profile snapshots persisted per pair,
    feeding the cross-run profile_drift read-path."""
    from data_migration_validator_spark.validation import (
        make_profile_table,
        profile_drift,
    )

    day1 = spark.createDataFrame(
        [(i, float(i)) for i in range(30)], "id long, amt double"
    )
    day2 = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "id long, amt double"
    )
    prof_t = make_profile_table(spark, os.path.join(tmp_root, "prof"))
    mappings = [TableMapping("fam_p", "s", "t", ["id"])]
    for run, frame in (("day1", day1), ("day2", day2)):
        run_mappings(
            spark,
            mappings,
            resolve=lambda n, f=frame: f,
            run_id=run,
            profile_table=prof_t,
        )
    stored = prof_t.read()
    assert stored.count() == 2 * 2 * 2  # 2 runs x 2 sides x 2 columns
    drift = profile_drift(stored, "day1", "day2", side="tgt").collect()
    got = {(r["column"], r["metric"]) for r in drift}
    assert ("id", "n_rows") in got and ("amt", "max_num") in got
