"""Declarative DQ rule suite: counted violations vs hand-computed truth,
null semantics, and the one-aggregation-pass plan shape."""

import pyspark.sql.functions as F

from data_migration_validator_spark.validation.quality import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    run_checks,
    satisfies,
    unique,
)


def _df(spark):
    rows = [
        # id, code, qty, tag
        (1, "A", 10.0, "x1"),
        (2, "B", 55.0, "x2"),     # qty out of range
        (3, None, 5.0, "x3"),     # null code
        (3, "A", 7.0, "zz"),      # dup id, tag fails regex
        (None, "C", 1.0, None),   # null id + code outside set + null tag
        (None, "C", 1.0, None),   # exact dup of the row above
    ]
    return spark.createDataFrame(
        rows, "id int, code string, qty double, tag string"
    )


def test_rule_counts_and_null_semantics(spark):
    df = _df(spark)
    rep = run_checks(
        df,
        [
            not_null("id"),
            in_set("code", ["A", "B"]),
            in_range("qty", 0, 50),
            matches("tag", r"^x\d$"),
            satisfies("qty IS NULL OR qty >= 0", "qty_non_negative"),
            unique("id"),
            unique("id", "code"),
        ],
    ).collect()
    got = {r["rule"]: (r["violations"], r["total"], r["status"]) for r in rep}
    assert got["not_null(id)"] == (2, 6, "FAIL")
    # null code and the two 'C's all fail (nulls fail domain rules)
    assert got["in_set(code)"] == (3, 6, "FAIL")
    assert got["in_range(qty)"] == (1, 6, "FAIL")
    # zz fails; the two NULL tags fail too
    assert got["matches(tag)"] == (3, 6, "FAIL")
    assert got["qty_non_negative"] == (0, 6, "PASS")
    # ids: 1,2,3,3,NULL,NULL → 4 distinct structs (NULL is a group), 2 surplus
    assert got["unique(id)"] == (2, 6, "FAIL")
    # (id,code): the only duplicated combo is (NULL,'C') ×2 → 1 surplus
    assert got["unique(id,code)"] == (1, 6, "FAIL")
    # report preserves rule order
    assert [r["rule"] for r in rep][:2] == ["not_null(id)", "in_set(code)"]


def test_foreign_key_null_exempt_and_orphans(spark):
    facts = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "c"), (None, "d")], "fk int, v string"
    )
    dims = spark.createDataFrame([(1,), (2,), (2,)], "pk int")
    rep = run_checks(facts, [foreign_key(["fk"], dims, ["pk"])]).collect()[0]
    # 9 is an orphan; the NULL key row is exempt (SQL FK semantics)
    assert (rep["violations"], rep["total"], rep["status"]) == (1, 4, "FAIL")


def test_row_local_rules_compile_to_one_scan(spark):
    """All row-local + unique rules must run as ONE aggregation pass:
    a single scan of the input in the physical plan, however many rules."""
    df = _df(spark)
    seen = []
    orig = type(df).agg

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        seen.append(out._jdf.queryExecution().executedPlan().toString())
        return out

    type(df).agg = spy
    try:
        run_checks(
            df,
            [not_null("id"), in_set("code", ["A"]), in_range("qty", 0, 50),
             unique("id"), unique("id", "code")],
        )
    finally:
        type(df).agg = orig
    assert len(seen) == 1  # one agg call for the whole row-local suite
    plan = seen[0]
    assert plan.count("Scan ") == 1, plan


def test_all_pass_report(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id int, code string")
    rep = run_checks(df, [not_null("id"), unique("id")])
    assert [r["status"] for r in rep.collect()] == ["PASS", "PASS"]
    assert rep.schema["violations"].dataType.simpleString() == "bigint"


def test_dq_and_profile_persistence_roundtrip(spark, tmp_path):
    """persist_dq / persist_profile: side-scoped rerun replacement — src
    then tgt keeps both; a rerun of one side replaces only that side."""
    from data_migration_validator_spark.validation.profile import (
        profile_columns,
    )
    from data_migration_validator_spark.validation.store import (
        make_dq_table,
        make_profile_table,
        persist_dq,
        persist_profile,
    )

    df = spark.createDataFrame([(1, "A"), (2, None)], "id int, code string")
    rep = run_checks(df, [not_null("id"), not_null("code")])
    dq = make_dq_table(spark, str(tmp_path / "dq"))
    persist_dq(dq, "r1", "fam", "src", rep)
    persist_dq(dq, "r1", "fam", "tgt", rep)
    back = dq.read().filter("run_id = 'r1'")
    assert back.count() == 4  # 2 rules x 2 sides
    assert {r["side"] for r in back.collect()} == {"src", "tgt"}

    # rerun src with fewer rules: src shrinks to 1, tgt untouched
    persist_dq(dq, "r1", "fam", "src", run_checks(df, [not_null("id")]))
    sides = {(r["side"], r["rule"]) for r in dq.read().collect()}
    assert sides == {
        ("src", "not_null(id)"),
        ("tgt", "not_null(id)"),
        ("tgt", "not_null(code)"),
    }

    prof = make_profile_table(spark, str(tmp_path / "prof"))
    persist_profile(prof, "r1", "fam", "src", profile_columns(df))
    persist_profile(prof, "r1", "fam", "tgt", profile_columns(df))
    got = prof.read()
    assert got.count() == 4  # 2 columns x 2 sides
    row = got.filter("side = 'src' AND column = 'code'").collect()[0]
    assert (row["n_nulls"], row["min_str"]) == (1, "A")


def test_dq_failures_and_profile_drift_readpath(spark, tmp_path):
    """Read-path over the persisted tables: dq_failures filters/orders,
    profile_drift diffs two runs' snapshots without rescanning data."""
    from data_migration_validator_spark.validation.profile import (
        profile_columns,
    )
    from data_migration_validator_spark.validation.report import (
        dq_failures,
        profile_drift,
    )
    from data_migration_validator_spark.validation.store import (
        make_dq_table,
        make_profile_table,
        persist_dq,
        persist_profile,
    )

    dq = make_dq_table(spark, str(tmp_path / "dq"))
    bad = spark.createDataFrame([(None, "A"), (None, "B")], "id int, c string")
    persist_dq(dq, "r1", "fam", "tgt", run_checks(bad, [not_null("id"), not_null("c")]))
    fails = dq_failures(dq.read(), run_id="r1").collect()
    assert [r["rule"] for r in fails] == ["not_null(id)"]
    assert fails[0]["violations"] == 2

    prof = make_profile_table(spark, str(tmp_path / "prof"))
    day1 = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id int, x double")
    day2 = spark.createDataFrame([(1, 5.0), (2, 7.0), (3, 99.0)], "id int, x double")
    persist_profile(prof, "r1", "fam", "tgt", profile_columns(day1, exact_distinct=True))
    persist_profile(prof, "r2", "fam", "tgt", profile_columns(day2, exact_distinct=True))
    drift = profile_drift(prof.read(), "r1", "r2").collect()
    got = {(r["column"], r["metric"]): (r["value_a"], r["value_b"]) for r in drift}
    assert got[("x", "max_num")] == ("7.0", "99.0")
    assert got[("id", "n_rows")] == ("2", "3")
    assert ("x", "min_num") not in got  # unchanged metrics not reported
