"""PII scrub + deterministic sampling operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_migration_validator_spark.operators.sampling import (
    deterministic_sample,
    sample_exact_k,
    stratified_sample,
)
from data_migration_validator_spark.operators.scrub import (
    scrub_report,
    scrub_text,
)

# ------------------------------------------------------------------ #
# scrub
# ------------------------------------------------------------------ #


def test_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail me at a.b+c@ex-ample.co.uk or root@h.io thanks"),
        (2, "server 10.0.0.1 talked to 192.168.300.7"),  # 300 still matches shape
        (3, "key deadbeefdeadbeefdeadbeefdeadbeef1234 short beef"),
        (4, "clean text, nothing to see"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in scrub_text(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 0
    assert "<EMAIL_REDACTED>" in out[1]["scrubbed_text"]
    assert "@" not in out[1]["scrubbed_text"].replace("<EMAIL_REDACTED>", "")
    assert out[2]["n_ipv4"] == 2
    assert out[2]["scrubbed_text"].count("<IPV4_REDACTED>") == 2
    assert out[3]["n_hexsecret"] == 1
    assert "deadbeefdead" not in out[3]["scrubbed_text"]
    assert "beef" in out[3]["scrubbed_text"]  # short hex survives
    assert out[4]["scrubbed_text"] == rows[3][1]
    assert out[5]["scrubbed_text"] is None and out[5]["n_email"] is None


def test_scrub_report_sha_matches_python(spark):
    txt = "ping admin@corp.example from 8.8.8.8"
    df = spark.createDataFrame([(7, txt)], "doc_id int, text string")
    row = scrub_report(df).first()
    expect = "ping <EMAIL_REDACTED> from <IPV4_REDACTED>"
    assert row["scrub_sha"] == hashlib.sha256(expect.encode()).hexdigest()
    assert row["scrub_len"] == len(expect)
    assert row["n_email"] == 1 and row["n_ipv4"] == 1 and row["n_hexsecret"] == 0


def test_scrub_is_narrow_plan(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("x@y.zz").alias("text")
    )
    plan = scrub_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection


# ------------------------------------------------------------------ #
# sampling
# ------------------------------------------------------------------ #


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod("id", F.lit(3)) == 0, "en")
        .when(F.pmod("id", F.lit(3)) == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_deterministic_sample_stable_and_sized(spark):
    df = _docs(spark)
    s1 = {r["doc_id"] for r in deterministic_sample(df, ["doc_id"], 0.2).collect()}
    # same rows after a repartition (membership is content-derived)
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(7), ["doc_id"], 0.2).collect()
    }
    assert s1 == s2
    assert 0.15 * 2000 < len(s1) < 0.25 * 2000
    # membership matches the python-side md5 rule exactly
    import hashlib as h

    for d in list(s1)[:20]:
        assert h.md5(str(d).encode()).hexdigest()[:8] < "33333333"


def test_sample_membership_stable_under_growth(spark):
    small = _docs(spark, 500)
    big = _docs(spark, 2000)
    s_small = {
        r["doc_id"] for r in deterministic_sample(small, ["doc_id"], 0.3).collect()
    }
    s_big = {
        r["doc_id"] for r in deterministic_sample(big, ["doc_id"], 0.3).collect()
    }
    assert s_small == {d for d in s_big if d < 500}


def test_stratified_sample_per_stratum(spark):
    df = _docs(spark, 3000)
    out = stratified_sample(df, ["doc_id"], "lang", {"en": 0.5, "de": 0.1})
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 400 < by_lang["en"] < 600  # ~500 of 1000
    assert 50 < by_lang["de"] < 160  # ~100 of 1000
    assert "fr" not in by_lang  # default fraction 0


def test_sample_exact_k(spark):
    df = _docs(spark, 1000)
    out = sample_exact_k(df, ["doc_id"], 37)
    rows = out.collect()
    assert len(rows) == 37
    # deterministic: same k rows on rerun with different layout
    again = {r["doc_id"] for r in sample_exact_k(df.repartition(5), ["doc_id"], 37).collect()}
    assert {r["doc_id"] for r in rows} == again
    # and it is the true k smallest md5 values
    import hashlib as h

    all_ids = sorted(range(1000), key=lambda d: h.md5(str(d).encode()).hexdigest())
    assert {r["doc_id"] for r in rows} == set(all_ids[:37])


def test_sample_fraction_bounds(spark):
    df = _docs(spark, 10)
    assert deterministic_sample(df, ["doc_id"], 0.0).count() == 0
    assert deterministic_sample(df, ["doc_id"], 1.0).count() == 10
    import pytest as _pt

    with _pt.raises(ValueError):
        deterministic_sample(df, ["doc_id"], 1.5)
    with _pt.raises(ValueError):
        sample_exact_k(df, ["doc_id"], -1)


def test_full_sample_keeps_ffffffff_prefix_rows(spark):
    # a key whose md5 prefix is exactly 'ffffffff' must survive fraction=1.0
    # (strict '<' against a clamped 'ffffffff' threshold used to drop it)
    from data_migration_validator_spark.operators.sampling import _threshold_hex

    assert _threshold_hex(1.0) > "ffffffff"
    df = spark.createDataFrame([("ffffffff-prefix-stand-in",)], "k string")
    assert deterministic_sample(df, ["k"], 1.0).count() == 1
    out = stratified_sample(
        _docs(spark, 100), ["doc_id"], "lang", {"en": 1.0}, default_fraction=1.0
    )
    assert out.count() == 100


def test_sample_exact_k_preserves_user_hash_column(spark):
    # a pre-existing column that collides with the sampler's work column
    # must come through untouched
    df = _docs(spark, 100).withColumn("__sample_h", F.lit("keep-me"))
    out = sample_exact_k(df, ["doc_id"], 5)
    assert "__sample_h" in out.columns
    assert {r["__sample_h"] for r in out.collect()} == {"keep-me"}


def test_mixture_plan_solve():
    from data_migration_validator_spark.operators.sampling import mixture_plan

    counts = {"code": 1000, "web": 10_000, "books": 400}
    # target 50/30/20: books binds (400/0.2 = 2000 = T)
    plan = mixture_plan(counts, {"code": 0.5, "web": 0.3, "books": 0.2})
    assert plan["books"] == 1.0
    assert abs(plan["code"] - (0.5 * 2000 / 1000)) < 1e-12
    assert abs(plan["web"] - (0.3 * 2000 / 10_000)) < 1e-12
    # cap: max_total halves every rate
    capped = mixture_plan(
        counts, {"code": 0.5, "web": 0.3, "books": 0.2}, max_total=1000
    )
    assert abs(capped["books"] - 0.5) < 1e-12
    assert abs(capped["code"] - 0.5) < 1e-12
    # a targeted domain with zero rows -> infeasible exact mix -> empty
    assert mixture_plan({"code": 10}, {"code": 0.5, "missing": 0.5}) == {}
    # weights normalize (2:1 == 0.5:0.25 scaled)
    a = mixture_plan(counts, {"code": 2.0, "web": 1.0})
    b = mixture_plan(counts, {"code": 0.5, "web": 0.25})
    assert a == b


def test_mixture_sample_hits_target_mix(spark):
    from data_migration_validator_spark.operators.sampling import (
        mixture_sample,
    )

    # skewed corpus: 2000 web, 500 code, 100 books
    df = (
        spark.range(2600)
        .select(
            F.col("id"),
            F.when(F.col("id") < 2000, F.lit("web"))
            .when(F.col("id") < 2500, F.lit("code"))
            .otherwise(F.lit("books"))
            .alias("domain"),
        )
    )
    out = mixture_sample(
        df, ["id"], "domain", {"web": 0.3, "code": 0.5, "books": 0.2}
    )
    got = {r["domain"]: r["n"] for r in
           out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # books binds: T = 100/0.2 = 500 → expect ~150 web / ~250 code / 100 books
    assert got["books"] == 100  # rate 1.0 keeps every row
    assert abs(got["web"] - 150) <= 40   # Bernoulli tolerance
    assert abs(got["code"] - 250) <= 45
    # untargeted rows never leak in
    out2 = mixture_sample(df, ["id"], "domain", {"books": 1.0})
    assert {r["domain"] for r in out2.select("domain").distinct().collect()} == {"books"}
    # deterministic: identical rerun, identical membership
    ids1 = {r["id"] for r in out.select("id").collect()}
    ids2 = {r["id"] for r in
            mixture_sample(df.repartition(7), ["id"], "domain",
                           {"web": 0.3, "code": 0.5, "books": 0.2})
            .select("id").collect()}
    assert ids1 == ids2
