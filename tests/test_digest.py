"""JVM sha2 and Arrow pandas_udf sha256 must agree byte-for-byte."""

import hashlib

from pyspark.sql import functions as F

from data_migration_validator_spark.functions import (
    content_sha256,
    row_digest,
    row_digest_pandas,
)


def test_jvm_and_pandas_digests_agree(spark):
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, None, "x"), (3, "", "y")],
        "id int, a string, b string",
    )
    out = df.select(
        row_digest(["id", "a", "b"]).alias("jvm"),
        row_digest_pandas(["id", "a", "b"]).alias("pd"),
    ).collect()
    for r in out:
        assert r["jvm"] == r["pd"]


def test_content_sha256_matches_hashlib(spark):
    df = spark.createDataFrame([("hello world",), (None,)], "content string")
    rows = df.select(content_sha256("content").alias("h")).collect()
    assert rows[0]["h"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[1]["h"] == hashlib.sha256(b"").hexdigest()


def test_null_vs_empty_same_as_reference(spark):
    # reference normalizes NULL -> '' before hashing (databricks-extract.py:150)
    df = spark.createDataFrame([(None,), ("",)], "a string")
    rows = df.select(row_digest(["a"]).alias("h")).collect()
    assert rows[0]["h"] == rows[1]["h"]


def test_digest_is_codegen_friendly(spark, capsys):
    df = spark.range(10).select(F.col("id").cast("string").alias("a"))
    df.select(row_digest(["a"])).explain("formatted")
    plan = capsys.readouterr().out
    assert "codegen id" in plan  # '*' operators / [codegen id : N] = whole-stage codegen
