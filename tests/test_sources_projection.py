"""Sources (S2/S15, JDBC planning S3-S8) and projections (P1-P4, P6)."""

import os

import pytest
from pyspark.sql import functions as F

from data_migration_validator_spark.operators.projection import (
    MISSING_TGT,
    cast_all_to_string,
    exclude_metadata_columns,
    mapped_projection,
    null_safe_string_projection,
    suffix_projection,
)
from data_migration_validator_spark.sources import (
    csv_config_source,
    jdbc_reader_options,
    jdbc_subquery,
    orc_path_scan,
    parquet_scan,
    range_partition_options,
    recover_hive_partitions,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", None), (3, None, 7.0)],
        "id int, name string, score double",
    )


def test_parquet_scan_pushdown(spark, tmp_path):
    src = spark.range(100).withColumn("v", F.col("id") * 2)
    src.write.parquet(str(tmp_path / "t"))
    df = parquet_scan(spark, str(tmp_path / "t"), columns=["id"], predicate="id < 10")
    assert df.columns == ["id"]
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), LessThan(id,10)]" in plan


def test_orc_partition_recovery(spark, tmp_path):
    base = str(tmp_path / "orc")
    src = spark.range(20).withColumn("dt", (F.col("id") % 2).cast("string"))
    src.write.partitionBy("dt").orc(base)
    paths = [
        os.path.join(base, d) for d in sorted(os.listdir(base)) if d.startswith("dt=")
    ]
    df = orc_path_scan(spark, paths, partition_cols={"dt": "int"})
    got = {r["dt"] for r in df.select("dt").distinct().collect()}
    assert got == {0, 1}
    # native recovery via basePath agrees
    df2 = orc_path_scan(spark, paths, base_path=base)
    assert df2.count() == 20 and "dt" in df2.columns


def test_csv_config_source(spark, tmp_path):
    p = tmp_path / "cfg.csv"
    p.write_text('a,b\n1,"x,\ny"\n2,z\n')
    df = csv_config_source(spark, str(p))
    rows = {r["a"]: r["b"] for r in df.collect()}
    assert rows[1] == "x,\ny" and rows[2] == "z"


def test_jdbc_planning():
    q = jdbc_subquery("db.t", ["a", "b"], "a > 5")
    assert q == "(SELECT a, b FROM db.t WHERE a > 5) a"
    assert jdbc_reader_options("oracle")["numPartitions"] == 100
    assert jdbc_reader_options("hive")["fetchSize"] == 1_000_000
    opts = range_partition_options(-100, 200, "pk_hash", 5)
    assert opts == {
        "partitionColumn": "pk_hash",
        "lowerBound": "-100",
        "upperBound": "200",
        "numPartitions": "5",
    }
    # null-boundary guard (empty remote table) → single partition
    assert range_partition_options(None, None, "pk_hash") == {"numPartitions": 1}


def test_mapped_projection_sentinel(people):
    out = mapped_projection(
        people, ["id", "full_name", "ghost"], {"full_name": "name"},
        sentinel=MISSING_TGT,
    )
    assert out.columns == ["id", "full_name", "ghost"]
    r = {x["id"]: x for x in out.collect()}
    assert r[1]["full_name"] == "a"
    assert r[1]["ghost"] == MISSING_TGT


def test_suffix_and_string_projections(people):
    s = suffix_projection(people, ["id"], "_src")
    assert s.columns == ["id", "name_src", "score_src"]
    c = cast_all_to_string(people)
    assert all(t == "string" for _, t in c.dtypes)
    n = null_safe_string_projection(people)
    assert n.columns == sorted(people.columns)
    row = {x["id"]: x for x in n.collect()}
    assert row["3"]["name"] == ""  # null → ''


def test_exclude_metadata_columns(people):
    df = people.withColumn("run_timestamp__mmp", F.lit("x"))
    assert exclude_metadata_columns(df).columns == people.columns
