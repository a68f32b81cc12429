"""Document chunking: window geometry, full coverage, narrow plan."""

import pytest

from data_migration_validator_spark.operators.chunking import chunk_documents


def _docs(spark):
    rows = [
        (1, "a" * 100),
        (2, "b" * 50),     # exactly one window
        (3, "c" * 51),     # one char over: two chunks
        (4, ""),           # empty: dropped by default
        (5, None),         # null: dropped by default
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_geometry(spark):
    out = chunk_documents(_docs(spark), size=50, overlap=10)
    got = {
        (r["doc_id"], r["chunk_index"]): (r["chunk_start"], r["chunk_len"])
        for r in out.collect()
    }
    # stride 40: doc 1 (len 100) → starts 0, 40, 80
    assert got[(1, 0)] == (0, 50)
    assert got[(1, 1)] == (40, 50)
    assert got[(1, 2)] == (80, 20)
    assert (1, 3) not in got
    assert got[(2, 0)] == (0, 50) and (2, 1) not in got
    assert got[(3, 0)] == (0, 50) and got[(3, 1)] == (40, 11)
    assert all(k[0] not in (4, 5) for k in got)


def test_full_coverage_reconstruction(spark):
    """Dropping each chunk's first `overlap` chars (except chunk 0) and
    concatenating must reproduce the document exactly."""
    text = "".join(chr(97 + i % 26) for i in range(337))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, size=64, overlap=16).collect(),
        key=lambda r: r["chunk_index"],
    )
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][16:] for r in rows[1:]
    )
    assert rebuilt == text
    # every chunk except the last is full-size
    assert all(r["chunk_len"] == 64 for r in rows[:-1])


def test_keep_empty_and_null(spark):
    out = chunk_documents(_docs(spark), size=50, overlap=0, keep_empty=True)
    got = {r["doc_id"]: (r["chunk_text"], r["chunk_len"])
           for r in out.filter("doc_id IN (4, 5)").collect()}
    assert got[4] == ("", 0)
    assert got[5] == ("", 0)  # NULL text normalized to ''


def test_plan_is_narrow(spark):
    out = chunk_documents(_docs(spark), size=50, overlap=10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan  # zero shuffles: row-local operator
    assert "Generate" in plan  # the posexplode


def test_bad_params(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=-1)
