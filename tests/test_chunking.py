"""Chunking operator: boundaries, overlap, tail, empty docs, no-UDF plan."""

import pyspark.sql.functions as F

from hinbox_spark.operators.chunking import chunk_documents


def test_chunk_boundaries_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame([(1, text), (2, ""), (3, "solo")],
                               "doc_id long, text string")
    rows = sorted(
        (r["doc_id"], r["chunk_start"], r["n_chunk_words"], r["chunk_text"])
        for r in chunk_documents(df, chunk_words=10, stride_words=8).collect()
    )
    # doc 1: starts 0,8,16,24 — tail chunks shrink; doc 2 empty → none
    assert [(d, s, n) for d, s, n, _ in rows] == [
        (1, 0, 10), (1, 8, 10), (1, 16, 9), (1, 24, 1), (3, 0, 1),
    ]
    assert rows[0][3].split(" ") == [f"w{i}" for i in range(10)]
    assert rows[1][3].split(" ") == [f"w{i}" for i in range(8, 18)]
    assert rows[3][3] == "w24"
    assert rows[4][3] == "solo"


def test_chunk_overlap_reconstructs_document(spark):
    """Every word appears in at least one chunk; consecutive chunks overlap
    by chunk_words - stride_words."""
    text = " ".join(f"t{i}" for i in range(57))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    chunks = {
        r["chunk_start"]: r["chunk_text"].split(" ")
        for r in chunk_documents(df, chunk_words=20, stride_words=15).collect()
    }
    seen = set()
    for words in chunks.values():
        seen.update(words)
    assert seen == {f"t{i}" for i in range(57)}
    assert chunks[0][-5:] == chunks[15][:5]  # 5-word overlap


def test_chunk_plan_has_no_python(spark):
    """The chunk plan stays inside codegen: no BatchEvalPython /
    ArrowEvalPython / mapInPandas nodes."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
