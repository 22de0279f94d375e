"""Plan-quality assertions: pushdown, pruning, shuffle budget. These
guard the properties that matter at 100 TB and that no row-level test
can see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.plans.inspect import (
    assert_max_exchanges, assert_pruned_schema, assert_pushed_filter,
    plan_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_filter_pushdown_reaches_scan(docs):
    q = docs.filter(F.col("lang") == "en").select("doc_id")
    assert_pushed_filter(q, "lang")


def test_column_pruning(docs):
    # a 2-column projection must not scan the text column
    q = docs.filter(F.col("doc_id") < 10).select("doc_id", "lang")
    assert_pruned_schema(q, "text")
    assert_pushed_filter(q, "doc_id")


def test_exact_dedup_plan_shape(docs):
    from lens_spark.operators.dedup import exact_dedup

    q = exact_dedup(docs, "doc_id", "text")
    # one shuffle (the groupBy on fingerprint), nothing else
    assert_max_exchanges(q, 1)
    s = plan_stats(q)
    assert s.python_stages == 0, "dedup must stay JVM-side"


def test_search_stays_jvm_side(docs):
    from lens_spark.operators.search import Query, search
    from lens_spark.schema import EXTRACTED

    ext = docs.sparkSession.createDataFrame(
        [("a", [("text", "hello world", None, 1)],
          "text/plain", "document", [], None)],
        schema=EXTRACTED,
    )
    q = search(ext, Query(required=["hello"]))
    assert plan_stats(q).python_stages == 0


def test_extract_pipeline_shuffle_budget(spark):
    from lens_spark.benchdata import derive_spans_sqlparity
    from lens_spark.pipeline import extract

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = derive_spans_sqlparity(docs.limit(50)).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    res = extract(spans)
    s = plan_stats(res.extracted)
    # The LOGICAL plan duplicates the scan→sniff→salt-exchange subtree
    # under each of the 4 payload branches (union fan-in); AQE dedupes the
    # identical exchanges into one shuffle at runtime (stage reuse), so
    # the budget here is on the logical shape: 4x salt exchange + html
    # window + html regather + final reassembly ≈ 12. A jump past 13
    # means an accidental NEW shuffle (join, distinct, repartition).
    assert s.exchanges <= 13, f"exchanges={s.exchanges}"
    # exactly 2 mapInPandas stages (html node table + pdf/image extract);
    # sniff appears once per branch subtree but is one runtime stage
    txt = __import__("lens_spark.plans.inspect",
                     fromlist=["formatted_plan"]).formatted_plan(
        res.extracted)
    import re

    assert len(re.findall(r"^\(\d+\) MapInPandas", txt, re.M)) == 2
    assert s.python_stages <= 8, f"python_stages={s.python_stages}"


def test_similarity_topk_uses_take_ordered(docs):
    from lens_spark.operators.similarity import cosine_topk

    emb = docs.sparkSession.read.parquet(f"{SF}/embeddings.parquet")
    q = cosine_topk(emb, "vec_id", "embedding", [0.1] * 64, k=5)
    from lens_spark.plans.inspect import formatted_plan

    assert "TakeOrderedAndProject" in formatted_plan(q), (
        "top-k should be a heap (TakeOrderedAndProject), not a full sort"
    )
