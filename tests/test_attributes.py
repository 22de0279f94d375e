"""Dolma-style attribute sidecars (lens_spark/attributes.py): tagger
write/upsert through the LensTable layer, merge-back, mix rules."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.attributes import (
    apply_mix,
    merge_attributes,
    read_attributes,
    write_attributes,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {'x' * (i % 5)}") for i in range(30)],
        "doc_id long, text string",
    )


def test_write_read_roundtrip_prefixes(spark, docs, tmp_path):
    store = str(tmp_path / "attrs_q")
    tagged = docs.select(
        "doc_id", F.length("text").alias("n_chars"),
        (F.length("text") > 6).alias("long"),
    )
    snap = write_attributes(
        tagged, store, "doc_id", ["n_chars", "long"], "quality"
    )
    assert snap == "snap-0"
    back = read_attributes(spark, store)
    assert sorted(back.columns) == [
        "doc_id", "quality__long", "quality__n_chars"
    ]
    assert back.count() == 30


def test_retag_upserts_last_write_wins(spark, docs, tmp_path):
    store = str(tmp_path / "attrs_v")
    first = docs.select("doc_id", F.lit(1).alias("version"))
    write_attributes(first, store, "doc_id", ["version"], "tag")
    # re-tag a subset with a new value: those rows update, others stay
    second = docs.filter("doc_id < 10").select(
        "doc_id", F.lit(2).alias("version"))
    write_attributes(second, store, "doc_id", ["version"], "tag")
    back = read_attributes(spark, store)
    vals = {r.doc_id: r.tag__version for r in back.collect()}
    assert back.count() == 30
    assert all(v == 2 for k, v in vals.items() if k < 10)
    assert all(v == 1 for k, v in vals.items() if k >= 10)


def test_merge_and_mix(spark, docs, tmp_path):
    s1 = str(tmp_path / "a1")
    s2 = str(tmp_path / "a2")
    write_attributes(
        docs.select("doc_id", (F.col("doc_id") % 2 == 0).alias("even")),
        s1, "doc_id", ["even"], "parity",
    )
    # second tagger covers only half the docs -> left-join NULLs
    write_attributes(
        docs.filter("doc_id < 15").select(
            "doc_id", F.lit(0.9).alias("score")),
        s2, "doc_id", ["score"], "clf",
    )
    merged = merge_attributes(
        docs,
        [read_attributes(spark, s1), read_attributes(spark, s2)],
        "doc_id",
    )
    assert merged.count() == 30  # left join keeps untagged docs
    kept = apply_mix(
        merged, "parity__even and clf__score >= 0.5"
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [i for i in range(15) if i % 2 == 0]


def test_merge_collision_rejected(spark, docs):
    a = docs.select("doc_id", F.lit(1).alias("t__x"))
    b = docs.select("doc_id", F.lit(2).alias("t__x"))
    with pytest.raises(ValueError, match="collision"):
        merge_attributes(docs, [a, b], "doc_id")


def test_bad_tagger_name_rejected(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="bad tagger"):
        write_attributes(
            docs.select("doc_id", "text"), str(tmp_path / "x"),
            "doc_id", ["text"], "a__b",
        )


def test_merge_plan_has_no_cartesian(spark, docs, tmp_path):
    store = str(tmp_path / "p")
    write_attributes(
        docs.select("doc_id", F.lit(1).alias("v")), store,
        "doc_id", ["v"], "t",
    )
    merged = merge_attributes(
        docs, [read_attributes(spark, store)], "doc_id")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
