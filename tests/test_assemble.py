"""assemble_job: DSIR selection → mixture → chunk → export composed
end-to-end (jobs/assemble_job.py)."""

from __future__ import annotations

import glob
import json

import pytest


@pytest.fixture()
def docs(spark):
    rows = []
    for i in range(60):
        rows.append((i, "en", "the quick brown fox " * 12))
    for i in range(60, 75):
        rows.append((i, "de", "der schnelle braune fuchs " * 6))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_full_composition(spark, docs, tmp_path):
    from jobs.assemble_job import run

    target = docs.filter("lang = 'de'").select("doc_id", "text")
    out = str(tmp_path / "asm")
    rep = run(
        spark, docs, out,
        dsir_target=target, dsir_k=30, dsir_dim=64,
        group_col="lang", target_tokens=600,
        chunk=(16, 4),
        jsonl_shard_rows=40,
    )
    assert rep["input_docs"] == 75
    assert rep["dsir_selected"] == 30
    assert rep["mixture_rows"] <= 30
    assert rep["chunks"] == rep["output_rows"] > rep["mixture_rows"]
    assert rep["output_tokens"] > 0 and rep["jsonl"] is True
    # parquet + jsonl outputs exist and agree on row count
    n_parquet = spark.read.parquet(f"{out}/assembled").count()
    man = json.load(open(f"{out}/assembled_jsonl/MANIFEST.json"))
    assert man["rows"] == n_parquet == rep["output_rows"]
    assert glob.glob(f"{out}/assembled_jsonl/data/*.gz")
    # chunk output carries the group column through the join-back
    cols = spark.read.parquet(f"{out}/assembled").columns
    assert "lang" in cols and "chunk_text" in cols


def test_upsample_branch(spark, docs, tmp_path):
    from jobs.assemble_job import run

    out = str(tmp_path / "asm2")
    rep = run(
        spark, docs, out,
        group_col="lang", target_tokens=50000, upsample=True,
    )
    # target far above corpus: every group upsamples past one epoch
    assert rep["mixture_rows"] > rep["input_docs"]
    assert "epoch" in spark.read.parquet(f"{out}/assembled").columns


def test_plain_passthrough(spark, docs, tmp_path):
    from jobs.assemble_job import run

    out = str(tmp_path / "asm3")
    rep = run(spark, docs, out)
    assert rep["output_rows"] == rep["input_docs"] == 75
    assert "jsonl" not in rep


_BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "every single morning before the sun rises over the green hills "
    "while the birds are singing their favourite songs in the trees"
)


def test_dedup_job_incremental_loop(spark, tmp_path):
    """Two increments through jobs/dedup_job.run: the second increment's
    copies of first-increment content classify corpus_dup against the
    maintained index; re-running increment 1 is idempotent (all
    corpus_dup, index unchanged)."""
    from jobs.dedup_job import run

    idx = str(tmp_path / "index")
    inc1 = spark.createDataFrame(
        [
            (1, _BASE),
            (2, "completely different cooking text with pasta basil"),
            (3, _BASE),
        ],
        "doc_id long, text string",
    )
    r1 = run(spark, inc1, idx, str(tmp_path / "o1"), minhash=True)
    assert r1["unique"] == 2 and r1["increment_dup"] == 1
    assert r1["corpus_dup"] == 0 and r1["index_added"] == 2
    assert r1["neardup_candidates"] == 0  # index was empty at probe

    inc2 = spark.createDataFrame(
        [
            (10, _BASE),
            (11, "brand new content in the second batch of documents"),
            (12, _BASE + " with a small appended tail"),
        ],
        "doc_id long, text string",
    )
    r2 = run(spark, inc2, idx, str(tmp_path / "o2"), minhash=True)
    assert r2["corpus_dup"] == 1 and r2["unique"] == 2
    assert r2["index_added"] == 2
    # near-dup probe caught the tailed copy against stored doc 1
    cand = {
        (r["new_id"], r["corpus_id"])
        for r in spark.read.parquet(
            str(tmp_path / "o2/neardup_candidates")
        ).collect()
    }
    assert (12, 1) in cand
    # idempotency: re-run increment 1 — everything already stored
    r3 = run(spark, inc1, idx, str(tmp_path / "o3"), minhash=True)
    assert r3["corpus_dup"] == 3 and r3["unique"] == 0
    assert r3["index_added"] == 0
