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
