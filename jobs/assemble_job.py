"""spark-submit entrypoint for final training-corpus ASSEMBLY — the
third stage of the product pipeline (extract_job → curate_job →
assemble_job): turn a curated document table into the mixture a trainer
actually loads.

    spark-submit --py-files lens_spark.zip jobs/assemble_job.py \
        <curated.parquet> <out_dir> \
        [--dsir-target target.parquet --dsir-k K [--dsir-dim D]] \
        [--group-col source --target-tokens N [--alpha A] [--upsample]] \
        [--chunk MAX[,OVERLAP]] \
        [--jsonl ROWS_PER_SHARD] \
        [--id-col doc_id] [--text-col text]

Stages (each optional, composed in this order — all are existing
driver-verified operators):

    DSIR selection   — keep the K docs most like --dsir-target under
                       hashed-n-gram importance weights with Gumbel
                       resampling (functions/dsir.py; Xie et al. 2023)
    mixture          — temperature-scaled per-group sampling at
                       --target-tokens (operators/mixing.py):
                       sample_mixture (rate ≤ 1) or, with --upsample,
                       upsample_mixture (fractional epochs > 1, adds an
                       ``epoch`` column)
    chunking         — split into ≤MAX-token chunks (operators/pack.py)
    export           — parquet always; with --jsonl also sharded
                       .jsonl.gz + MANIFEST.json (sources/export.py)

Prints one JSON line ``ASSEMBLE_OK {...}`` with input/output row and
token accounting.

The reference engine has no corpus-assembly tier (engine/engine.go
indexes documents as given) — training-data layer.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def run(
    spark: SparkSession,
    docs,
    out: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dsir_target=None,
    dsir_k: int = 0,
    dsir_dim: int = 512,
    group_col: str | None = None,
    target_tokens: int | None = None,
    alpha: float = 0.5,
    upsample: bool = False,
    chunk: tuple[int, int] | None = None,
    jsonl_shard_rows: int | None = None,
) -> dict:
    """Assemble ``docs`` into ``out`` and return the report dict (kept
    separate from main() so tests drive the exact job logic)."""
    from lens_spark.functions.text import ws_tokens

    report: dict = {"input_docs": docs.count()}
    cur = docs

    if dsir_target is not None and dsir_k > 0:
        from lens_spark.functions.dsir import (
            dsir_log_ratios, dsir_resample,
        )

        lr = dsir_log_ratios(dsir_target, cur, text_col, dim=dsir_dim)
        picked = dsir_resample(
            cur, lr, id_col=id_col, text_col=text_col,
            dim=dsir_dim, k=dsir_k,
        ).select(id_col)
        # selection table is ≤ k rows; equi-join back for full columns
        cur = cur.join(picked, on=id_col, how="inner")
        report["dsir_selected"] = cur.count()

    if group_col is not None and target_tokens is not None:
        from lens_spark.operators.mixing import (
            sample_mixture, upsample_mixture,
        )

        fn = upsample_mixture if upsample else sample_mixture
        cur = fn(cur, group_col, id_col, target_tokens, alpha=alpha)
        report["mixture_rows"] = cur.count()
        report["upsampled"] = upsample

    if chunk is not None:
        from lens_spark.operators.pack import chunk_documents

        max_tokens, overlap = chunk
        keep = [c for c in (group_col, "epoch") if c and c in cur.columns]
        extra = cur.select(id_col, *keep) if keep else None
        chunks = chunk_documents(
            cur, id_col, text_col, max_tokens=max_tokens, overlap=overlap
        )
        cur = (
            chunks.join(extra, on=id_col) if extra is not None else chunks
        )
        report["chunks"] = cur.count()

    out_text_col = "chunk_text" if chunk is not None else text_col
    stats = cur.agg(
        F.count("*").alias("rows"),
        F.sum(F.size(ws_tokens(F.col(out_text_col)))).alias("tokens"),
    ).collect()[0]
    report["output_rows"] = int(stats["rows"])
    report["output_tokens"] = int(stats["tokens"] or 0)

    cur.write.mode("overwrite").parquet(f"{out}/assembled")
    if jsonl_shard_rows is not None:
        from lens_spark.sources.export import export_jsonl

        export_jsonl(
            spark.read.parquet(f"{out}/assembled"),
            f"{out}/assembled_jsonl",
            rows_per_shard=jsonl_shard_rows,
        )
        report["jsonl"] = True
    return report


def _flag(name: str, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> None:
    args = [
        a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--")
        and not sys.argv[i - 1].lstrip("-").replace("-", "_") in (
            "dsir_target", "dsir_k", "dsir_dim", "group_col",
            "target_tokens", "alpha", "chunk", "jsonl", "id_col",
            "text_col",
        )
    ]
    src, out = args[0], args[1]
    chunk_arg = _flag("--chunk")
    chunk = None
    if chunk_arg is not None:
        parts = [int(x) for x in chunk_arg.split(",")]
        chunk = (parts[0], parts[1] if len(parts) > 1 else 0)
    spark = SparkSession.builder.appName("lens-assemble").getOrCreate()
    tt = _flag("--target-tokens")
    report = run(
        spark,
        spark.read.parquet(src),
        out,
        id_col=_flag("--id-col", "doc_id"),
        text_col=_flag("--text-col", "text"),
        dsir_target=(
            spark.read.parquet(dt)
            if (dt := _flag("--dsir-target")) is not None else None
        ),
        dsir_k=int(_flag("--dsir-k", "0")),
        dsir_dim=int(_flag("--dsir-dim", "512")),
        group_col=_flag("--group-col"),
        target_tokens=int(tt) if tt is not None else None,
        alpha=float(_flag("--alpha", "0.5")),
        upsample="--upsample" in sys.argv,
        chunk=chunk,
        jsonl_shard_rows=(
            int(js) if (js := _flag("--jsonl")) is not None else None
        ),
    )
    print("ASSEMBLE_OK " + json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
