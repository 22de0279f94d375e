"""spark-submit entrypoint for the training-data curation pipeline
(same deployment shape as jobs/extract_job.py — the downstream half of
the product: extract first, then curate the extracted text into
training-ready data):

    spark-submit --py-files lens_spark.zip jobs/curate_job.py \
        <docs.parquet> <out_dir> [--exactsubstr-k K] \
        [--chunk MAX[,OVERLAP]] [--classifier-min P] \
        [--lexicon-words w1,w2] [--lexicon-phrases "p one,p two"] \
        [--benchmark eval.parquet] \
        [--fuzzy-benchmark eval.parquet [--fuzzy-threshold T]] \
        [--lm-ppl-max X [--lm-train ref.parquet]] \
        [--jsonl ROWS_PER_SHARD] \
        [--id-col doc_id] [--text-col text]

Input: any parquet with an id column and a text column (the synthetic
``documents`` table, or an exported ``extract_job`` output). Stages:

    curate()  — C4 → Gopher [→ linear quality classifier with
                --classifier-min] [→ CCNet bigram-LM perplexity filter
                with --lm-ppl-max, trained on --lm-train if given else
                self-trained] [→ test-set decontamination against
                --benchmark, an (id, text) parquet of eval docs]
                [→ fuzzy MinHash decontamination against
                --fuzzy-benchmark at --fuzzy-threshold (default 0.5)]
                → PII → exact dedup → minhash near-dup keep
                [→ SemDeDup semantic dedup with --semantic-tau, over
                an (id, embedding) parquet given as --embeddings]
                [→ ExactSubstr substring deletion with --exactsubstr-k]
    chunking  — optional: split curated docs into ≤MAX-token chunks
                with OVERLAP shared tokens (--chunk MAX[,OVERLAP])

Output (plain parquet — curation output feeds a trainer's data loader,
not the search store):

    <out_dir>/curated/       — curated docs (or chunks with --chunk)
    <out_dir>/annotated/     — every input doc + per-stage keep flags
                               (the no-silent-drops audit trail)
    <out_dir>/curated_jsonl/ — with --jsonl N: sharded .jsonl.gz (≤N
                               rows/shard) + MANIFEST.json, the
                               trainer-loader handoff format

Prints one JSON line ``CURATE_OK {...}`` with the one-pass
curation_report stage-attrition accounting.

The reference engine has no curation tier (it indexes every document it
is given, engine/engine.go) — this job is part of the training-data
layer this repo adds.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def run(
    spark: SparkSession,
    docs,
    out: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    exactsubstr_k: int | None = None,
    chunk: tuple[int, int] | None = None,
    classifier_min: float | None = None,
    lexicon_words: list[str] | None = None,
    lexicon_phrases: list[str] | None = None,
    benchmark=None,
    fuzzy_benchmark=None,
    fuzzy_threshold: float = 0.5,
    lm_ppl_max: float | None = None,
    lm_train=None,
    embeddings=None,
    embeddings_id_col: str | None = None,
    semantic_tau: float | None = None,
    jsonl_shard_rows: int | None = None,
) -> dict:
    """Curate ``docs`` into ``out`` and return the report dict.

    Kept separate from main() so tests drive the exact job logic
    in-process (the spark-submit shell is argument parsing only)."""
    from lens_spark.curate import curate, curation_report

    res = curate(
        docs, id_col=id_col, text_col=text_col,
        exactsubstr_k=exactsubstr_k,
        classifier_min=classifier_min,
        lexicon_words=lexicon_words,
        lexicon_phrases=lexicon_phrases,
        benchmark=benchmark,
        fuzzy_benchmark=fuzzy_benchmark,
        fuzzy_threshold=fuzzy_threshold,
        lm_ppl_max=lm_ppl_max,
        lm_train=lm_train,
        embeddings=(
            embeddings.withColumnRenamed(
                embeddings_id_col or id_col, id_col)
            if embeddings is not None else None
        ),
        semantic_tau=semantic_tau,
    )
    final = res.curated
    if chunk is not None:
        from lens_spark.operators.pack import chunk_documents

        max_tokens, overlap = chunk
        final = chunk_documents(
            final, id_col, text_col,
            max_tokens=max_tokens, overlap=overlap,
        )
    final.write.mode("overwrite").parquet(f"{out}/curated")
    if jsonl_shard_rows is not None:
        from lens_spark.sources.export import export_jsonl

        export_jsonl(
            spark.read.parquet(f"{out}/curated"),
            f"{out}/curated_jsonl",
            rows_per_shard=jsonl_shard_rows,
        )
    res.annotated.drop("c4", "pii").write.mode("overwrite").parquet(
        f"{out}/annotated"
    )
    report = curation_report(res.annotated)
    report["output_rows"] = spark.read.parquet(f"{out}/curated").count()
    report["chunked"] = chunk is not None
    report["exactsubstr_k"] = exactsubstr_k
    return report


def _flag(name: str, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> None:
    args = [
        a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--")
        and not sys.argv[i - 1].startswith("--")
    ]
    src, out = args[0], args[1]
    k = _flag("--exactsubstr-k")
    chunk_arg = _flag("--chunk")
    chunk = None
    if chunk_arg is not None:
        parts = [int(x) for x in chunk_arg.split(",")]
        chunk = (parts[0], parts[1] if len(parts) > 1 else 0)
    spark = SparkSession.builder.appName("lens-curate").getOrCreate()
    report = run(
        spark,
        spark.read.parquet(src),
        out,
        id_col=_flag("--id-col", "doc_id"),
        text_col=_flag("--text-col", "text"),
        exactsubstr_k=int(k) if k is not None else None,
        chunk=chunk,
        classifier_min=(
            float(cm) if (cm := _flag("--classifier-min")) is not None
            else None
        ),
        lexicon_words=(
            lw.split(",")
            if (lw := _flag("--lexicon-words")) is not None else None
        ),
        lexicon_phrases=(
            lp.split(",")
            if (lp := _flag("--lexicon-phrases")) is not None else None
        ),
        benchmark=(
            spark.read.parquet(bp)
            if (bp := _flag("--benchmark")) is not None else None
        ),
        fuzzy_benchmark=(
            spark.read.parquet(fb)
            if (fb := _flag("--fuzzy-benchmark")) is not None else None
        ),
        fuzzy_threshold=float(_flag("--fuzzy-threshold", "0.5")),
        lm_ppl_max=(
            float(pm) if (pm := _flag("--lm-ppl-max")) is not None
            else None
        ),
        lm_train=(
            spark.read.parquet(lt)
            if (lt := _flag("--lm-train")) is not None else None
        ),
        embeddings=(
            spark.read.parquet(ep)
            if (ep := _flag("--embeddings")) is not None else None
        ),
        embeddings_id_col=_flag("--embeddings-id"),
        semantic_tau=(
            float(st) if (st := _flag("--semantic-tau")) is not None
            else None
        ),
        jsonl_shard_rows=(
            int(js) if (js := _flag("--jsonl")) is not None else None
        ),
    )
    print("CURATE_OK " + json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
