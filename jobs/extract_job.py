"""spark-submit entrypoint for the extraction pipeline (north_rule
deployment shape: ``spark-submit --py-files lens_spark.zip
jobs/extract_job.py <in_table_or_gen:N> <out_dir>``).

If the input argument is ``gen:N`` a deterministic synthetic corpus of N
docs (seed 42) is generated; otherwise it is read as a parquet path with
the authoritative documents schema.

The job is RESUMABLE (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"): output lands in a snapshot-committed
LensTable store under ``<out_dir>`` —

- ``extracted/``  — MERGE-committed table (content/tokens materialized
  for search, one atomic snapshot per increment)
- ``checkpoint/`` — per-partition lineage rows (input snapshot id,
  partition id, doc/span counts, extractor version)
- ``quarantine/`` — failed spans with their error strings

Re-running the same command after a mid-write failure extracts ONLY the
doc_ids missing from the output table (left-anti resume guard) and the
merged result equals a clean full run — tests/test_resume.py proves the
no-dupes/no-gaps property by killing a run halfway.

Pass ``--plain`` for the round-2 behavior (bare parquet dirs, no
store/resume) — useful for one-shot exports.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plain = "--plain" in sys.argv
    src, out = args[0], args[1]
    spark = SparkSession.builder.appName("lens-extract").getOrCreate()

    from lens_spark.corpus import docs_to_spark, gen_docs

    if src.startswith("gen:"):
        docs = docs_to_spark(spark, gen_docs(int(src[4:]), seed=42))
    else:
        docs = spark.read.parquet(src)

    if plain:
        from lens_spark.pipeline import extract

        res = extract(docs)
        res.extracted.write.mode("overwrite").parquet(f"{out}/extracted")
        res.quarantine.write.mode("overwrite").parquet(f"{out}/quarantine")
        n = spark.read.parquet(f"{out}/extracted").count()
        q = spark.read.parquet(f"{out}/quarantine").count()
        print(f"EXTRACT_OK docs={n} quarantined_spans={q}")
        spark.stop()
        return

    from lens_spark.operators.resume import run_resumable
    from lens_spark.sources.tables import LensTable

    out_t = LensTable(f"{out}/extracted")
    ckpt = LensTable(f"{out}/checkpoint")
    quar = LensTable(f"{out}/quarantine")
    n_new = run_resumable(
        spark, docs, out_t, ckpt, input_snapshot_id=src,
        quarantine_table=quar,
    )
    n = out_t.read(spark).count()
    qdf = quar.read(spark)
    q = qdf.count() if qdf is not None else 0
    print(f"EXTRACT_OK docs={n} quarantined_spans={q} "
          f"new={n_new} snapshot={out_t.current_snapshot()}")
    spark.stop()


if __name__ == "__main__":
    main()
