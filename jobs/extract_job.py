"""spark-submit entrypoint for the extraction pipeline (north_rule
deployment shape: ``spark-submit --py-files lens_spark.zip
jobs/extract_job.py <in_table_or_gen:N> <out_dir>``).

If the input argument is ``gen:N`` a deterministic synthetic corpus of N
docs (seed 42) is generated; otherwise it is read as a parquet path with
the authoritative documents schema.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    src, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("lens-extract").getOrCreate()

    from lens_spark.corpus import docs_to_spark, gen_docs
    from lens_spark.pipeline import extract

    if src.startswith("gen:"):
        docs = docs_to_spark(spark, gen_docs(int(src[4:]), seed=42))
    else:
        docs = spark.read.parquet(src)

    res = extract(docs)
    res.extracted.write.mode("overwrite").parquet(f"{out}/extracted")
    res.quarantine.write.mode("overwrite").parquet(f"{out}/quarantine")
    n = spark.read.parquet(f"{out}/extracted").count()
    q = spark.read.parquet(f"{out}/quarantine").count()
    print(f"EXTRACT_OK docs={n} quarantined_spans={q}")
    spark.stop()


if __name__ == "__main__":
    main()
