"""spark-submit entrypoint for INCREMENTAL deduplication — the ingest
loop's dedup stage at 10^12-doc scale, where re-deduping the corpus for
every increment is impossible. The stored index does the work:

    spark-submit --py-files lens_spark.zip jobs/dedup_job.py \
        <increment.parquet> <index_dir> <out_dir> \
        [--minhash] [--id-col doc_id] [--text-col text]

State (LensTable stores under <index_dir>, snapshot-committed like the
extract store — a killed run resumes from the last visible snapshot):

    digests/  — (fingerprint, rep_id): exact_dedup's output maintained
                across increments (merge_upsert keyed on fingerprint;
                hash-bucketed, so a probe/update rewrites only buckets
                containing the increment's digests)
    bands/    — with --minhash: (id, band_no, bucket) banded-LSH rows
                (minhash_band_rows), appended per increment

Per increment:

    1. classify every new doc against digests/ —
       exact_dedup_increment: corpus_dup / increment_dup / unique
    2. [--minhash] probe bands/ with the increment's band rows —
       minhash_increment: (new_id, corpus_id) near-dup candidates
    3. write <out_dir>/annotated (all new docs + status + dup_of) and
       <out_dir>/neardup_candidates
    4. maintain the index: upsert the increment's first-seen digests
       (rep_id = the increment doc that introduced the content);
       append the unique docs' band rows

Prints one JSON line ``DEDUP_OK {...}`` with the classification counts.
Re-running the same increment classifies every doc corpus_dup and adds
nothing — idempotent by construction (the digests are already stored).

The reference engine deduplicates only by doc key (IsIndexed,
engine/engine.go:129-137) — content-level incremental dedup is part of
the training-data tier this repo adds.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def run(
    spark: SparkSession,
    increment,
    index_dir: str,
    out: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash: bool = False,
) -> dict:
    """Classify ``increment`` against the stored index under
    ``index_dir``, write outputs under ``out``, maintain the index.
    Kept separate from main() so tests drive the exact job logic."""
    from lens_spark.operators.dedup import (
        exact_dedup_increment, minhash_band_rows, minhash_increment,
    )
    from lens_spark.sources.tables import LensTable

    digests = LensTable(f"{index_dir}/digests")
    stored = digests.read(spark)
    if stored is None:
        stored = spark.createDataFrame(
            [], "fingerprint string, rep_id long"
        )

    annotated = exact_dedup_increment(
        increment, stored, id_col, text_col
    ).localCheckpoint()  # pin: consumed 3x (write, counts, index update)
    annotated.write.mode("overwrite").parquet(f"{out}/annotated")

    counts = {
        r["status"]: r["n"]
        for r in annotated.groupBy("status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    report = {
        "input_docs": sum(counts.values()),
        "corpus_dup": counts.get("corpus_dup", 0),
        "increment_dup": counts.get("increment_dup", 0),
        "unique": counts.get("unique", 0),
    }

    # index maintenance: one row per first-seen fingerprint — the
    # increment doc that introduced the content becomes its rep
    fresh = (
        annotated.filter(F.col("status") == "unique")
        .select("fingerprint", F.col("id").alias("rep_id"))
    )
    digests.merge_upsert(fresh, key="fingerprint")
    report["index_added"] = fresh.count()
    report["index_snapshot"] = digests.current_snapshot()

    if minhash:
        bands = LensTable(f"{index_dir}/bands")
        stored_bands = bands.read(spark)
        if stored_bands is None:
            stored_bands = spark.createDataFrame(
                [], "id long, band_no int, bucket string"
            )
        cand = minhash_increment(
            increment, stored_bands, id_col, text_col
        )
        cand.write.mode("overwrite").parquet(
            f"{out}/neardup_candidates"
        )
        report["neardup_candidates"] = spark.read.parquet(
            f"{out}/neardup_candidates"
        ).count()
        # append only the content-unique docs' band rows — dup content
        # would inflate every future probe with redundant candidates
        uniq_ids = annotated.filter(
            F.col("status") == "unique"
        ).select(F.col("id"))
        new_bands = minhash_band_rows(
            increment.join(
                uniq_ids, increment[id_col] == uniq_ids["id"], "left_semi"
            ),
            id_col, text_col,
        )
        bands.append(new_bands)
        report["bands_snapshot"] = bands.current_snapshot()
    return report


def _flag(name: str, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main() -> None:
    args = [
        a for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--")
        and not sys.argv[i - 1] in ("--id-col", "--text-col")
    ]
    src, index_dir, out = args[0], args[1], args[2]
    spark = SparkSession.builder.appName("lens-dedup").getOrCreate()
    report = run(
        spark,
        spark.read.parquet(src),
        index_dir,
        out,
        id_col=_flag("--id-col", "doc_id"),
        text_col=_flag("--text-col", "text"),
        minhash="--minhash" in sys.argv,
    )
    print("DEDUP_OK " + json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
