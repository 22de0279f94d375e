"""spark-submit entrypoint for crawl ingestion (the step BEFORE
extract_job: WARC archives → the authoritative documents table).

    spark-submit --py-files lens_spark.zip jobs/ingest_job.py \
        <warc_dir_or_gen:N> <out_dir> [--agent NAME] [--no-robots] \
        [--since PRIOR_CDX_DIR]

Pipeline (all one logical plan per output):

- parse every ``*.warc`` / ``*.warc.gz`` under ``<warc_dir>``
  (sources/warc.py: task-per-file, byte-bounded Arrow batches,
  quarantine rows resync at the next gzip member)
- write the CDX capture index (``cdx/`` parquet, sorted by SURT key so
  lookups partition-prune) — built as a projection FUSED into the
  parse scan
- honor robots.txt captures found INSIDE the crawl (``--agent``,
  default ``*``): response URLs a robots group disallows are dropped
  (``--no-robots`` skips the step)
- adapt 200-status responses into ``documents(doc_id, spans)``
  (pure-Catalyst ``warc_to_documents``) and MERGE into a
  snapshot-committed LensTable at ``<out_dir>/documents`` keyed on
  doc_id — re-ingesting an archive upserts instead of duplicating
- invalid records land in ``<out_dir>/quarantine`` parquet

- ``--since <prior_cdx_dir>`` makes the ingest INCREMENTAL: the new
  crawl's captures are diffed against the prior run's CDX
  (sources/warc.py ``cdx_diff``) and only ``added``/``changed`` URLs
  proceed to the documents MERGE — at crawl scale the unchanged mass
  is most of the crawl, and skipping it is what keeps re-ingestion
  O(delta), not O(corpus). The skip is metered
  (``unchanged_skipped=``), never silent.

``gen:N`` synthesizes the deterministic fixture crawl (N files, seed
13) into a temp dir first — the smoke-test path.

Prints one line:
``INGEST_OK files=F records=R docs=D robots_blocked=B quarantined=Q
unchanged_skipped=U snapshot=S``
"""
from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(
    spark,
    src: str,
    out: str,
    agent: str = "*",
    use_robots: bool = True,
    since: str | None = None,
) -> dict:
    from lens_spark.functions.robots import robots_filter, robots_rules
    from lens_spark.sources.tables import LensTable
    from lens_spark.sources.warc import (
        cdx_diff, cdx_index, read_warc, surt_key, warc_to_documents,
    )

    records = read_warc(spark, src)
    # the parse is consumed by several outputs — pin it once (the
    # dedup.py localCheckpoint trade: re-parsing every branch would
    # re-run the gzip walk per output)
    records = records.localCheckpoint(eager=False)

    n_files = records.select("warc_file").distinct().count()
    n_records = records.count()
    n_quar = records.filter(F.col("error").isNotNull()).count()

    cdx = cdx_index(records).sortWithinPartitions("surt")
    cdx.write.mode("overwrite").parquet(f"{out}/cdx")

    records.filter(F.col("error").isNotNull()).write.mode(
        "overwrite"
    ).parquet(f"{out}/quarantine")

    ok = records.filter(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("error").isNull()
    )
    robots_blocked = 0
    if use_robots:
        robots_src = records.filter(
            (F.col("record_type") == "response")
            & F.col("target_uri").endswith("/robots.txt")
            & F.col("error").isNull()
        )
        rules = robots_rules(robots_src, "target_uri", "payload", agent)
        before = ok.count()
        ok = robots_filter(ok, rules, "target_uri", "record_id")
        robots_blocked = before - ok.count()

    unchanged_skipped = 0
    if since:
        # incremental re-crawl: diff the surviving captures against the
        # prior crawl's CDX; only added/changed URLs re-enter the MERGE.
        # The delta key table is data-dependent (tiny on a calm recrawl,
        # huge on a site rewrite) — AQE decides the join strategy, the
        # decontam hit-table rule (no forced broadcast).
        old_cdx = spark.read.parquet(since)
        delta_keys = cdx_diff(old_cdx, cdx_index(ok)).filter(
            F.col("status").isin("added", "changed")
        ).select("surt")
        keyed = ok.withColumn("__surt", surt_key("target_uri"))
        before = keyed.count()
        ok = keyed.join(
            delta_keys, keyed["__surt"] == delta_keys["surt"],
            "left_semi",
        ).drop("__surt")
        unchanged_skipped = before - ok.count()

    docs = warc_to_documents(ok)
    table = LensTable(f"{out}/documents")
    snap = table.merge_upsert(docs, "doc_id")
    # an all-unchanged --since recrawl into a fresh store merges an
    # empty delta: the table may not exist yet
    stored = table.read(spark)
    return {
        "files": n_files,
        "records": n_records,
        "docs": 0 if stored is None else stored.count(),
        "robots_blocked": robots_blocked,
        "quarantined": n_quar,
        "unchanged_skipped": unchanged_skipped,
        "snapshot": snap,
    }


def main() -> None:
    # index-based parse (ADVICE r5, low): the old value-based removal
    # dropped any positional that happened to EQUAL a flag's value
    argv = sys.argv[1:]
    args: list[str] = []
    use_robots = True
    agent = "*"
    since = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--no-robots":
            use_robots = False
            i += 1
        elif a == "--agent":
            agent = argv[i + 1]
            i += 2
        elif a == "--since":
            since = argv[i + 1]
            i += 2
        else:
            args.append(a)
            i += 1
    src, out = args[0], args[1]
    spark = SparkSession.builder.appName("lens-ingest").getOrCreate()

    if src.startswith("gen:"):
        from lens_spark.sources.warc import gen_warc

        tmp = tempfile.mkdtemp(prefix="lens_warc_gen_")
        files, _ = gen_warc(int(src[4:]), 24, 13)
        for name, data in files:
            with open(os.path.join(tmp, name), "wb") as f:
                f.write(data)
        src = tmp

    r = run(spark, src, out, agent=agent, use_robots=use_robots,
            since=since)
    print(
        "INGEST_OK files={files} records={records} docs={docs} "
        "robots_blocked={robots_blocked} quarantined={quarantined} "
        "unchanged_skipped={unchanged_skipped} "
        "snapshot={snapshot}".format(**r)
    )
    spark.stop()


if __name__ == "__main__":
    main()
