"""Checkpoint / lineage / exact resume.

north_rule: "every partition writes lineage rows (input snapshot id,
partition id, row counts, extractor version) and metrics to a checkpoint
table enabling exact resume after failure."

Reference analogs:
- already-indexed guard / IsIndexed point probe (v2_util.go:23-25,
  engine/engine.go:160-169) → **left-anti join** against the output
  table's keys — set semantics, never per-row lookups (M4/E15).
- Reindex bypass (engine.go:124-126) → ``reindex=True`` skips the guard;
  the MERGE makes the rewrite last-write-wins (M5).

Resume contract: extraction is idempotent per doc_id. After a failure
mid-write, rerunning with ``filter_pending`` extracts only doc_ids absent
from the output table; the MERGE'd union equals a clean full run (no
dupes, no gaps) — tests/test_resume.py kills a run halfway and proves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT


def filter_pending(
    docs: DataFrame,
    done: DataFrame | None,
    reindex: bool = False,
    quarantined: DataFrame | None = None,
) -> DataFrame:
    """Drop documents already present in the output table (E15/M4).

    ``done``: the current output table (or None when it doesn't exist).
    ``quarantined``: the quarantine table; a doc whose spans ALL failed
    is never written to the output table, so without this anti-join it
    would be re-extracted on every increment — at 10^12 docs a
    persistent poison-doc population (corrupt PDFs) becomes a fixed
    per-increment tax. A quarantined doc that also has good spans IS in
    ``done``, so the plain distinct-doc_id anti-join here is exactly
    "quarantined with no good spans" after the ``done`` join — but ONLY
    when ``done`` and ``quarantined`` come from the same table
    generation. When ``done`` is None (fresh or rebuilt output table)
    the quarantine guard is skipped: a surviving quarantine table must
    not suppress partially-failed docs whose good spans now need
    re-extraction.
    ``reindex=True`` bypasses both guards (engine.go:124-126) — it is
    the retry override for poisoned docs."""
    if reindex:
        return docs
    out = docs
    if done is not None:
        out = out.join(done.select("doc_id"), "doc_id", "left_anti")
        if quarantined is not None:
            out = out.join(
                quarantined.select("doc_id").distinct(),
                "doc_id",
                "left_anti",
            )
    return out


def lineage_rows(
    extracted: DataFrame,
    input_snapshot_id: str,
    cfg: ExtractConfig = DEFAULT,
    status: str = "committed",
) -> DataFrame:
    """Per-partition lineage/metrics (schema.LINEAGE)."""
    return (
        extracted.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
        )
        .select(
            F.lit(input_snapshot_id).alias("input_snapshot_id"),
            "partition_id",
            "doc_count",
            "span_count",
            F.lit(cfg.extractor_version).alias("extractor_version"),
            F.lit(status).alias("status"),
            F.current_timestamp().alias("extracted_at"),
        )
    )


def quarantine_merge(quarantine_table, q: DataFrame) -> None:
    """Idempotent quarantine write: MERGE on doc_id:offset so a retried
    failure UPDATES its row (last error wins) instead of appending a
    duplicate every rerun/redelivery. Shared by the batch increment and
    the streaming foreachBatch so both write one schema."""
    quarantine_table.merge_upsert(
        q.withColumn(
            "qkey",
            F.concat_ws(
                ":", "doc_id",
                F.coalesce(F.col("offset"), F.lit(-1)).cast("string"),
            ),
        ),
        "qkey",
    )


def run_resumable(
    spark,
    docs: DataFrame,
    out_table,
    checkpoint_table,
    input_snapshot_id: str,
    cfg: ExtractConfig = DEFAULT,
    reindex: bool = False,
    quarantine_table=None,
):
    """One resumable extraction increment:

    pending = docs ⟕̸ out_table  →  extract  →  analyze (content/tokens)
    → MERGE into out_table → append lineage to checkpoint_table
    [→ append quarantine rows].

    The reference surfaces a failed magnify as the RPC error
    (v2_util.go:62-65); the batch analogue is the quarantine table — a
    bad span must be inspectable after the job, not lost. Pass
    ``quarantine_table`` (LensTable) to persist them; None preserves the
    write-nothing behavior.

    Write-time analysis: the stored table carries the ``content`` and
    ``tokens`` columns (``prepare_search_index``) so ``LensV2.search``
    hits the materialized-token fast path instead of re-analyzing the
    whole corpus per query — bleve analyzes at index time
    (engine/index.go:40-60); per-query re-analysis is linear in corpus
    size and the dominant cost at 10^9 docs.

    Returns the number of documents extracted in this increment."""
    from lens_spark.operators.search import prepare_search_index
    from lens_spark.pipeline import extract

    done = out_table.read(spark)
    quarantined = (
        quarantine_table.read(spark)
        if quarantine_table is not None else None
    )
    pending = filter_pending(
        docs, done, reindex=reindex, quarantined=quarantined
    )
    if pending.isEmpty():
        return 0
    res = extract(pending, cfg)
    # cache the pre-reassembly span rows: `extracted` AND `quarantine`
    # both derive from this one subtree, so caching it makes the whole
    # explode/dispatch/UDF extraction run ONCE for the increment
    # (ADVICE r2: the quarantine isEmpty + append each re-ran the full
    # extraction — ~2 extra passes per increment). The cache holds one
    # increment's spans (batch-sized, not corpus-sized) in
    # MEMORY_AND_DISK, released below.
    spans = res.spans_flat.cache()
    result = prepare_search_index(res.extracted).cache()
    n = result.count()
    if n:
        # n == 0 happens when every pending doc fully quarantined (a
        # doc whose spans ALL fail is never indexed; its quarantine rows
        # below make the NEXT increment skip it — retryable only via
        # reindex=True, the reference Reindex retry shape);
        # skip the empty MERGE + lineage so reruns don't churn snapshots
        out_table.merge_upsert(result, "doc_id")
        checkpoint_table.append(
            lineage_rows(result, input_snapshot_id, cfg)
        )
    if quarantine_table is not None:
        q = res.quarantine.withColumn(
            "input_snapshot_id", F.lit(input_snapshot_id)
        )
        if not q.isEmpty():  # reads the cached spans, not a re-extract
            quarantine_merge(quarantine_table, q)
    spans.unpersist()
    result.unpersist()
    return n
