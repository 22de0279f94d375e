"""Span explosion + skew-defusing salted repartition + size-bucketing.

north_rule: "Documents are explode-repartitioned by a salted hash of
doc_id to defuse giant-document skew, processed in size-bucketed batches."

Design notes (scale):
- The unit of distributed work is the *span*, not the document: after
  ``posexplode`` a 100k-span document is already 100k rows, and the salted
  repartition spreads them across ``cfg.salt_buckets`` distinct hash
  targets instead of letting every span of a hot doc_id land on one task.
- Payload decode (base64→binary) and mime sniffing run BELOW the exchange
  — i.e. before the shuffle write — so the sniff UDF executes exactly once
  per span even though several branch DataFrames consume the exploded
  relation afterwards (the exchange is computed once and reused:
  `ReusedExchange` in the physical plan).
- Size buckets: a span's payload length maps to a bucket id; we sort
  within partitions by bucket so each Arrow batch entering ``mapInPandas``
  holds similarly-sized payloads (the byte-bounded re-batching inside the
  UDF is the hard guarantee; this sort makes it effective).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.functions.mime import mime_parse, mime_family, sniff_col


def explode_spans(docs: DataFrame, cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """documents(doc_id, spans[]) → one row per span, salted + sniffed.

    Output columns: doc_id, offset, kind (input hint), text (raw payload
    string), media_ref, payload (binary), mime, parsed (charset-stripped),
    family, salt, size_bucket.
    """
    # posexplode_outer: docs with empty span arrays produce ONE sentinel
    # row (null span) which flows to reassembly as a vacuous success —
    # this keeps the whole pipeline join-free (a join back to the input
    # table just to restore empty docs would be an extra 10^12-row
    # shuffle). Docs whose spans ALL quarantine produce no output row,
    # matching the reference: a failed magnify is never indexed
    # (v2_util.go:62-65,94).
    base_cols = ["doc_id"]
    if "display_name" in docs.columns:
        base_cols.append("display_name")
    sp = docs.select(
        *base_cols,
        F.posexplode_outer("spans").alias("pos", "span"),
    ).select(
        *base_cols,
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    if "display_name" not in sp.columns:
        sp = sp.withColumn("display_name", F.lit(None).cast("string"))

    is_textual = F.col("kind").isin("text", "html")
    payload = (
        F.when(F.col("kind") == "media", F.lit(None).cast("binary"))
        .when(is_textual, F.encode(F.col("text"), "UTF-8"))
        # binary kinds are stored base64; invalid base64 → NULL → quarantine
        .otherwise(F.try_to_binary(F.col("text"), F.lit("base64")))
    )

    sp = sp.withColumn("payload", payload)
    # sniff once, below the exchange (reference v2_util.go:42)
    sp = sp.withColumn(
        "mime",
        F.when(F.col("payload").isNull(), F.lit(None)).otherwise(
            sniff_col(F.col("payload"))
        ),
    )
    sp = sp.withColumn("parsed", mime_parse(F.col("mime")))
    sp = sp.withColumn("family", mime_family(F.col("mime")))

    bounds = list(cfg.size_bucket_bounds)
    size = F.coalesce(F.length("payload"), F.lit(0))
    bucket = F.lit(len(bounds))
    for i, b in enumerate(reversed(bounds)):
        bucket = F.when(size <= b, F.lit(len(bounds) - 1 - i)).otherwise(bucket)
    sp = sp.withColumn("size_bucket", bucket.cast("int"))

    sp = sp.withColumn(
        "salt",
        F.pmod(F.xxhash64("doc_id", "offset"), F.lit(cfg.salt_buckets)),
    )
    keys = [F.col("doc_id"), F.col("salt")]
    # The stages above this exchange are Python-CPU-bound (PDF parse, OCR,
    # HTML parse), so partition count must track CORES, not bytes — AQE's
    # byte-based coalescing would shrink a few-MB shuffle to one partition
    # and serialize the whole UDF stage (measured 5x slowdown). Explicit
    # count = 2x total cores keeps every core busy with small task skew.
    n = cfg.num_partitions or 2 * spark_cores(docs)
    return sp.repartition(n, *keys).sortWithinPartitions("size_bucket")


def spark_cores(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def explode_spans_lean(docs: DataFrame,
                       cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """Minimal-column span explosion for the single-pass pipeline
    (operators/extract.py ``run_span_extract``).

    Same explode/salt/size-order semantics as :func:`explode_spans`, but
    the exchange carries ONLY what the span UDF needs — doc_id,
    display_name, offset, kind, media_ref, payload — about half the
    bytes of the full relation (the raw ``text`` column is dropped once
    ``payload`` is derived from it, and sniff outputs move into the UDF
    where they are computed once instead of per branch). Salt and size
    order are expressions, not materialized columns, so they never cross
    the exchange either.
    """
    base_cols = ["doc_id"]
    if "display_name" in docs.columns:
        base_cols.append("display_name")
    sp = docs.select(
        *base_cols,
        F.posexplode_outer("spans").alias("pos", "span"),
    ).select(
        *base_cols,
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    if "display_name" not in sp.columns:
        sp = sp.withColumn("display_name", F.lit(None).cast("string"))

    is_textual = F.col("kind").isin("text", "html")
    payload = (
        F.when(F.col("kind") == "media", F.lit(None).cast("binary"))
        .when(is_textual, F.encode(F.col("text"), "UTF-8"))
        # binary kinds are stored base64; invalid base64 → NULL → quarantine
        .otherwise(F.try_to_binary(F.col("text"), F.lit("base64")))
    )
    sp = sp.select(
        "doc_id", "display_name", "offset", "kind", "media_ref",
        payload.alias("payload"),
    )
    # same skew-defusing layout as explode_spans: partition count tracks
    # CORES (the stage above is Python-CPU-bound), salt spreads hot docs.
    n = cfg.num_partitions or 2 * spark_cores(docs)
    salt = F.pmod(F.xxhash64("doc_id", "offset"), F.lit(cfg.salt_buckets))
    return sp.repartition(n, F.col("doc_id"), salt).sortWithinPartitions(
        F.coalesce(F.length("payload"), F.lit(0))
    )
