"""End-to-end extraction pipeline.

    read documents → [resume anti-join] → posexplode + salt-repartition
    → sniff (once, below the exchange) → branch dispatch
    → {media: columns-only | text: columns-only | html: block-table
       sub-pipeline | pdf/image/other: Arrow mapInPandas}
    → union → ordered reassembly (+ doc-level metadata)
    → extracted + quarantine [+ lineage]

One logical plan; Catalyst handles pruning/pushdown; the explicit pieces
are the salted repartition (skew), the sniff placement (single execution,
reused exchange), and the ordered gather (deterministic collect_list).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.operators.explode import explode_spans
from lens_spark.operators.extract import dispatch, run_extract_udf
from lens_spark.operators.html_ops import html_extract
from lens_spark.operators.reassemble import assemble


@dataclass
class ExtractResult:
    extracted: DataFrame   # schema.EXTRACTED
    quarantine: DataFrame  # schema.QUARANTINE
    spans_flat: DataFrame  # pre-reassembly span rows (for search/lineage)


def _norm_media(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        "display_name",
        "offset",
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        "media_ref",
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("keyword"),
        F.lit(None).cast("string").alias("error"),
    )


def _norm_text(df: DataFrame) -> DataFrame:
    # text/* identity passthrough (reference v2_util.go:74-75): payload was
    # stored as the original string, so this is a pure projection.
    return df.select(
        "doc_id",
        "display_name",
        "offset",
        F.lit("text").alias("kind"),
        "text",
        "media_ref",
        "mime",
        F.lit(None).cast("string").alias("keyword"),
        F.lit(None).cast("string").alias("error"),
    )


def _norm_empty(df: DataFrame) -> DataFrame:
    # posexplode_outer sentinel for zero-span docs: vacuous success row
    # filtered out of the spans array at reassembly ('__empty__' kind)
    return df.select(
        "doc_id",
        "display_name",
        F.lit(None).cast("int").alias("offset"),
        F.lit("__empty__").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("keyword"),
        F.lit(None).cast("string").alias("error"),
    )


def extract(docs: DataFrame, cfg: ExtractConfig = DEFAULT) -> ExtractResult:
    exploded = explode_spans(docs, cfg)
    branches = dispatch(exploded, cfg)

    spans = (
        _norm_empty(branches["empty"])
        .unionByName(_norm_media(branches["media"]))
        .unionByName(_norm_text(branches["text"]))
        .unionByName(html_extract(branches["html"], cfg))
        .unionByName(run_extract_udf(branches["udf"], cfg))
    )

    good = spans.filter(F.col("error").isNull())
    quarantine = spans.filter(F.col("error").isNotNull()).select(
        "doc_id", "offset", "kind", "error"
    )
    extracted = assemble(good, cfg)
    return ExtractResult(extracted=extracted, quarantine=quarantine,
                         spans_flat=spans)
