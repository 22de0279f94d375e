"""HTML main-content extraction — the Spark side.

north_star: "HTML boilerplate stripping via a vectorized DOM-heuristic
classifier (tag/text-density scoring over a flattened node table,
Readability-style link-density and block-fusion rules)".

Stage (a): ``mapInPandas`` batch-parses HTML spans into an exploded block
table ``(doc_id, offset, media_ref, mime, block_id, tag, depth, text,
n_chars, n_link_chars, n_tags, boiler)`` — one Python parse per document,
Arrow-batched (extractors/html_strip.py; lxml slots in on a real image).

Stage (b): PURE DataFrame scoring — no Python:

    link_ok  = n_link_chars <= link_density_max * n_chars
    keep_raw = n_chars >= min_text_chars AND link_ok AND NOT boiler
    fusion   = NOT keep_raw AND NOT boiler AND link_ok
               AND lag(keep_raw) AND lead(keep_raw)      -- block fusion
    keep     = keep_raw OR fusion

then kept blocks are re-gathered per span ordered by block_id
(array_sort over collect_list — deterministic) and joined with '\\n'.

This must match ``extractors.html_strip.strip_html`` bit-for-bit (the
oracle path); tests/test_html.py asserts equality on fixtures and random
corpora.

Scale: the block table is where a giant HTML doc's work spreads — scoring
and the window run over blocks, distributed by (doc_id, offset) hash; the
only per-doc serial cost is the parse itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.extractors.html_strip import html_blocks
from lens_spark.functions.hof import transform_u

BLOCK_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("display_name", StringType()),
        StructField("offset", IntegerType()),
        StructField("media_ref", StringType()),
        StructField("mime", StringType()),
        StructField("block_id", IntegerType()),
        StructField("tag", StringType()),
        StructField("depth", IntegerType()),
        StructField("text", StringType()),
        StructField("n_chars", IntegerType()),
        StructField("n_link_chars", IntegerType()),
        StructField("n_tags", IntegerType()),
        StructField("boiler", BooleanType()),
    ]
)


def _blocks_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in it:
        rows = []
        for doc_id, display_name, offset, media_ref, mime, payload in zip(
            b["doc_id"], b["display_name"], b["offset"], b["media_ref"],
            b["mime"], b["payload"]
        ):
            html = bytes(payload).decode("utf-8", errors="replace") \
                if payload is not None else ""
            for blk in html_blocks(html):
                rows.append(
                    (doc_id, display_name, offset, media_ref, mime,
                     blk.block_id, blk.tag, blk.depth, blk.text,
                     blk.n_chars, blk.n_link_chars, blk.n_tags, blk.boiler)
                )
            if not rows or rows[-1][0] != doc_id or rows[-1][2] != offset:
                # emit a sentinel empty block so spans whose HTML yields no
                # blocks still produce an (empty-text) output span
                rows.append((doc_id, display_name, offset, media_ref, mime,
                             -1, "body", 0, "", 0, 0, 0, False))
        yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA])


def html_node_table(branch: DataFrame) -> DataFrame:
    """Stage (a): HTML spans → exploded block table."""
    cols = ["doc_id", "display_name", "offset", "media_ref", "mime",
            "payload"]
    return branch.select(*cols).mapInPandas(_blocks_batches, BLOCK_SCHEMA)


def score_blocks(blocks: DataFrame, cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """Stage (b): pure-DataFrame classification (spec in module doc)."""
    link_ok = F.col("n_link_chars") <= cfg.html_link_density_max * F.col("n_chars")
    keep_raw = (
        (F.col("n_chars") >= cfg.html_min_text_chars)
        & link_ok
        & ~F.col("boiler")
        & (F.col("block_id") >= 0)
    )
    w = Window.partitionBy("doc_id", "offset").orderBy("block_id")
    scored = blocks.withColumn("keep_raw", keep_raw).withColumn(
        "keep",
        F.col("keep_raw")
        | (
            ~F.col("keep_raw")
            & ~F.col("boiler")
            & link_ok
            & (F.col("block_id") >= 0)
            & F.coalesce(F.lag("keep_raw").over(w), F.lit(False))
            & F.coalesce(F.lead("keep_raw").over(w), F.lit(False))
        ),
    )
    return scored


def html_extract(branch: DataFrame, cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """Full HTML branch: block table → score → per-span main text,
    normalized to the SPAN_OUT column set."""
    scored = score_blocks(html_node_table(branch), cfg)
    kept = scored.groupBy("doc_id", "offset").agg(
        F.first("display_name").alias("display_name"),
        F.first("media_ref").alias("media_ref"),
        F.first("mime").alias("mime"),
        F.array_join(
            transform_u(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"),
                               F.struct(F.col("block_id"), F.col("text")))
                    )
                ),
                lambda s: s.text,
            ),
            "\n",
        ).alias("text"),
    )
    return kept.select(
        "doc_id",
        "display_name",
        "offset",
        F.lit("html").alias("kind"),
        "text",
        "media_ref",
        "mime",
        F.lit(None).cast("string").alias("keyword"),
        F.lit(None).cast("string").alias("error"),
    )
