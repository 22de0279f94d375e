"""Ordered span reassembly (north_star: "reassembled with a
window-ordered collect_list keyed on original span offset").

``collect_list`` alone is order-nondeterministic, so the gather is
``array_sort(collect_list(struct(order, ...)))`` — struct comparison sorts
by the leading ``order`` field (== original offset, unique per doc), which
is the deterministic equivalent of the window formulation with one shuffle
and no row_number filter. Doc-level metadata is derived in the same single
aggregation:

- mime_type / category: the first payload span by offset (reference
  indexes ONE blob per hash, v2_util.go:98-103; in the interleaved model
  the earliest payload span plays that role), defaulted to 'unknown'
  exactly like the engine does at index time (engine/engine.go:130-137).
- tags: image classifier keywords in offset order (reference appends the
  keyword per image, v2_util.go:92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.functions.hof import transform_u
from lens_spark.functions.mime import category_for


def assemble(good_spans: DataFrame,
             cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """good_spans: SPAN_OUT rows with error IS NULL (including the
    '__empty__' sentinel for zero-span docs). Join-free: one aggregation
    produces the final table; docs whose every span quarantined simply
    have no good rows and are absent — the reference never indexes a
    failed magnify (v2_util.go:62-65,94)."""
    # transform_u: two sibling transform lambdas share this aggregation
    agg = good_spans.groupBy("doc_id").agg(
        transform_u(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("kind") != "__empty__",
                        F.struct(
                            F.col("offset").alias("order"),
                            F.col("kind"),
                            F.col("text"),
                            F.col("media_ref"),
                        ),
                    )
                )
            ),
            lambda s: F.struct(
                s.kind.alias("kind"),
                s.text.alias("text"),
                s.media_ref.alias("media_ref"),
                s.order.alias("order"),
            ),
        ).alias("spans"),
        F.first("display_name").alias("display_name"),
        F.min(
            F.when(F.col("mime").isNotNull(),
                   F.struct(F.col("offset"), F.col("mime")))
        )["mime"].alias("mime_type"),
        transform_u(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("keyword").isNotNull(),
                           F.struct(F.col("offset"), F.col("keyword")))
                )
            ),
            lambda s: s.keyword,
        ).alias("tags"),
    )

    # per-doc index stamp (engine/engine.go:148: properties.indexed =
    # time.Now() per doc; index.go:36-38). cfg.indexed_at pins a literal
    # for deterministic fixtures/oracles; None = wall clock at run time.
    indexed = (
        F.to_timestamp(F.lit(cfg.indexed_at))
        if cfg.indexed_at is not None
        else F.current_timestamp()
    )
    return agg.select(
        "doc_id",
        "spans",
        # index-time defaulting: engine/engine.go:130-137
        F.coalesce("mime_type", F.lit("unknown")).alias("mime_type"),
        category_for(F.col("mime_type")).alias("category"),
        F.coalesce("tags", F.array().cast("array<string>")).alias("tags"),
        "display_name",
        indexed.alias("indexed"),
        F.lit(cfg.extractor_version).alias("extractor_version"),
    )
