"""Attribute sidecars — the Dolma-style tagger/mix contract.

Large corpora are tagged MANY times (quality, toxicity, dedup flags,
language…) but rewritten rarely: the public Dolma toolkit's convention
is that taggers write per-document ATTRIBUTE tables separately from the
immutable corpus, and a later *mix* step joins selected attribute sets
back and applies a boolean rule.  This module is that contract on the
repo's table layer:

- :func:`write_attributes` — project ``(id, tagger__attr…)`` from an
  annotated frame and MERGE it into a LensTable keyed on the id, so
  re-running a tagger UPSERTS (last write wins — the reindex rule the
  table layer already implements, sources/tables.py) instead of
  duplicating, and every tag run is a readable snapshot (time travel /
  audit for free).
- :func:`read_attributes` / :func:`merge_attributes` — re-attach any
  set of attribute tables by equi-join on the id.
- :func:`apply_mix` — filter by a boolean SQL expression over the
  merged columns (the Dolma mix config's filter line).

Column naming follows Dolma: ``<tagger>__<attribute>`` — collisions
between taggers are impossible by construction and ``apply_mix`` rules
read like provenance.

100 TB shape: the sidecar table is hash-bucketed on the id by
LensTable, so a re-tag rewrites only the buckets its increment touches;
the merge joins are plain equi-joins on the id column left to AQE
(broadcast when a tagger covered few docs, shuffle otherwise).
Attributes-not-corpus writes mean a 100 TB corpus is never rewritten to
add a 100 GB signal column.

The reference engine has no attribute tier (its per-doc metadata is
written once at index time, engine/index.go) — training-data layer.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lens_spark.sources.tables import LensTable

__all__ = [
    "write_attributes",
    "read_attributes",
    "merge_attributes",
    "apply_mix",
]


def attribute_name(tagger: str, col: str) -> str:
    return f"{tagger}__{col}"


def write_attributes(
    annotated: DataFrame,
    store_dir: str,
    id_col: str,
    attr_cols: list[str],
    tagger: str,
    num_buckets: int = 16,
) -> str:
    """Write one tagger's attribute table: ``(id_col,
    tagger__<attr>…)`` MERGE-upserted into the LensTable at
    ``store_dir``.  Returns the committed snapshot id."""
    if not tagger or "__" in tagger:
        raise ValueError(f"bad tagger name: {tagger!r}")
    out = annotated.select(
        F.col(id_col),
        *[
            F.col(c).alias(attribute_name(tagger, c))
            for c in attr_cols
        ],
    )
    table = LensTable(store_dir, num_buckets=num_buckets)
    return table.merge_upsert(out, id_col)


def read_attributes(spark: SparkSession, store_dir: str) -> DataFrame:
    return LensTable(store_dir).read(spark)


def merge_attributes(
    docs: DataFrame,
    attrs: list[DataFrame],
    id_col: str,
) -> DataFrame:
    """Left-join attribute tables onto the corpus by ``id_col`` (left:
    docs without a tag keep NULL attributes — mix rules decide the
    policy explicitly, no silent drops)."""
    out = docs
    seen = set(docs.columns)
    for a in attrs:
        extra = [c for c in a.columns if c != id_col]
        dup = seen.intersection(extra)
        if dup:
            raise ValueError(
                f"attribute column collision: {sorted(dup)}"
            )
        seen.update(extra)
        out = out.join(a, on=id_col, how="left")
    return out


def apply_mix(df: DataFrame, rule: str) -> DataFrame:
    """Keep rows where the boolean SQL ``rule`` over merged attribute
    columns holds (NULL-safe: NULL evaluates to not-kept, so untagged
    docs are excluded unless the rule coalesces them in)."""
    return df.filter(F.expr(rule))
