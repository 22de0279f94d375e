"""Deterministic distributed sketches (HyperLogLog, Count-Min).

At 10^12 documents, "how many distinct ids / hosts / fingerprints"
must not cost a COUNT(DISTINCT) shuffle of the key universe.  Spark's
``approx_count_distinct`` answers it, but its HLL++ register layout is
engine-private — no other engine can verify it, and two engines can't
MERGE each other's sketches.  This module is an engine-portable HLL
(Flajolet et al. 2007) built from md5, so any engine — the DuckDB
driver oracle included — computes bit-identical registers:

    h       = md5(key)
    bucket  = first 12 hex bits  (p = 12, m = 4096 registers)
    w       = next 52 bits as an integer
    rho(w)  = trailing-zero count of w, + 1; 53 when w == 0
              (trailing zeros via the branch-free identity
               tz = bit_count((w & -w) - 1) — pure integer ops that
               exist in Spark AND DuckDB, no log2/float anywhere)
    register[bucket] = max(rho)

The REGISTER TABLE is the exactly-comparable artifact (the driver row
hash-compares it); the float estimate on top is a tiny model-sized
fold (≤ m rows) computed identically everywhere but compared with
tolerance only (tests), never hashed — the one place a float belongs.

100 TB shape: one scan, one map-side-combined groupBy on 4096 buckets
(a shuffle of ≤ m·partitions tiny rows — effectively free), register
tables MERGE by union+max (sketches from different corpora / days /
engines compose), estimate is O(m) on the driver.

The same engine-portability argument applies to FREQUENCY: "how often
does this n-gram / host / template occur" at 10^12 keys must not cost
an exact count of the key universe.  :func:`cms_registers` is a
Count-Min sketch (Cormode & Muthukrishnan 2005) on the identical md5
convention — ``depth`` independent hash rows of 4096 integer-count
buckets (``bucket_d(key) = first 12 bits of md5(d || ':' || key)``,
the exact key-salting shape the corpus_shuffle / wds_manifest oracle
rows already pin cross-engine).  All cells are exact integers, so the
register table is hash-comparable and sketches are LINEAR: merge =
union + cell-wise sum, across shards, days, or engines.  Point lookup
(:func:`cms_lookup`) takes min over the depth cells — an OVERestimate
bounded by true + N·e/width with probability 1 − e^-depth.

100 TB shape: same single map-side-combined shuffle, now on ≤
depth·4096 cells; the register table's size is fixed BY CONSTRUCTION
(not data-dependent), so the lookup join-back broadcasts safely — the
contrast with decontam's hit table (ADVICE r4), whose size depends on
the data and must be left to AQE.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "cms_registers",
    "cms_merge",
    "cms_lookup",
]

P = 12
M = 1 << P
RHO_CAP = 53  # 52 hash bits exhausted


def _rho(w):
    """rho = trailing zeros of w, +1 (branch-free bit_count identity);
    w == 0 → RHO_CAP."""
    tz = F.bit_count((w.bitwiseAND(-w)) - F.lit(1).cast("long"))
    return F.when(w == 0, F.lit(RHO_CAP)).otherwise(tz + F.lit(1))


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """``(bucket, rho)`` register table (p=12) over a key column —
    only non-empty buckets are present (absent = 0, the merge/estimate
    convention)."""
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    w = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), _rho(w).alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("rho"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables (different shards / days / engines):
    union + max — HLL's lossless composition property."""
    if not registers:
        raise ValueError("nothing to merge")
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame) -> float:
    """Cardinality estimate from a register table — the standard HLL
    raw estimator with the small-range linear-counting correction.
    O(m) driver fold (model-sized collect, the kmeans-centroids
    precedent); float by design, compared with tolerance only."""
    rows = registers.collect()
    present = {int(r["bucket"]): int(r["rho"]) for r in rows}
    zeros = M - len(present)
    s = zeros * 1.0  # 2^-0 per empty register
    for b in sorted(present):  # fixed fold order: run-reproducible
        s += 2.0 ** (-present[b])
    alpha = 0.7213 / (1.0 + 1.079 / M)
    raw = alpha * M * M / s
    if raw <= 2.5 * M and zeros:
        return M * math.log(M / zeros)
    return raw


# ------------------------------------------------------- Count-Min sketch
CMS_DEPTH = 4  # e^-4 ≈ 1.8% chance a lookup misses the ε bound
CMS_WIDTH = M  # 4096 buckets = first 3 md5 hex chars, the HLL convention


def _cms_bucket(d, key):
    """Row-``d`` bucket of ``key``: first 12 bits of md5(d || ':' ||
    key) — one md5 per (row, key), the salted-hash family the
    corpus_shuffle oracle rows already pin as engine-portable."""
    h = F.md5(F.concat(d.cast("string"), F.lit(":"), key))
    return F.conv(F.substring(h, 1, 3), 16, 10).cast("int")


def cms_registers(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """``(d, bucket, cnt)`` Count-Min register table over a key column
    (one count per occurrence, or per ``weight_col`` units).  Only
    touched cells are present (absent = 0, the merge/lookup
    convention); the table is bounded by ``depth``·4096 cells BY
    CONSTRUCTION regardless of corpus size.

    100 TB shape: the depth-way expansion is map-only (explode of a
    ``depth``-element sequence); the single groupBy's map-side combine
    collapses each partition to ≤ depth·4096 rows before the one
    shuffle — the hll_registers shape, count instead of max."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"),
        w.alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.select(
            "d",
            _cms_bucket(F.col("d"), F.col("__k")).alias("bucket"),
            "__w",
        )
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables (shards / days / engines): union +
    cell-wise sum — the Count-Min sketch is linear, so the merge is
    EXACT (merged sketch ≡ sketch of the concatenated input)."""
    if not registers:
        raise ValueError("nothing to merge")
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Estimated count per distinct key in ``keys``: min over the
    ``depth`` cells, absent cell = 0.  Estimates are always ≥ the true
    count and ≤ true + N·e/4096 with probability 1 − e^-depth (N =
    total weight inserted).

    The register side is FORCED broadcast — safe because its size is
    capped by construction at depth·4096 rows, never data-dependent
    (contrast decontam's hit-table join, ADVICE r4, which must stay
    with AQE).  The key side stays map-only: explode + hash + one
    groupBy min on the key itself."""
    expand = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(
                F.sequence(F.lit(0), F.lit(depth - 1))
            ).alias("d"),
        )
    )
    expand = expand.select(
        key_col,
        "d",
        _cms_bucket(F.col("d"), F.col(key_col)).alias("bucket"),
    )
    return (
        expand.join(F.broadcast(registers), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(
                F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
            ).alias("est")
        )
    )
