"""Deterministic distributed cardinality sketch (HyperLogLog).

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
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_merge", "hll_estimate"]

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
