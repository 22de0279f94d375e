"""Distributed Bloom-filter digest index: O(bits) membership for
incremental exact dedup at corpus scale.

`exact_dedup_increment` (dedup.py) probes the full stored digest index —
correct, but the index is one row per distinct document (10^12 rows at
the target scale). A Bloom filter answers "definitely new" / "maybe
seen" in ~10 bits per document instead of a 32-byte digest row: at 1%
false-positive rate the index shrinks ~100×, and the expensive exact
probe only runs for the (small) maybe-seen slice. This is the standard
two-tier ingest shape: Bloom pre-filter → exact probe of survivors.

Representation: the filter is a TABLE of (word_idx: long, bits: long) —
one row per non-zero 64-bit word — NOT a driver-side bitset. Build is
one explode (map-only, k rows per doc) + one groupBy(word_idx) with a
bit_or aggregate (map-side partial combine makes the shuffle ≤
m/64 rows per partition regardless of corpus size). Probe is one
explode + one equi-join on word_idx (the filter table is tiny relative
to the corpus → AQE broadcasts it; at very large m, bucket both sides
by word_idx range so the probe prunes) + one groupBy(id). No Python in
either path — every hash is Catalyst md5/conv, so a DuckDB oracle can
replay the exact bit math, false positives included.

Hash scheme (shared verbatim with the SQL mirror in __spark_entry__):
  fingerprint = md5(normalize_text(text))          -- the exact-dedup digest
  pos_j  = ('0x' || substr(md5(fingerprint || ':' || j), 1, 15)) % m_bits
  word   = pos_j // 64,  bit = pos_j % 64
Guarantee: NO false negatives ever (a stored digest always probes
positive); false-positive rate ≈ (1 - e^{-k·n/m})^k, tunable via
`bloom_params`.

Reference linkage: the reference keeps a whole-corpus "already indexed"
set in memory (engine/engine.go searchAndIndex path); this is that idea
made scale-safe — the membership structure is itself distributed and
maintained incrementally (bit_or of old table and the increment's
delta words is idempotent).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.text import normalize_text

__all__ = [
    "bloom_params",
    "bloom_build",
    "bloom_probe",
    "bloom_merge",
]


def bloom_params(n_docs: int, fpr: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for `n_docs` insertions at target
    false-positive rate `fpr`: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2),
    both rounded up / to nearest. m is rounded up to a multiple of 64
    so the word table has no ragged tail."""
    if n_docs <= 0:
        raise ValueError("n_docs must be positive")
    if not 0.0 < fpr < 1.0:
        raise ValueError("fpr must be in (0, 1)")
    m = math.ceil(-n_docs * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_docs * math.log(2)))
    return m, k


def _fingerprint(text_col: str) -> Column:
    """The exact-dedup digest: md5 of whitespace/case-normalized text —
    identical to exact_dedup / exact_dedup_increment so the Bloom tier
    composes with the stored digest index."""
    return F.md5(normalize_text(F.col(text_col)))


def _positions(fp: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for one fingerprint. Each position is an
    independent md5 draw (fingerprint || ':' || j) folded to 60 bits
    (15 hex chars — always a non-negative long) mod m_bits."""
    return F.array(*[
        (
            F.conv(
                F.substring(F.md5(F.concat(fp, F.lit(f":{j}"))), 1, 15),
                16, 10,
            ).cast("long")
            % m_bits
        )
        for j in range(k)
    ])


def bloom_build(
    df: DataFrame,
    text_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Build the filter table (word_idx: long, bits: long) from a
    document corpus. One map-only explode (k positions per doc) and one
    groupBy(word_idx) bit_or — partial aggregation caps the shuffle at
    m/64 rows per map task, so build cost is scan-bound at any corpus
    size. Only non-zero words are stored."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(_positions(_fingerprint(text_col), m_bits, k))
    return (
        df.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # column-valued shift amount → SQL expr (the PySpark
            # shiftleft wrapper only takes a literal int)
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two filter tables built with the same (m_bits, k): bit_or
    is idempotent and associative, so incremental maintenance is
    `bloom_merge(stored, bloom_build(increment, ...))` — no rescan."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    new_docs: DataFrame,
    bloom: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Probe an increment against a stored filter table. Returns one
    row per new doc: (id, fingerprint, bloom_hit: int) — bloom_hit = 1
    iff ALL k bits are set (maybe-seen; route to the exact probe),
    0 = definitely new (skip the digest index entirely).

    Plan: map-only explode of the increment's k (word, bit) pairs, one
    LEFT equi-join on word_idx (filter table ≪ increment → AQE
    broadcast; a missing word row means those bits are 0), one
    groupBy(id) taking min(bit set). No Python, 2 shuffle-free maps +
    1 broadcast join + 1 agg on the increment only — the corpus behind
    the filter is never touched."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    nd = new_docs.select(
        F.col(id_col).alias("id"),
        _fingerprint(text_col).alias("fingerprint"),
    )
    probes = nd.select(
        "id", "fingerprint",
        F.explode(_positions(F.col("fingerprint"), m_bits, k)).alias("pos"),
    ).select(
        "id", "fingerprint",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        (F.col("pos") % 64).cast("int").alias("bit"),
    )
    joined = probes.join(bloom, on="word_idx", how="left")
    # arithmetic vs logical shift both preserve bit 0 after masking;
    # column-valued shift amount → SQL expr
    hit = F.expr("shiftright(coalesce(bits, 0L), bit) & 1L")
    return (
        joined.groupBy("id", "fingerprint")
        .agg(F.min(hit).cast("int").alias("bloom_hit"))
    )
