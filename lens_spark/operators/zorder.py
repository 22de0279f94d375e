"""Z-order (Morton) clustering key — multi-dimensional layout for
min-max pruning.

A 100 TB table is pruned by file-level min/max statistics (parquet row
groups, LensTable bucket dirs, Iceberg manifests).  Sorting by ONE
column makes pruning perfect on that column and useless on every
other; interleaving the BITS of several columns (the Z-order / Morton
curve — the technique behind Delta Lake ``OPTIMIZE ZORDER BY`` and
ClickHouse/DB2 multi-dimensional clustering) keeps rows that are close
in ANY dimension close in the layout, so min-max pruning works on all
of them at once.

This module is the pure-Catalyst key computation:

- each dimension is RANK-QUANTIZED to ``bits`` levels (quantiles, not
  raw values — Morton interleaving assumes uniformly-spread inputs;
  skewed raw values would waste most of the curve on empty space).
  The quantile boundaries come from one tiny model-sized pass
  (``approxQuantile`` driver fold, the IVF-training precedent) or the
  caller's fixed grid;
- the key interleaves bit i of every dimension round-robin
  (dim0-bit-i, dim1-bit-i, …) via shift/OR — whole-stage-codegen
  integer ops, no UDF anywhere;
- writing is the caller's ``repartitionByRange(key)`` + write: range
  partitioning puts contiguous curve segments in contiguous files,
  which is exactly what makes the min-max stats tight.

The exactly-comparable artifact is the INTEGER key itself (the
driver row recomputes every interleaved bit in SQL); pruning
effectiveness is pinned in pytest by measuring the min-max span of
each dimension across range-partitioned chunks.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_by"]


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each (already-quantized,
    non-negative) column: output bit ``i * n_dims + d`` = input bit
    ``i`` of dim ``d``.  Pure shift/AND/OR — stays in codegen."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(
                F.lit(1).cast("long")
            )
            out = out.bitwiseOR(
                F.shiftleft(bit, i * n + d)
            )
    return out


def zorder_key(
    quantized: list[Column | str],
    bits: int = 16,
) -> Column:
    """The Morton key over ALREADY-QUANTIZED dimensions (each an
    integer in ``[0, 2**bits)``).  ``len(quantized) * bits`` must fit
    in 63 bits.  Use :func:`zorder_by` for end-to-end quantize +
    key + range layout."""
    cols = [F.col(c) if isinstance(c, str) else c for c in quantized]
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} dims x {bits} bits exceeds a long key"
        )
    return _interleave(cols, bits)


def zorder_by(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    n_files: int | None = None,
    key_name: str = "zkey",
) -> DataFrame:
    """Quantize ``dims`` to ``bits``-bit ranks (approxQuantile grid —
    one model-sized driver fold per dim), add the Morton ``key_name``
    column, and range-partition by it (``n_files`` output partitions,
    default: keep the session shuffle parallelism).  Write the result
    as-is: contiguous curve segments land in contiguous files and the
    per-file min-max stats become tight on EVERY dim at once.

    ``bits=8`` = 256 rank levels per dim — granular enough to separate
    ~100k files on 2-3 dims, and the per-row rank costs a linear scan
    of the 255-cut literal grid (codegen integer compares; raise bits
    only with a thought for the 2^bits-per-row-per-dim scan).

    100 TB shape: one pass for the quantile grids (sampled,
    model-sized result), one range shuffle for the layout — the same
    cost as any global sort, but buying pruning on all ``dims``."""
    from lens_spark.functions.hof import aggregate_u

    levels = 1 << bits
    qcols = []
    for d in dims:
        dt = dict(df.dtypes)[d]
        num = (
            F.unix_micros(F.col(d).cast("timestamp_ltz"))
            if dt.startswith("timestamp")
            else F.col(d).cast("double")
        )
        probs = [i / levels for i in range(1, levels)]
        # relativeError 1/(4*levels): grid cells stay distinguishable
        cuts = df.select(num.alias("__x")).approxQuantile(
            "__x", probs, 1.0 / (4 * levels)
        )
        # rank = number of cuts <= value (0..levels-1); one lambda per
        # dim in the same select -> collision-safe aggregate (hof.py)
        arr = F.array(*[F.lit(c) for c in cuts])
        rank = aggregate_u(
            arr,
            F.lit(0),
            lambda acc, cut: acc
            + F.when(num >= cut, 1).otherwise(0),
        )
        qcols.append(rank.cast("long").alias(f"__q_{d}"))

    keyed = df.select("*", *qcols)
    key = zorder_key([f"__q_{d}" for d in dims], bits)
    keyed = keyed.withColumn(key_name, key).drop(
        *[f"__q_{d}" for d in dims]
    )
    n = n_files or keyed.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return keyed.repartitionByRange(int(n), F.col(key_name))
