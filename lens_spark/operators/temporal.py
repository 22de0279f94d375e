"""As-of (point-in-time) join — the temporal operator Spark's own
DataFrame API lacks.

"For each event, the latest snapshot at or before it" is the join
shape of feature lookup (training examples × feature-store
snapshots), price/telemetry alignment, and config-at-crawl-time
attribution.  Naive formulations are scale killers: an inequality
join explodes to O(|L|·|R|) pairs per key before aggregation, and a
per-key collect is a skew bomb.

Spark-first design — the UNION-WINDOW formulation: tag both sides,
union them, and let ONE window scan per key resolve every match:

    union(left + side=1, right + side=0)
    last(right_payload, ignorenulls=True)
        over (partition by keys order by (time, side) rows unbounded
              preceding .. current)

Right rows sort BEFORE left rows at equal time (side 0 < 1), so the
match is inclusive (``ts == snapshot ts`` matches) — the same
convention DuckDB's native ASOF JOIN implements, which is what makes
the driver oracle a one-liner.

100 TB shape: exactly ONE shuffle (the window's hashpartitioning on
the keys; the union is free — both scans feed the same exchange), no
join node anywhere, no pair explosion: cost is the linear window scan
of |L|+|R| rows per key.  Skewed keys cost what the key's own row
count costs — same bound as any per-key window, and far below the
O(n·m) of the inequality-join formulation.  Plan-asserted in
tests/test_temporal.py.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``right_cols``
    of the latest ``right`` row with ``right.on <= left.on``
    (``direction="backward"``; ``"forward"`` takes the earliest
    ``right.on >= left.on``) within the same ``by`` group.  Rows with
    no match keep NULL right columns (left-join semantics).

    ``on`` must be a timestamp or numeric column present in BOTH
    frames; matched right columns come back as ``<name><suffix>``,
    plus ``<on><suffix>`` (the matched snapshot's own time).

    ``tolerance`` (seconds for timestamps, plain difference for
    numerics) voids matches farther than that from the event —
    feature-staleness bounds.

    Ties inside ``right`` at the same (key, time) resolve by the
    LAST right row in (time, payload) struct order — deterministic,
    but prefer time-unique snapshots per key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if not by:
        raise ValueError(
            "asof_join requires at least one 'by' key: a keyless "
            "as-of is a single-group window — one task at any scale"
        )
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c != on and c not in by
        ]

    rpayload = F.struct(
        F.col(on).alias(f"__{on}"),
        *[F.col(c) for c in right_cols],
    )
    rtype = right.select(rpayload.alias("p")).schema["p"].dataType
    lpayload = F.struct(*[F.col(c) for c in left.columns])
    ltype = left.select(lpayload.alias("p")).schema["p"].dataType

    lside = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        lpayload.alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    rside = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__l"),
        rpayload.alias("__r"),
    )
    u = lside.unionByName(rside)

    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(),
                 F.col("__r").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(),
                 F.col("__r").desc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)

    if tolerance is not None:
        rt = matched[f"__{on}"]
        t = F.col("__t")
        if dict(u.dtypes)["__t"].startswith("timestamp"):
            # NTZ casts through the session zone (UTC in this repo's
            # sessions — session.py pins it), LTZ is a no-op
            delta = (
                F.unix_micros(t.cast("timestamp_ltz"))
                - F.unix_micros(rt.cast("timestamp_ltz"))
            ) / 1e6
        else:
            delta = t.cast("double") - rt.cast("double")
        if direction == "forward":
            delta = -delta
        matched = F.when(delta <= F.lit(float(tolerance)), matched)

    out = (
        u.select("__side", "__l", matched.alias("__m"))
        .filter(F.col("__side") == 1)
    )
    proj: list[Column] = [
        F.col(f"__l.{c}").alias(c) for c in left.columns
    ]
    proj.append(F.col(f"__m.__{on}").alias(f"{on}{suffix}"))
    proj.extend(
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols
    )
    return out.select(*proj)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    start_col: str = "start",
    end_col: str = "end",
    bucket: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-interval join: every ``points`` row × every
    ``intervals`` row whose ``[start_col, end_col]`` contains it
    (inclusive both ends), optionally also matching on ``by`` keys.

    Spark lowers a raw ``p.ts between i.start and i.end`` predicate
    (without an equi-key) to BroadcastNestedLoopJoin — O(|P|·|I|)
    comparisons and a broadcast of whichever side is "small".  This
    formulation manufactures the missing equi-key: intervals EXPLODE
    into the coarse time buckets they overlap, points map to their one
    bucket, and the join becomes a plain hash equi-join on
    (by…, bucket) with the exact containment as a residual filter.

    ``bucket`` is the coarse width (seconds for timestamps, plain
    units for numerics).
    Choose it near the TYPICAL interval length: each interval lands in
    ``len/bucket + 1`` buckets (the blowup is metered by that ratio),
    and each point compares only against intervals sharing its bucket
    — never the whole interval table.

    100 TB shape: one shuffle per side on (by…, bucket), hash
    equi-join, residual filter fused into the join — the standard
    bucketed interval-join every warehouse engine (and Spark's own
    range-join hints on Databricks) uses.  Plan-asserted: a real
    equi-join (SortMergeJoin/ShuffledHashJoin), never
    BroadcastNestedLoopJoin."""
    by = by or []
    is_ts = dict(points.dtypes)[on].startswith("timestamp")
    if isinstance(bucket, str):
        raise ValueError(
            "pass bucket as seconds (float); interval strings are "
            "ambiguous across calendar units"
        )
    step = int(bucket * 1_000_000) if is_ts else bucket

    def to_units(c):
        # NTZ casts through the session zone (pin sessions to UTC —
        # session.py does); the residual containment filter compares
        # the ORIGINAL columns, so bucketing can never change results
        return (
            F.unix_micros(F.col(c).cast("timestamp_ltz"))
            if is_ts else F.col(c)
        )

    p = points.withColumn(
        "__b", F.floor(to_units(on) / F.lit(step)).cast("long")
    )
    i = intervals.withColumn(
        "__bs", F.floor(to_units(start_col) / F.lit(step)).cast("long")
    ).withColumn(
        "__be", F.floor(to_units(end_col) / F.lit(step)).cast("long")
    )
    i = i.withColumn(
        "__b", F.explode(F.sequence(F.col("__bs"), F.col("__be")))
    ).drop("__bs", "__be")

    ivals = [c for c in intervals.columns if c not in by]
    renamed = i.select(
        *[F.col(c) for c in by + ["__b"]],
        *[F.col(c).alias(f"{c}{suffix}") for c in ivals],
    )
    cond = (
        (F.col(on) >= F.col(f"{start_col}{suffix}"))
        & (F.col(on) <= F.col(f"{end_col}{suffix}"))
    )
    out = p.join(renamed, by + ["__b"]).filter(cond).drop("__b")
    return out
