"""Collision-safe higher-order-function helpers.

PySpark names every single-arg lambda variable ``x`` (and 2-arg lambdas
``x, y`` — pyspark/sql/functions/builtin.py ``_create_lambda``), relying
on the analyzer to alpha-rename. In Spark 4.1.2 that breaks when MANY
sibling lambdas share one projection: expressions like

    F.array(*[F.array_min(F.transform(col, lambda s: md5(concat(lit(h), s))))
              for h in range(16)])

return WRONG, run-to-run-unstable values (reproduced: none of the 16
mins match a Python md5 reference, and two identical plans disagree).

These helpers construct ``LambdaFunction`` expressions with globally
unique variable names so no two lambdas in a plan can ever collide.
Use them anywhere more than one lambda lands in the same select.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column
from pyspark.sql import functions as F

_COUNTER = itertools.count()


def _fresh_var(prefix: str = "lv") -> str:
    return f"{prefix}_{next(_COUNTER)}"


def _lambda(func, nargs: int):
    """Build a JVM LambdaFunction with unique variable names."""
    from pyspark.sql.functions.builtin import (
        _get_active_spark_context, _unresolved_named_lambda_variable,
    )
    from pyspark.sql.classic.column import _to_seq

    sc = _get_active_spark_context()
    names = [_fresh_var() for _ in range(nargs)]
    args = [_unresolved_named_lambda_variable(n) for n in names]
    result = func(*args)
    jargs = _to_seq(sc, [a._jc for a in args])
    return sc._jvm.PythonSQLUtils.lambdaFunction(result._jc, jargs)


def _invoke(name: str, col: Column, *lambdas) -> Column:
    from pyspark.sql.functions.builtin import _get_active_spark_context
    from pyspark.sql.classic.column import Column as CColumn, _to_seq

    sc = _get_active_spark_context()
    jcols = [col._jc] + list(lambdas)
    expr = sc._jvm.PythonSQLUtils.fn(name, _to_seq(sc, jcols))
    return CColumn(expr)


def transform_u(col: Column, func) -> Column:
    """Collision-safe ``F.transform``."""
    return _invoke("transform", col, _lambda(func, 1))


def let_u(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` ONCE per row and
    hand it to ``body`` as a bound lambda variable.

    Why this exists (r06): a subexpression referenced inside a
    higher-order-function lambda is re-evaluated on EVERY element —
    lambda-bearing expressions are excluded from Catalyst CSE and
    codegen subexpression elimination — so e.g. a tokenizer feeding a
    per-position scan silently turns O(n) into O(n²) per row (measured:
    doc_winnow 278 s → 1.9 s at sf0.1). Binding the value through a
    single-element ``transform`` makes every inner reference a lambda
    VARIABLE lookup. Values are bit-identical; this also survives
    filter pushdown (the binding travels inside the expression), unlike
    materializing a column, which pushdown re-inlines."""
    return F.element_at(transform_u(F.array(value), body), 1)


def filter_u(col: Column, func) -> Column:
    return _invoke("filter", col, _lambda(func, 1))


def filter_u2(col: Column, func) -> Column:
    """Collision-safe 2-arg ``F.filter`` — func(element, 0-based index)."""
    return _invoke("filter", col, _lambda(func, 2))


def exists_u(col: Column, func) -> Column:
    return _invoke("exists", col, _lambda(func, 1))


def aggregate_u(col: Column, init: Column, merge) -> Column:
    from pyspark.sql.functions.builtin import _get_active_spark_context
    from pyspark.sql.classic.column import Column as CColumn, _to_seq

    sc = _get_active_spark_context()
    jcols = [col._jc, init._jc, _lambda(merge, 2),
             _lambda(lambda x: x, 1)]
    expr = sc._jvm.PythonSQLUtils.fn("aggregate", _to_seq(sc, jcols))
    return CColumn(expr)


def zip_with_u(a: Column, b: Column, func) -> Column:
    from pyspark.sql.functions.builtin import _get_active_spark_context
    from pyspark.sql.classic.column import Column as CColumn, _to_seq

    sc = _get_active_spark_context()
    jcols = [a._jc, b._jc, _lambda(func, 2)]
    expr = sc._jvm.PythonSQLUtils.fn("zip_with", _to_seq(sc, jcols))
    return CColumn(expr)
