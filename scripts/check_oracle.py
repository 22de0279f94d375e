"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry via Spark and its ``oracle_sql()`` via DuckDB on the
same parquet tables, compare row count + schema-sorted value hash.

Usage: python scripts/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df) -> tuple[int, str, list[str]]:
    """Canonical (nrows, value_hash, columns) for a pandas frame:
    columns sorted by name, rows sorted, values stringified."""
    import math

    cols = sorted(df.columns)
    d = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in d.values)
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), h, cols


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import __spark_entry__ as entrymod
    from lens_spark.session import get_spark

    spark = get_spark(app="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in os_:
            print(f"WEAK {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        sn, sh_, sc = canon(sdf)
        on, oh, oc = canon(odf)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} != {oc}")
            failures += 1
        elif sn != on:
            print(f"FAIL {name}: rows {sn} != {on}")
            failures += 1
        elif sh_ != oh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            # show first differing row for debugging
            import pandas as pd

            s_sorted = sdf[sorted(sdf.columns)].astype(str)
            o_sorted = odf[sorted(odf.columns)].astype(str)
            print("  spark head:", s_sorted.head(3).to_dict("records"))
            print("  duck  head:", o_sorted.head(3).to_dict("records"))
            failures += 1
        else:
            print(f"OK   {name} ({sn} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
