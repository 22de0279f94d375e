"""Auxiliary benchmarks (r06) — NOT part of the frozen driver contract.

``bench.py`` is the frozen headline harness; this file holds the extra
measurements the optimization rounds need:

- ``--sweep``: time EVERY ``queries()`` entry (noop sink, guide §1.4 —
  the sink is eagerly computed and discarded so the measurement is the
  computation, not the write) at ``$SPARK_GRAFT_SF_DIR``. Used to rank
  operators for optimization and to prove non-headline tiers didn't
  regress. Each query's function-call time (driver-side plan build +
  any side work the row does) is included — that's what the driver's
  correctness harness pays too.
- ``--queries a,b,c``: restrict the sweep.

Prints one JSON line: {"sweep": {name: sec, ...}, "sf": ..., "failed":
{name: err}}.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = None
    if "--queries" in sys.argv:
        only = set(
            sys.argv[sys.argv.index("--queries") + 1].split(","))

    from lens_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="lens-bench-extra", cores=cores)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep sweeping; report at the end
            failed[name] = f"{type(e).__name__}: {e}"[:200]
        spark.sparkContext.setJobDescription(None)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "sweep": out,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "failed": failed,
        "total": round(sum(out.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
