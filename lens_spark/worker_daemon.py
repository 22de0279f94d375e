"""Custom PySpark worker daemon with pre-forked imports.

Each forked python worker normally pays the pandas/numpy/lens_spark
import chain (~1.5 CPU-s) on its first task. With 2×cores workers per
python-stage type, a 32-core executor burns ~100 CPU-s just importing —
measured as the dominant scaling-efficiency loss at high core counts.

This daemon imports the heavy modules ONCE before the fork loop, so every
worker inherits them via copy-on-write for free. Enabled via
``spark.python.daemon.module=lens_spark.worker_daemon``
(lens_spark/session.py); requires lens_spark on the worker PYTHONPATH
(cwd in local mode, --py-files zip on a cluster).
"""

# preload the heavy import chains used by every UDF in this engine
import numpy  # noqa: F401
import pandas  # noqa: F401

import lens_spark.functions.mime  # noqa: F401  (sniff UDF)
import lens_spark.operators.extract  # noqa: F401  (pdf/image UDF chain)
import lens_spark.operators.html_ops  # noqa: F401  (block flattener)
import lens_spark.operators.multimodal  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
