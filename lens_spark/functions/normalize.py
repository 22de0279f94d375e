"""Unicode normalization (NFC / NFKC / NFD / NFKD).

The one basic text op that genuinely needs Python: Catalyst has no
normalization expression (SPARK-47353 tracks one), and composing it from
builtins would mean a translit table per Unicode version. So this is the
documented Pandas-UDF case: an Arrow-batched ``pandas_udf`` — columnar
transfer, one Python invocation per batch, never a per-row Spark UDF.
Inside the batch ``unicodedata.normalize`` is applied per string (there
is no vectorized normalizer in the stdlib); the quick-check fast path in
CPython's unicodedata makes already-NFC text (the overwhelming majority
of a real corpus) a near-no-op.

100 TB shape: map-only, zero shuffles — the UDF stage is embarrassingly
parallel and the Arrow batch size is Spark-managed
(``spark.sql.execution.arrow.maxRecordsPerBatch``). Parity: DuckDB's
``nfc_normalize`` (utf8proc) matches ``unicodedata.normalize("NFC", .)``
— both implement UAX #15 (probed on composed/decomposed/compat cases;
driver row ``nfc_normalize``).

Training-data layer addition (Dolma/ftfy normalize before filtering; the
reference engine indexes bytes as-is, engine/engine.go).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Normalize a string column to the given Unicode normal form.

    Nulls pass through. Returns a string column.
    """
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s):
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t)
            if t is not None else None
        )

    return _norm(col)
