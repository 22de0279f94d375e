"""End-to-end extraction pipeline.

    read documents → [resume anti-join] → posexplode + salt-repartition
    (lean columns: payload replaces text, sniff moves into the UDF)
    → ONE Arrow mapInPandas (sniff once + branch dispatch + per-kind
      extraction: media/text passthrough, HTML main-content via the
      reference-spec strip_html, PDF/image/binary extractors)
    → ordered reassembly (+ doc-level metadata)
    → extracted + quarantine [+ lineage]

One logical plan: one scan, one salted exchange (skew), one Python
crossing, one reassembly exchange with a deterministic ordered gather
(array_sort over collect_list).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.operators.explode import explode_spans_lean
from lens_spark.operators.extract import run_span_extract
from lens_spark.operators.reassemble import assemble


@dataclass
class ExtractResult:
    extracted: DataFrame   # schema.EXTRACTED
    quarantine: DataFrame  # schema.QUARANTINE
    spans_flat: DataFrame  # pre-reassembly span rows (for search/lineage)


def extract(docs: DataFrame, cfg: ExtractConfig = DEFAULT) -> ExtractResult:
    # Single-pass formulation (r06): one scan → lean salted exchange →
    # ONE mapInPandas doing sniff + dispatch + per-kind extraction →
    # reassembly. The original branch formulation (dispatch + per-branch
    # normalizers below) planned five filtered copies of the
    # scan→decode→sniff subtree — per-branch pushed-down filters make
    # the subtrees non-identical, so neither ReuseExchange nor AQE stage
    # reuse ever fired (measured: 5 parquet scans, 6 sniff evaluations
    # per run). Row-level semantics are identical and pinned by
    # tests/test_pipeline.py, tests/test_html.py and the extract_full
    # fixture oracle.
    spans = run_span_extract(explode_spans_lean(docs, cfg), cfg)

    good = spans.filter(F.col("error").isNull())
    quarantine = spans.filter(F.col("error").isNotNull()).select(
        "doc_id", "offset", "kind", "error"
    )
    extracted = assemble(good, cfg)
    return ExtractResult(extracted=extracted, quarantine=quarantine,
                         spans_flat=spans)
