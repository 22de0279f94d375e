"""Engine configuration.

Every scale-relevant knob is explicit here so a cluster deploy tunes one
object instead of hunting constants. Defaults are sized for local[32] test
runs; the docstrings say how to scale them to a 1000-executor / 100 TB run.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    """Configuration for the extraction pipeline.

    Reference-semantics constants (must not change — they define
    output equality with the reference):

    - ``pdf_text_threshold``: page text-layer length above which the text
      layer is used instead of OCR (reference analyzer/ocr/ocr.go:41,47 —
      hardcoded 10).
    - ``page_join_prefix``: each accepted page is appended as
      ``" " + page`` (reference ocr.go:73,94) — the extracted PDF text
      therefore has a leading space.
    """

    # --- reference semantics (frozen) ---
    pdf_text_threshold: int = 10
    page_join_prefix: str = " "

    # --- scale mechanics ---
    # Shuffle fan-out for the extract stage. None (default) repartitions
    # by key only and lets AQE pick/coalesce the partition count from the
    # actual shuffle size — the right call at every scale. Pin an explicit
    # count only when AQE is off or batch sizing must be forced.
    num_partitions: int | None = None

    # Salt fan-out for giant-document skew: a doc's spans spread across up
    # to `salt_buckets` tasks during the per-span extract stage and are
    # re-gathered only at the ordered reassembly. Raise when the corpus has
    # multi-GB documents (north_rule skew requirement).
    salt_buckets: int = 16

    # Size-bucket boundaries (bytes of span payload). Spans are grouped so
    # one Arrow batch never mixes 100-byte and 100-MB payloads; the bucket
    # id is part of the repartition key.
    size_bucket_bounds: tuple = (1 << 10, 1 << 14, 1 << 18, 1 << 22)

    # Secondary byte-bound applied *inside* mapInPandas so a single Arrow
    # batch stays under executor memory regardless of row count.
    max_batch_bytes: int = 64 << 20

    # HTML main-content classifier thresholds (target-only capability —
    # Readability/Boilerpipe-style heuristics; see extractors/html_strip.py)
    html_link_density_max: float = 0.33
    html_min_text_chars: int = 25
    html_fusion_window: int = 1

    extractor_version: str = "lens-spark-0.1.0"


@dataclass(frozen=True)
class SearchConfig:
    """Search-tier constants (reference engine/engine.go, engine/query.go)."""

    # reference engine/engine.go:178 — bleve SearchRequest.Size
    top_k: int = 1000
    # reference engine/query.go:52 — required-terms boolean query boost
    required_boost: float = 100.0
    # reference engine/engine.go:196 — search context deadline (seconds)
    deadline_s: int = 30


DEFAULT = ExtractConfig()
DEFAULT_SEARCH = SearchConfig()
