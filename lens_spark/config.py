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
    # Shuffle fan-out for the extract stage. None (default) pins the count
    # to 2 x defaultParallelism (operators/explode.py): the stage above
    # the exchange is Python-CPU-bound, so partition count must track
    # CORES, not bytes — AQE's byte-based coalescing would shrink a
    # few-MB shuffle to one partition and serialize the UDF stage
    # (measured 5x slowdown). Set an explicit count to override.
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

    extractor_version: str = "lens-spark-0.2.0"

    # Pin the per-doc `indexed` stamp (reference engine/engine.go:148:
    # properties.indexed = time.Now() per doc) to a fixed literal — for
    # deterministic fixtures/oracle comparisons. None = wall clock.
    indexed_at: str | None = None


@dataclass(frozen=True)
class SearchConfig:
    """Search-tier constants (reference engine/engine.go, engine/query.go)."""

    # reference engine/engine.go:178 — bleve SearchRequest.Size
    top_k: int = 1000
    # reference engine/query.go:52 — required-terms boolean query boost
    required_boost: float = 100.0
    # reference engine/engine.go:196 — search context deadline (seconds)
    deadline_s: int = 30
    # bleve-faithful token stream: the reference's standard analyzer
    # removes Lucene's English stop set at index time (engine/index.go:44);
    # default False keeps stop words (match/no-match parity with the
    # reference test matrix holds either way; scores differ regardless)
    remove_stop_words: bool = False
    # divide scores by the result set's max (bleve tracks MaxScore,
    # engine/engine.go:190) — ranking order is unchanged, scale is [0,1]
    normalize_max_score: bool = False
    # "tf" (round-2 behavior: term-frequency ratio, deterministic and
    # cheap) or "tfidf": Lucene classic similarity as bleve's term
    # scorer computes it — sqrt(tf) x idf^2 x queryNorm x fieldNorm —
    # the closest DataFrame analogue of the reference's scores. tfidf
    # needs corpus stats (N + per-term df): ONE extra aggregation pass
    # per query, driver-collected as literals into the score expression.
    # "bm25": Okapi BM25 with the Lucene-6+ idf variant — the modern
    # default ranking; same one-pass stats aggregation (plus avgdl)
    scoring: str = "tf"
    # BM25 free parameters (the standard Robertson/Lucene defaults)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75


DEFAULT = ExtractConfig()
DEFAULT_SEARCH = SearchConfig()
