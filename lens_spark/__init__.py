"""lens_spark — a PySpark-native content-extraction + analytics engine.

A from-scratch reimplementation of the capabilities of RTradeLtd/Lens
(reference at /root/reference, Go) as an idiomatic Spark dataflow:

- input: table of interleaved documents
  ``documents(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``
- mime sniffing on raw span bytes (vectorized pandas UDF; WHATWG/Go
  ``http.DetectContentType`` semantics — reference v2_util.go:42)
- type dispatch → text passthrough / PDF text-vs-OCR / image OCR+classify /
  HTML main-content strip / media passthrough (reference v2_util.go:58-96)
- window-ordered span reassembly keyed on original offset
- checkpoint/lineage tables for exact resume (reference IsIndexed guard,
  v2_util.go:23-25)
- a search tier over the extracted table (reference engine/query.go)
- training-data pipeline operators: dedup (exact/minhash-LSH/simhash/
  n-gram-jaccard), ANN similarity, text quality/langid/fingerprinting.

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs. No RDDs, no
per-row Python in hot paths.
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "lens-spark-0.1.0"
