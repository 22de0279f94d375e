"""Schemas for the interleaved-document data model.

Input (authoritative shape, BASELINE.json ``input_hint``)::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Output (extraction result; reference DocData shape, engine/index.go:29-38,
re-expressed columnar)::

    extracted(doc_id, spans(kind,text,media_ref,order), mime_type,
              category, tags, display_name)

Reference mapping:
- doc_id        <- ObjectV2.Hash              (models/object.go:6)
- mime_type     <- MetaDataV2.MimeType: the *full* sniffed content type
                   including charset suffix   (v2_util.go:42,100)
- category      <- 'pdf'|'document'|'image'|'unknown'
                                              (models/mime.go:6-16)
- tags          <- input tags + classifier keyword for images
                                              (v2_util.go:92)
- extracted_at / extractor_version <- DocData.properties.indexed
                                              (engine/index.go:36-38)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SPAN_KINDS = ("text", "html", "pdf", "image", "media")

# categories — closed enum, reference models/mime.go:6-16
CATEGORY_PDF = "pdf"
CATEGORY_DOCUMENT = "document"
CATEGORY_IMAGE = "image"
CATEGORY_UNKNOWN = "unknown"

IN_SPAN = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),       # payload; base64 for pdf/image
        StructField("media_ref", StringType()),  # stable ref for media spans
        StructField("offset", IntegerType()),    # original position in doc
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("spans", ArrayType(IN_SPAN)),
    ]
)

OUT_SPAN = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),  # == original span offset
    ]
)

EXTRACTED = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("spans", ArrayType(OUT_SPAN)),
        StructField("mime_type", StringType()),
        StructField("category", StringType()),
        StructField("tags", ArrayType(StringType())),
        StructField("display_name", StringType()),
        # per-doc index stamp — DocData.properties.indexed
        # (engine/engine.go:148 time.Now() per doc, engine/index.go:36-38)
        # plus the version that produced it (resume/lineage parity)
        StructField("indexed", TimestampType()),
        StructField("extractor_version", StringType()),
    ]
)

# quarantine rows: reference errors the RPC per doc (v2_util.go:94); a Spark
# job must not die per bad row — bad spans land here instead.
QUARANTINE = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("offset", IntegerType()),
        StructField("kind", StringType()),
        StructField("error", StringType()),
    ]
)

# lineage/checkpoint rows — north_rule: "(input snapshot id, partition id,
# row counts, extractor version)" per partition, enabling exact resume.
LINEAGE = StructType(
    [
        StructField("input_snapshot_id", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("doc_count", LongType()),
        StructField("span_count", LongType()),
        StructField("extractor_version", StringType()),
        StructField("status", StringType()),
        StructField("extracted_at", TimestampType()),
    ]
)
