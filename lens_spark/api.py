"""V2-facade: the reference's three RPCs as table-backed batch operations.

Reference surface (v2.go): ``Index`` (v2.go:97), ``Search`` (v2.go:143),
``Remove`` (v2.go:203). The gRPC transport itself is deliberately NOT
replicated (SURVEY.md §2 S7) — on Spark the entrypoint is a job, not a
socket; this facade gives the same verbs over the engine's tables so a
reference user maps 1:1:

    lens = LensV2(spark, store_path)
    lens.index(docs_df)                  # Index RPC, batched
    lens.search(Query(text="..."))      # Search RPC
    lens.remove(["hash1", ...])          # Remove RPC
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from lens_spark.config import ExtractConfig, DEFAULT
from lens_spark.operators.resume import run_resumable
from lens_spark.operators.search import (
    EmptyQueryError, NoResultsError, Query, search_or_raise,
)
from lens_spark.sources.tables import LensTable


def query_hash(q: Query) -> str:
    """Q10 (engine/query.go:30-34): md5 of the JSON-marshaled query —
    cache/lineage key. Field order mirrors the Go struct."""
    payload = json.dumps(
        {
            "Text": q.text,
            "Required": list(q.required),
            "Tags": list(q.tags),
            "Categories": list(q.categories),
            "MimeTypes": list(q.mime_types),
            "Hashes": list(q.hashes),
        },
        separators=(",", ":"),
    )
    return hashlib.md5(payload.encode()).hexdigest()


# CIDv0: base58btc-encoded sha2-256 multihash — always 46 chars starting
# "Qm", base58 alphabet excludes 0, O, I, l. CIDv1: multibase prefix 'b'
# (lowercase base32, RFC 4648 alphabet a-z2-7), the form IPFS emits by
# default. This is the UDF-free regexp subset of go-cid's decode
# (reference source/planetary/utils.go:6-8 → cid.Decode); exotic
# multibases (z-base58 v1, f-hex) belong to ingestion-side validation.
CID_V0_RE = r"Qm[1-9A-HJ-NP-Za-km-z]{44}"
CID_V1_RE = r"b[a-z2-7]{8,112}"


def valid_cid(col):
    """S3 (source/planetary/utils.go:6-8): CID validity as a Catalyst
    regexp — CIDv0 base58btc or CIDv1 base32."""
    return col.isNotNull() & col.rlike(f"^({CID_V0_RE}|{CID_V1_RE})$")


def valid_doc_id(col, require_cid: bool = False):
    """Table-key validity. Default contract: non-empty, no whitespace,
    sane length (the engine accepts any stable key). ``require_cid=True``
    enforces the reference's CID decode (utils.go:6-8) for IPFS-shaped
    corpora."""
    if require_cid:
        return valid_cid(col)
    return (
        col.isNotNull()
        & (F.length(col) > 0)
        & (F.length(col) <= 256)
        & ~col.rlike(r"\s")
    )


class LensV2:
    """Index / Search / Remove over extraction + table layer."""

    def __init__(self, spark: SparkSession, store_path: str,
                 cfg: ExtractConfig = DEFAULT):
        self.spark = spark
        self.cfg = cfg
        self.out = LensTable(os.path.join(store_path, "extracted"))
        self.ckpt = LensTable(os.path.join(store_path, "checkpoint"))
        # failed spans land here instead of failing the RPC the way the
        # reference does per doc (v2_util.go:62-65,94) — batch jobs must
        # keep the error inspectable without dying
        self.quarantine = LensTable(os.path.join(store_path, "quarantine"))

    def index(self, docs: DataFrame, reindex: bool = False,
              snapshot_id: str = "adhoc", require_cid: bool = False) -> int:
        """Index RPC (v2.go:97-140): extract + store. The IsIndexed guard
        (v2_util.go:23-25) is the resume anti-join; ``reindex`` bypasses
        it (engine.go:124-126). Invalid doc_ids are dropped like the CID
        decode error path (utils.go:6-8); ``require_cid=True`` applies
        the full CID-shape check for IPFS corpora."""
        docs = docs.filter(valid_doc_id(F.col("doc_id"), require_cid))
        return run_resumable(
            self.spark, docs, self.out, self.ckpt, snapshot_id,
            cfg=self.cfg, reindex=reindex,
            quarantine_table=self.quarantine,
        )

    def is_indexed(self, doc_id: str) -> bool:
        """M4 (engine.go:160-169) — point probe; batch flows should use
        the anti-join, this exists for API parity."""
        t = self.out.read(self.spark)
        if t is None or not doc_id:
            return False
        return not t.filter(F.col("doc_id") == doc_id).isEmpty()

    def search(self, q: Query):
        """Search RPC (v2.go:143-199): reject empty, run, 0 hits ⇒ error."""
        t = self.out.read(self.spark)
        if t is None:
            raise NoResultsError("no results found")
        return search_or_raise(t, q)

    def remove(self, hashes: list[str]) -> None:
        """Remove RPC (v2.go:203-215): error when absent, else delete."""
        t = self.out.read(self.spark)
        if t is None:
            raise KeyError(f"object '{hashes[0]}' does not exist")
        # bounded by construction: the collect returns at most
        # len(hashes) rows (the isin filter), and `hashes` is an
        # RPC-argument list (the reference takes it per call,
        # v2.go:203-207) — never corpus-sized. Bulk deletions should go
        # through out.delete directly with an anti-join, not this RPC.
        present = {
            r["doc_id"]
            for r in t.filter(F.col("doc_id").isin(hashes))
            .select("doc_id").collect()
        }
        missing = [h for h in hashes if h not in present]
        if missing:
            # v2_util.go:119-122
            raise KeyError(f"object '{missing[0]}' does not exist")
        self.out.delete(self.spark, "doc_id", hashes)


__all__ = ["LensV2", "Query", "query_hash", "valid_doc_id",
           "EmptyQueryError", "NoResultsError"]
