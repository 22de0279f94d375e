"""V2-facade parity: Index/Search/Remove lifecycle (v2.go semantics) —
the engine-E2E shape of the reference tests (engine_test.go:17-113,
v2_test.go:268-340)."""

from __future__ import annotations

import pytest

from lens_spark.api import LensV2, Query, query_hash, valid_doc_id
from lens_spark.corpus import docs_to_spark, gen_docs
from lens_spark.operators.search import NoResultsError


@pytest.fixture()
def lens(spark, tmp_path):
    return LensV2(spark, str(tmp_path / "store"))


def test_index_search_remove_lifecycle(spark, lens):
    rows = gen_docs(10, seed=13, with_edge_rows=False)
    docs = docs_to_spark(spark, rows)

    assert lens.index(docs) == 10
    assert lens.index(docs) == 0          # IsIndexed guard
    assert lens.index(docs, reindex=True) == 10  # Reindex bypass

    some_id = rows[0]["doc_id"]
    assert lens.is_indexed(some_id)
    assert not lens.is_indexed("nope")
    assert not lens.is_indexed("")        # engine.go:161-163

    hits = lens.search(Query(hashes=[some_id]))
    assert hits[0]["doc_id"] == some_id

    lens.remove([some_id])
    assert not lens.is_indexed(some_id)
    with pytest.raises(KeyError):
        lens.remove([some_id])            # v2_util.go:119-122

    with pytest.raises(NoResultsError):
        lens.search(Query(hashes=["absent"]))


def test_invalid_doc_ids_dropped(spark, lens):
    from lens_spark.schema import DOCUMENTS

    docs = spark.createDataFrame(
        [
            ("ok-id", [("text", "hello world content", None, 1)]),
            ("bad id with spaces", [("text", "x y z", None, 1)]),
            ("", [("text", "empty id", None, 1)]),
        ],
        schema=DOCUMENTS,
    )
    assert lens.index(docs) == 1
    assert lens.is_indexed("ok-id")


def test_index_materializes_tokens_for_search(spark, lens):
    """VERDICT r2 #3: the write path stores content+tokens
    (prepare_search_index wired into run_resumable), so the facade
    search plan over an indexed store contains NO tokenizer split —
    bleve analyzes at index time (engine/index.go:40-60), and at 10^9
    docs per-query re-analysis is the search bottleneck."""
    from lens_spark.operators.search import Query as Q, search
    from lens_spark.plans.inspect import formatted_plan

    docs = docs_to_spark(spark, gen_docs(8, seed=21, with_edge_rows=False))
    lens.index(docs)
    stored = lens.out.read(spark)
    assert "tokens" in stored.columns and "content" in stored.columns
    plan = formatted_plan(search(stored, Q(required=["storage"])))
    assert "split(" not in plan  # no re-tokenization at query time


def test_query_hash_stable():
    q1 = Query(text="a", tags=["t"])
    q2 = Query(text="a", tags=["t"])
    assert query_hash(q1) == query_hash(q2)
    assert query_hash(q1) != query_hash(Query(text="b", tags=["t"]))


def test_valid_doc_id_expr(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("ok",), ("has space",), ("",), ("x" * 300,)], "doc_id string"
    )
    got = [r["doc_id"] for r in
           df.filter(valid_doc_id(F.col("doc_id"))).collect()]
    assert got == ["ok"]


def test_valid_cid(spark):
    """S3 CID shapes (source/planetary/utils.go:6-8 → go-cid decode):
    real v0/v1 CIDs pass, malformed ones fail."""
    from pyspark.sql import functions as F

    from lens_spark.api import valid_cid, valid_doc_id

    cases = [
        # the IPFS "hello world" CIDv0 and its CIDv1 base32 form
        ("QmQPeNsJPyVWPFDVHb77w8G42Fvo15z4bG2X8D2GhfbSXc", True),
        ("bafybeigdyrzt5sfp7udm7hu76uh7y26nf3efuylqabf3oclgtqy55fbzdi", True),
        ("QmQPeNsJPyVWPFDVHb77w8G42Fvo15z4bG2X8D2GhfbSX", False),  # 45 ch
        ("QmQPeNsJPyVWPFDVHb77w8G42Fvo15z4bG2X8D2GhfbS0c", False),  # '0'
        ("qmQPeNsJPyVWPFDVHb77w8G42Fvo15z4bG2X8D2GhfbSXc", False),  # case
        ("bafybeigdyrzt5sfp7udm7hu76uh7y26nf3efuylqabf3oclgtqy55fbzd1", False),  # '1' not base32
        ("", False),
        ("not a cid", False),
        ("doc-123", False),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "doc_id string")
    got = {
        r["doc_id"]: r["ok"]
        for r in df.select(
            "doc_id", valid_cid(F.col("doc_id")).alias("ok")
        ).collect()
    }
    for cid, want in cases:
        assert got[cid] == want, cid
    # default key contract still accepts non-CID stable keys
    assert df.filter(valid_doc_id(F.col("doc_id"))).count() == len(
        [c for c, _ in cases if c and " " not in c]
    )


def test_quarantine_persisted_via_api(spark, lens):
    """A bad span never kills the job (reference errors per RPC,
    v2_util.go:94) — it must land in the quarantine table, tagged with
    the input snapshot, inspectable after the run."""
    rows = gen_docs(4, seed=21, with_edge_rows=False)
    import base64

    ogg = base64.b64encode(b"OggS\x00\x02" + b"\x00" * 40).decode()
    rows.append({
        "doc_id": "doc-bad-kind",
        "spans": [
            {"kind": "text", "text": "fine text span",
             "media_ref": None, "offset": 1},
            # sniffs as audio/ogg → unsupported family → quarantine
            {"kind": "audio", "text": ogg, "media_ref": None, "offset": 2},
        ],
    })
    n = lens.index(docs_to_spark(spark, rows), snapshot_id="snap-q")
    assert n == 5  # the doc still indexes (its text span succeeded)
    q = lens.quarantine.read(spark).collect()
    assert len(q) == 1
    assert q[0]["doc_id"] == "doc-bad-kind"
    assert q[0]["error"] == "unsupported content type for indexing"
    assert q[0]["input_snapshot_id"] == "snap-q"

    # RERUN idempotence (round 4): doc-bad-kind IS indexed (text span
    # succeeded) so nothing is pending; a doc whose spans ALL fail is
    # quarantined ONCE and then anti-joined out of later increments
    # (quarantine-aware resume — no per-increment poison-doc tax), the
    # output table must not churn snapshots on an empty increment, and
    # reindex=True is the explicit retry that refreshes the row.
    rows.append({
        "doc_id": "doc-all-bad",
        "spans": [{"kind": "audio", "text": ogg, "media_ref": None,
                   "offset": 1}],
    })
    for snap in ("snap-q2", "snap-q3"):
        assert lens.index(docs_to_spark(spark, rows),
                          snapshot_id=snap) == 0
    before = lens.out.current_snapshot()
    lens.index(docs_to_spark(spark, rows), snapshot_id="snap-q4")
    assert lens.out.current_snapshot() == before  # no empty MERGE
    q2 = {r["doc_id"]: r for r in lens.quarantine.read(spark).collect()}
    assert set(q2) == {"doc-bad-kind", "doc-all-bad"}  # no dupes
    # quarantined on first sight (snap-q2), then SKIPPED — later
    # increments never re-extract the poison doc
    assert q2["doc-all-bad"]["input_snapshot_id"] == "snap-q2"
    # explicit retry: reindex bypasses the quarantine guard and the
    # MERGE on doc_id:offset updates (not duplicates) the row
    lens.index(docs_to_spark(spark, rows), snapshot_id="snap-q5",
               reindex=True)
    q3 = {r["doc_id"]: r for r in lens.quarantine.read(spark).collect()}
    assert set(q3) == {"doc-bad-kind", "doc-all-bad"}
    assert q3["doc-all-bad"]["input_snapshot_id"] == "snap-q5"
