"""Structured Streaming: foreachBatch extraction (micro-batch == the
reference queue's flush semantics) and watermarked window aggregation."""

from __future__ import annotations

from datetime import datetime

from lens_spark.corpus import docs_to_spark, gen_docs
from lens_spark.sources.tables import LensTable
from lens_spark.streaming.stream import stream_extract, windowed_event_counts


def test_stream_extract_available_now(spark, tmp_path):
    rows = gen_docs(12, seed=5, with_edge_rows=False)
    src = str(tmp_path / "src")
    docs_to_spark(spark, rows[:6]).write.parquet(src + "/part1")
    docs_to_spark(spark, rows[6:]).write.parquet(src + "/part2")
    # streaming source reads the directory tree
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    for i, f in enumerate(glob.glob(src + "/part*/*.parquet")):
        shutil.copy(f, f"{flat}/{i}.parquet")

    out = LensTable(str(tmp_path / "out"))
    ckpt = LensTable(str(tmp_path / "ckpt"))
    q = stream_extract(spark, flat, out, ckpt,
                       str(tmp_path / "stream_ckpt"))
    q.awaitTermination(300)
    got = out.read(spark)
    assert got.count() == 12
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in rows
    }
    # lineage carries stream batch ids
    assert ckpt.read(spark).count() >= 1

    # restart with no new files: checkpoint prevents reprocessing
    q2 = stream_extract(spark, flat, out, ckpt,
                        str(tmp_path / "stream_ckpt"))
    q2.awaitTermination(120)
    assert out.read(spark).count() == 12


def test_windowed_event_counts_batch(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 50), 2, "click", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 1, 10), 1, "click", 4.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 20), 3, "buy", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"],
                                                    r["value_sum"])
        for r in windowed_event_counts(df).collect()
    }
    assert got[(0, "click")] == (2, 3.0)
    assert got[(1, "click")] == (1, 4.0)
    assert got[(0, "buy")] == (1, 8.0)


def test_windowed_streaming_with_watermark(spark, tmp_path):
    # the same expression as a real stream with a watermark
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 3, 50), 2, "click", 2.0, "{}"),
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    agg = windowed_event_counts(stream, streaming=True)
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only windows older than the watermark: the 00:00
    # window closed once the 03:50 event advanced the watermark past 02:00
    got = spark.sql("select * from winagg").collect()
    assert {r["window_start"].hour for r in got} == {0}


def test_first_seen_filter_stateful_dedup(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): streaming
    exact-dedup — first batch wins across batches, min(order) wins within
    a batch, per-key state survives between micro-batches."""
    import time

    from lens_spark.streaming.stream import first_seen_filter

    src = str(tmp_path / "src")
    # batch 1: doc a (two rows, order 2 then 1 -> min order emitted), doc b
    spark.createDataFrame(
        [("a", 2, "a-first-batch-o2"), ("a", 1, "a-first-batch-o1"),
         ("b", 5, "b-first")],
        "doc_id string, ord int, payload string",
    ).coalesce(1).write.parquet(src + "/f1")
    # batch 2: duplicate of a (must be dropped by state), new doc c
    spark.createDataFrame(
        [("a", 0, "a-second-batch"), ("c", 9, "c-first")],
        "doc_id string, ord int, payload string",
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id string, ord int, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = first_seen_filter(
        stream, "doc_id", "ord", "doc_id string, ord int, payload string"
    )
    q = (
        out.writeStream.format("memory").queryName("fsf")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("select * from fsf").collect()}
    assert set(rows) == {"a", "b", "c"}
    # within-batch determinism: min(ord) row of the first batch
    assert rows["a"]["payload"] in ("a-first-batch-o1", "a-second-batch")
    # cross-batch state: if file order put f1 first, the dup was dropped
    # (glob order is lexicographic: f1 before f2 -> a-first-batch-o1)
    assert rows["a"]["payload"] == "a-first-batch-o1"
    assert rows["a"]["ord"] == 1


def test_sessionized_events_gap_semantics(spark):
    """Session boundaries: an event exactly at prev_end (= prev_ts +
    gap) still MERGES (session_window's gap comparison is inclusive —
    measured here, mirrored by the oracle's strict ts > prev + gap
    island condition); later events keep extending the end."""
    from datetime import datetime

    from lens_spark.streaming.stream import sessionized_events

    t0 = datetime(2024, 1, 1, 10, 0, 0)

    def at(minutes):
        return datetime(2024, 1, 1, 10, 0, 0).replace(
            hour=10 + (minutes // 60), minute=minutes % 60
        )

    rows = [
        # user 1: 10:00, 10:29 merge (29 < 30); 10:59 == 10:29 + 30min
        # lands exactly on the session end and still merges
        (1, 1, t0, 1.0),
        (2, 1, at(29), 1.0),
        (3, 1, at(59), 1.0),
        # 11:30 is strictly past 10:59 + 30min = 11:29 → new session
        (4, 1, at(90), 1.0),
        # user 2: single event
        (5, 2, at(5), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = [
        (r["user_id"], r["session_start"].minute,
         r["session_end"].minute, r["n_events"])
        for r in sessionized_events(df, gap="30 minutes")
        .orderBy("user_id", "session_start").collect()
    ]
    assert got == [
        (1, 0, 29, 3),   # 10:00-11:29: boundary event merged
        (1, 30, 0, 1),   # 11:30-12:00
        (2, 5, 35, 1),
    ]


def test_streaming_quality_filter(spark, tmp_path):
    """The curation tier's pure-Catalyst quality expressions (C4 +
    Gopher flags, lang id, classifier score) run UNCHANGED on a
    structured stream — stateless map-only stages are
    streaming-compatible by construction, so an ingest pipeline can
    pre-filter junk before it ever lands in the batch corpus."""
    from lens_spark.functions.classifier import classifier_score
    from lens_spark.functions.text import c4_clean, gopher_quality_flags

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "away into the green forest tonight because it was hungry.\n"
    ) * 6
    rows = [
        (1, good),
        (2, "lorem ipsum dolor sit amet."),   # c4 lorem rule
        (3, None),                            # null text
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        src
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src
    )
    from pyspark.sql import functions as F

    c4 = c4_clean(F.col("text"), 3)
    out = stream.select(
        "doc_id",
        F.coalesce(
            (
                (c4["n_kept"] > 0)
                & (c4["has_lorem"] == 0)
                & (c4["has_brace"] == 0)
            ).cast("int"),
            F.lit(0),
        ).alias("c4_keep"),
        F.coalesce(
            gopher_quality_flags(c4["clean_text"])["keep"].cast("int"),
            F.lit(0),
        ).alias("gopher_keep"),
        F.round(classifier_score(c4["clean_text"], dim=256), 4).alias(
            "clf"
        ),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("qual_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r for r in spark.sql(
            "select * from qual_stream"
        ).collect()
    }
    assert got[1]["c4_keep"] == 1 and got[1]["gopher_keep"] == 1
    assert got[2]["c4_keep"] == 0
    assert got[3]["c4_keep"] == 0 and got[3]["gopher_keep"] == 0
    # the scores equal the batch run of the same expressions
    batch = {
        r["doc_id"]: r
        for r in spark.read.parquet(src).select(
            "doc_id",
            F.round(classifier_score(
                c4_clean(F.col("text"), 3)["clean_text"], dim=256
            ), 4).alias("clf"),
        ).collect()
    }
    for i in (1, 2, 3):
        assert got[i]["clf"] == batch[i]["clf"]
