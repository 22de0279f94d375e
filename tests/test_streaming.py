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
