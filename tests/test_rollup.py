"""Continuous-aggregate rollup (operators/rollup.py): incremental
maintenance equals the one-shot aggregate, the point read is actually
bucket-pruned, and snapshots time-travel."""
from __future__ import annotations

from pyspark.sql import functions as F

from lens_spark.operators.rollup import (
    ROLLUP_KEY,
    rollup_increment,
    rollup_maintain,
)
from lens_spark.sources.tables import LensTable


def _events(spark, n=300):
    rows = [
        (i, f"2026-01-01 {i % 24:02d}:{i % 60:02d}:00",
         i % 7, (i * 37) % 200 - 50)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, tss string, user_id long, vc long"
    ).withColumn("ts", F.col("tss").cast("timestamp")).drop("tss")


def test_incremental_equals_oneshot(spark, tmp_path):
    ev = _events(spark)
    t = LensTable(str(tmp_path / "rollup"))
    for part in range(3):
        inc = ev.filter(F.col("event_id") % 3 == part)
        rollup_maintain(
            t, rollup_increment(inc, "ts", 3600, ["user_id"], "vc"),
            ["user_id"])
    got = {
        (r.window_start, r.user_id): (r.n, r.sum_m, r.min_m, r.max_m)
        for r in t.read(spark).collect()
    }
    oneshot = rollup_increment(ev, "ts", 3600, ["user_id"], "vc")
    want = {
        (r.window_start, r.user_id): (r.n, r.sum_m, r.min_m, r.max_m)
        for r in oneshot.collect()
    }
    assert got == want
    # negatives exercised (min below zero somewhere)
    assert any(v[2] < 0 for v in want.values())


def test_point_read_is_bucket_pruned(spark, tmp_path):
    ev = _events(spark, 500)
    t = LensTable(str(tmp_path / "rollup"))
    rollup_maintain(
        t, rollup_increment(ev, "ts", 3600, ["user_id"], "vc"),
        ["user_id"])
    full_files = set(t.read(spark).inputFiles())
    one_key = t.read(spark).select(ROLLUP_KEY).limit(1)
    pruned = t.read_for_keys(spark, one_key, ROLLUP_KEY)
    assert pruned is not None
    assert len(set(pruned.inputFiles())) < len(full_files)


def test_snapshots_time_travel_over_folds(spark, tmp_path):
    ev = _events(spark, 200)
    t = LensTable(str(tmp_path / "rollup"))
    s1 = rollup_maintain(
        t,
        rollup_increment(
            ev.filter("event_id < 100"), "ts", 3600, ["user_id"], "vc"
        ),
        ["user_id"])
    s2 = rollup_maintain(
        t,
        rollup_increment(
            ev.filter("event_id >= 100"), "ts", 3600, ["user_id"], "vc"
        ),
        ["user_id"])
    assert s1 != s2
    n_before = t.read(spark, snapshot=s1).agg(F.sum("n")).collect()[0][0]
    n_after = t.read(spark).agg(F.sum("n")).collect()[0][0]
    assert n_before == 100 and n_after == 200


def test_stream_rollup_equals_batch_and_is_replay_safe(spark, tmp_path):
    """Stream-fed rollup (streaming/stream.py stream_rollup): the
    availableNow pass over a 2-file source equals the one-shot
    aggregate, and re-running over the same checkpoint (or a
    redelivered batch id) folds nothing twice."""
    from lens_spark.streaming.stream import stream_rollup

    ev = _events(spark, 240)
    src = str(tmp_path / "src")
    ev.filter("event_id < 120").coalesce(1).write.parquet(
        src, mode="append")
    ev.filter("event_id >= 120").coalesce(1).write.parquet(
        src, mode="append")
    t = LensTable(str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, vc long, ts timestamp"

    q = stream_rollup(
        spark, src, t, ckpt, schema,
        ts_col="ts", every_seconds=3600, by=["user_id"], measure="vc",
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.user_id): (r.n, r.sum_m)
        for r in t.read(spark).collect()
    }
    want = {
        (r.window_start, r.user_id): (r.n, r.sum_m)
        for r in rollup_increment(
            ev, "ts", 3600, ["user_id"], "vc").collect()
    }
    assert got == want

    # replay: same checkpoint -> no new batches -> unchanged
    q2 = stream_rollup(
        spark, src, t, ckpt, schema,
        ts_col="ts", every_seconds=3600, by=["user_id"], measure="vc",
    )
    q2.awaitTermination(120)
    after = {
        (r.window_start, r.user_id): (r.n, r.sum_m)
        for r in t.read(spark).collect()
    }
    assert after == want


def test_rollup_job_run_batch_and_stream(spark, tmp_path):
    """The spark-submit rollup job in-process: per-increment batch
    folds accumulate, and --stream mode over the same source matches."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "rollup_job",
        _os.path.join(_os.path.dirname(__file__), "..", "jobs",
                      "rollup_job.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    ev = _events(spark, 200).withColumn(
        "value", (F.col("vc") / 100.0))  # float measure for --cents
    inc1 = str(tmp_path / "inc1")
    inc2 = str(tmp_path / "inc2")
    ev.filter("event_id < 100").write.parquet(inc1)
    ev.filter("event_id >= 100").write.parquet(inc2)

    out_b = str(tmp_path / "batch")
    r1 = job.run(spark, inc1, out_b, every=3600, by=["user_id"],
                 measure="value", cents=True)
    r2 = job.run(spark, inc2, out_b, every=3600, by=["user_id"],
                 measure="value", cents=True)
    assert r2["total_n"] == 200 and r2["snapshot"] != r1["snapshot"]

    src = str(tmp_path / "srcall")
    ev.write.parquet(src)
    out_s = str(tmp_path / "stream")
    rs = job.run(spark, src, out_s, every=3600, by=["user_id"],
                 measure="value", cents=True, stream=True)
    assert rs["mode"] == "stream" and rs["total_n"] == 200
    assert rs["cells"] == r2["cells"]
    ba = {
        (r.window_start, r.user_id): (r.n, r.sum_m)
        for r in LensTable(f"{out_b}/rollup").read(spark).collect()
    }
    st = {
        (r.window_start, r.user_id): (r.n, r.sum_m)
        for r in LensTable(f"{out_s}/rollup").read(spark).collect()
    }
    assert ba == st

    # ADVICE r5 (high): re-running the SAME --stream --cents invocation
    # (the documented cron usage) must be a no-op — the old restage-
    # per-run approach minted fresh part files each run, so the
    # checkpoint re-read the whole history and double-counted it
    rs2 = job.run(spark, src, out_s, every=3600, by=["user_id"],
                  measure="value", cents=True, stream=True)
    assert rs2["total_n"] == 200, "stream rerun double-counted"
    assert rs2["cells"] == rs["cells"]
