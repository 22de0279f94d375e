"""Training-tier throughput snapshot (supplement to bench.py — the
driver's headline metric stays the extraction pipeline; this measures
the round-4 training-data operators at sf0.1 so their cost is on
record, same best-of-N + /proc/stat methodology).

Usage: python BENCH/training_bench.py [sf_dir]   (default sf0.1)
Prints ONE JSON line {"metric": "training_ops_total_wall", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("LENS_DRIVER_MEM", "24g")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pyspark.sql import functions as F

    from lens_spark.curate import curate
    from lens_spark.functions.classifier import (
        classifier_features, classifier_score,
    )
    from lens_spark.operators.dedup import (
        duplicate_spans, remove_duplicate_spans,
    )
    from lens_spark.operators.pack import chunk_documents
    from lens_spark.session import get_spark

    spark = get_spark(app="lens-training-bench", cores=cores)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    timings: dict[str, float] = {}
    extra: dict = {"n_docs": n_docs, "cores": cores}
    warm = int(os.environ.get("BENCH_WARM", "1"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    def _cpu():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:9]))
        return {"user": v[0], "system": v[2], "steal": v[7]}

    def timed(name: str, fn) -> None:
        for _ in range(warm):
            fn()
        samples, cpus = [], []
        for _ in range(reps):
            c0, t0 = _cpu(), time.time()
            fn()
            samples.append(time.time() - t0)
            c1 = _cpu()
            cpus.append({k: round((c1[k] - c0[k]) / 100.0, 1)
                         for k in c0})
        best = min(range(len(samples)), key=lambda i: samples[i])
        timings[name] = round(samples[best], 3)
        extra[f"cpu_{name}"] = cpus[best]

    # plans built once (driver-side construction excluded, as bench.py)
    q_spans = duplicate_spans(docs, "doc_id", "text", k=15)
    q_clean = remove_duplicate_spans(docs, "doc_id", "text", k=15)
    q_chunk = chunk_documents(docs, "doc_id", "text",
                              max_tokens=32, overlap=8)
    f = classifier_features(F.col("text"), dim=256)
    q_clf = docs.select(
        "doc_id",
        f["sum_w"].alias("sum_w"),
        f["n_tok"].alias("n_tok"),
        classifier_score(F.col("text"), dim=256).alias("prob"),
    )
    # The raw synthetic corpus is punctuation-free word salad — C4's
    # terminal-punctuation line rule drops every document and the rest
    # of the chain would run on empty. A "webby" wrapper (terminal
    # period + a stop-word tail) lets the docs reach the dedup /
    # classifier / ExactSubstr stages so curate_full measures the whole
    # flow; attrition still shows in curated_rows.
    webby = docs.withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" and that is all of it today.")),
    )
    q_curate = curate(
        webby, classifier_min=0.45, exactsubstr_k=15
    ).curated

    # Force the FULL computation per query: a bare count() lets Catalyst
    # eliminate the work being measured (unique-key left joins drop out
    # of counts entirely, projections prune the scored columns), so each
    # probe aggregates over the computed outputs instead.
    def rows_and_bytes(q, text_cols):
        r = q.agg(
            F.count("*").alias("n"),
            *[F.sum(F.length(F.col(c))).alias(f"b_{i}")
              for i, c in enumerate(text_cols)],
        ).collect()[0]
        return int(r["n"])

    timed("duplicate_spans", lambda: extra.__setitem__(
        "spans_rows",
        int(q_spans.agg(F.count("*").alias("n"),
                        F.sum("span_end").alias("s"))
            .collect()[0]["n"])))
    timed("remove_duplicate_spans", lambda: extra.__setitem__(
        "clean_rows", rows_and_bytes(q_clean, ["text"])))
    timed("chunk_docs", lambda: extra.__setitem__(
        "chunk_rows", rows_and_bytes(q_chunk, ["chunk_text"])))
    timed("classifier_quality", lambda: extra.__setitem__(
        "clf_rows",
        int(q_clf.agg(F.count("*").alias("n"),
                      F.sum("sum_w").alias("s"),
                      F.sum("prob").alias("p")).collect()[0]["n"])))
    timed("curate_full", lambda: extra.__setitem__(
        "curated_rows", rows_and_bytes(q_curate, ["text"])))

    # round-5 ops: full BPE training (the merge loop IS the work — no
    # pre-built plan to reuse), BPE application, DSIR fit+score
    from lens_spark.functions.dsir import (
        dsir_log_ratios, dsir_log_weight,
    )
    from lens_spark.operators.bpe import apply_bpe, learn_bpe

    def run_bpe_learn():
        extra["bpe_merges"] = len(
            learn_bpe(docs, "text", n_merges=30, min_count=2)
        )

    timed("bpe_learn30", run_bpe_learn)
    merges = learn_bpe(docs, "text", n_merges=30, min_count=2)
    q_apply = apply_bpe(docs, merges, "text").select(
        F.size("bpe_tokens").alias("n")
    )
    timed("bpe_apply", lambda: extra.__setitem__(
        "bpe_tokens_total",
        int(q_apply.agg(F.sum("n").alias("s")).collect()[0]["s"])))

    target = docs.filter(F.col("doc_id") % 10 == 0)

    def run_dsir():
        lr = dsir_log_ratios(target, docs, "text", dim=512)
        r = docs.select(
            dsir_log_weight(F.col("text"), lr, 512).alias("w")
        ).agg(F.sum("w").alias("s")).collect()[0]
        extra["dsir_wsum"] = int(r["s"])

    timed("dsir_fit_score", run_dsir)

    total = round(sum(timings.values()), 3)
    extra["docs_per_sec_curate"] = (
        round(n_docs / timings["curate_full"], 1)
        if timings.get("curate_full") else None
    )
    print(json.dumps({
        "metric": "training_ops_total_wall", "value": total,
        "unit": "sec", "queries": timings,
        "sf": float(os.path.basename(sf_dir.rstrip("/"))[2:] or 0),
        "extra": extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
