"""Plan-quality assertions: pushdown, pruning, shuffle budget. These
guard the properties that matter at 100 TB and that no row-level test
can see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.plans.inspect import (
    assert_max_exchanges, assert_pruned_schema, assert_pushed_filter,
    executed_plan, plan_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_filter_pushdown_reaches_scan(docs):
    q = docs.filter(F.col("lang") == "en").select("doc_id")
    assert_pushed_filter(q, "lang")


def test_column_pruning(docs):
    # a 2-column projection must not scan the text column
    q = docs.filter(F.col("doc_id") < 10).select("doc_id", "lang")
    assert_pruned_schema(q, "text")
    assert_pushed_filter(q, "doc_id")


def test_exact_dedup_plan_shape(docs):
    from lens_spark.operators.dedup import exact_dedup

    q = exact_dedup(docs, "doc_id", "text")
    # one shuffle (the groupBy on fingerprint), nothing else
    assert_max_exchanges(q, 1)
    s = plan_stats(q)
    assert s.python_stages == 0, "dedup must stay JVM-side"


def test_search_stays_jvm_side(docs):
    from lens_spark.operators.search import Query, search
    from lens_spark.schema import EXTRACTED

    ext = docs.sparkSession.createDataFrame(
        [("a", [("text", "hello world", None, 1)],
          "text/plain", "document", [], None, None, "v")],
        schema=EXTRACTED,
    )
    q = search(ext, Query(required=["hello"]))
    assert plan_stats(q).python_stages == 0


def test_extract_pipeline_shuffle_budget(spark):
    from lens_spark.benchdata import derive_spans_sqlparity
    from lens_spark.pipeline import extract

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spans = derive_spans_sqlparity(docs.limit(50)).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )
    res = extract(spans)
    s = plan_stats(res.extracted)
    # Single-pass formulation (r06): exactly ONE source subtree — salt
    # exchange + reassembly exchange, nothing else. (The old 5-branch
    # union planned five filtered copies of the scan→sniff subtree whose
    # pushed-down per-branch filters defeated ReuseExchange/AQE stage
    # reuse: 5 scans + 6 sniff evaluations per run, measured.) A jump
    # past budget means an accidental NEW shuffle (join, distinct,
    # repartition). Budget 3 = salt + reassembly + the single-partition
    # exchange this fixture's own .limit(50) inserts.
    assert s.exchanges <= 3, f"exchanges={s.exchanges}"
    # exactly 1 mapInPandas stage (sniff + dispatch + extract in one
    # Python crossing), and no other Python nodes anywhere
    txt = __import__("lens_spark.plans.inspect",
                     fromlist=["formatted_plan"]).formatted_plan(
        res.extracted)
    import re

    assert len(re.findall(r"^\(\d+\) MapInPandas", txt, re.M)) == 1
    assert s.python_stages <= 1, f"python_stages={s.python_stages}"
    # and exactly one scan of the input relation
    assert len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M)) <= 1


def test_similarity_topk_uses_take_ordered(docs):
    from lens_spark.operators.similarity import cosine_topk

    emb = docs.sparkSession.read.parquet(f"{SF}/embeddings.parquet")
    q = cosine_topk(emb, "vec_id", "embedding", [0.1] * 64, k=5)
    from lens_spark.plans.inspect import formatted_plan

    assert "TakeOrderedAndProject" in formatted_plan(q), (
        "top-k should be a heap (TakeOrderedAndProject), not a full sort"
    )


def test_pair_ops_are_join_free_single_scan(docs):
    """Round-2 regression guard: the LSH/banding pair operators must plan
    as ONE scan, ZERO joins (round 1 planned a bucket self-join whose
    broadcast side recomputed the whole signature subtree — stage
    efficiency 0.32 from 8→32 cores). Join-free = the expensive
    shingle/signature/simhash compute exists exactly once in the plan."""
    from lens_spark.operators.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs,
    )
    from lens_spark.plans.inspect import formatted_plan, plan_stats

    mh = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    s = plan_stats(mh)
    assert "Join" not in formatted_plan(mh)
    assert s.scans == 1, f"signature subtree duplicated: {s.scans} scans"
    # repartition (parallelism) + bucket groupBy + distinct
    assert s.exchanges <= 3, f"exchanges={s.exchanges}"
    assert s.python_stages == 0

    sh = simhash_pairs(docs, "doc_id", "text", max_hamming=8)
    s2 = plan_stats(sh)
    assert "Join" not in formatted_plan(sh)
    assert s2.scans == 1
    assert s2.exchanges <= 3

    # jaccard keeps two small aggregate joins (sizes), but the
    # intersection side must not self-join on the exploded shingles —
    # and (round 3) the corpus is scanned exactly ONCE: both consumers
    # of the per-shingle aggregation read its lazy localCheckpoint, so
    # no parquet scan appears in the final plan at all (the one scan
    # happens inside the checkpointed subtree).
    jc = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    txt = formatted_plan(jc)
    import re

    heads = re.findall(r"^\(\d+\) (\w+)", txt, re.M)
    joins = [h for h in heads if "Join" in h]
    assert len(joins) <= 2, f"unexpected joins: {joins}"
    assert "Scan parquet" not in txt, (
        "jaccard re-scans the corpus past the checkpointed aggregation"
    )

    # embedding near-dup pairs (round 3): same join-free contract as
    # minhash/simhash — one scan, zero joins, bucket groupBy only
    from lens_spark.operators.similarity import embedding_neardup_pairs

    emb = docs.sparkSession.read.parquet(f"{SF}/embeddings.parquet")
    ep = embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, num_planes=4, dim=64
    )
    s3 = plan_stats(ep)
    assert "Join" not in formatted_plan(ep)
    assert s3.scans == 1, f"bucket subtree duplicated: {s3.scans} scans"
    # repartition (parallelism) + bucket window/groupBy
    assert s3.exchanges <= 2, f"exchanges={s3.exchanges}"
    assert s3.python_stages == 0


def test_mixing_ops_plan_shape(docs):
    from lens_spark.operators.mixing import bpe_pair_counts, mixture_weights
    from lens_spark.plans.inspect import formatted_plan

    # bpe: one shuffle (the pair groupBy, map-side combined), heap top-k
    q = bpe_pair_counts(docs, "text", top_k=10)
    assert_max_exchanges(q, 1)
    assert "TakeOrderedAndProject" in formatted_plan(q)
    assert plan_stats(q).python_stages == 0

    # mixture: corpus-side agg shuffle + the single-partition window
    # exchange that moves only the one-row-per-group aggregated table
    w = mixture_weights(docs, "lang", alpha=0.5)
    assert_max_exchanges(w, 2)
    assert plan_stats(w).python_stages == 0
    assert_pruned_schema(w, "doc_id")  # only lang+text scanned


def test_dedup_lines_plan_shape(docs):
    from lens_spark.operators.dedup import dedup_lines

    q = dedup_lines(docs.select("doc_id", "text"), "doc_id", "text")
    # line-stats agg + stream join + doc rebuild + input join-back:
    # bounded, no cartesian, no Python
    assert_max_exchanges(q, 6)
    s = plan_stats(q)
    assert s.python_stages == 0
    from lens_spark.plans.inspect import formatted_plan

    p = formatted_plan(q)
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_bigram_lm_plan_shape(docs):
    from lens_spark.operators.lm import bigram_lm_scores
    from lens_spark.plans.inspect import formatted_plan

    q = bigram_lm_scores(docs.select("doc_id", "text"))
    # model-count aggs (2) + stream joins + per-doc agg + base join:
    # bounded exchange budget, no corpus×corpus product, no Python
    assert_max_exchanges(q, 8)
    assert plan_stats(q).python_stages == 0
    p = formatted_plan(q)
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_minhash_map_side_parallelism(spark):
    """A single-file (1-partition) input must not serialize the signature
    stage: ensure_parallelism widens narrow scans to 2x cores."""
    from lens_spark.operators.dedup import ensure_parallelism

    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert d.rdd.getNumPartitions() < 8  # precondition: narrow scan
    widened = ensure_parallelism(d)
    target = 2 * spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() == target
    # already-wide inputs pass through untouched (no coalesce at scale)
    assert ensure_parallelism(widened).rdd.getNumPartitions() == target


def test_map_only_text_ops_have_no_shuffle(docs):
    # c4 cleaning, pii redaction, quantization: pure map-side Catalyst —
    # zero exchanges, zero python stages (the 100 TB contract: these
    # cost one scan, full stop)
    from lens_spark.functions.text import c4_clean, pii_redact

    q = docs.select(
        "doc_id",
        c4_clean(F.col("text")).alias("c4"),
        pii_redact(F.col("text")).alias("pii"),
    )
    s = plan_stats(q)
    assert s.exchanges == 0 and s.python_stages == 0

    emb = docs.sparkSession.read.parquet(f"{SF}/embeddings.parquet")
    from lens_spark.operators.similarity import quantize_int8

    s2 = plan_stats(emb.select(quantize_int8(F.col("embedding"))))
    assert s2.exchanges == 0 and s2.python_stages == 0

    from lens_spark.functions.classifier import classifier_score

    s3 = plan_stats(
        docs.select("doc_id", classifier_score(F.col("text"), dim=64))
    )
    assert s3.exchanges == 0 and s3.python_stages == 0

    from lens_spark.operators.dedup import dedup_lines_in_doc

    s4 = plan_stats(dedup_lines_in_doc(docs, "doc_id", "text"))
    assert s4.exchanges == 0 and s4.python_stages == 0


def test_decontaminate_is_broadcast_only(docs):
    # the corpus side of decontamination must never sort-merge AT THIS
    # SCALE: the benchmark gram set broadcasts (forced — genuinely
    # tiny), and the hit-table join-back is AQE-decided (ADVICE r4: a
    # forced broadcast there blows up when a boilerplate gram flags a
    # large corpus fraction), so broadcast must appear in the FINAL
    # adaptive plan after execution
    from lens_spark.operators.decontam import contamination_flags

    bench = docs.filter(F.col("doc_id") % 50 == 0)
    q = contamination_flags(docs, bench, "doc_id", "text", n=5)
    q.collect()
    # the executed adaptive plan prints Final AND Initial sections —
    # count joins in the final section only
    plan = executed_plan(q).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_pack_sequences_single_group_shuffle(docs):
    from lens_spark.operators.pack import pack_sequences

    d = docs.select(
        "doc_id", "source", F.length("text").alias("n_tok")
    )
    q = pack_sequences(d, "doc_id", "source", "n_tok", 256)
    s = plan_stats(q)
    # one exchange (the group key), one Arrow stage (the packer)
    assert s.exchanges == 1
    assert s.python_stages == 1


def test_cluster_round_is_two_shuffles(spark):
    # one alternating round = large-star groupBy + small-star groupBy;
    # anything more would multiply per-round cost at corpus scale
    from lens_spark.operators.cluster import (
        _canon, _large_star, _small_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "u long, v long"
    )
    round_df = _canon(_small_star(_large_star(edges)))
    s = plan_stats(round_df)
    assert s.python_stages == 0
    # large-star agg + small-star agg + canon distinct = 3 exchanges max
    # (AQE may plan fewer at runtime); the guard is the upper bound
    assert s.exchanges <= 3


def test_duplicate_spans_join_free_two_shuffles(docs):
    """duplicate_spans must stay pure-Catalyst and join-free: one scan,
    no Python stages, and ≤3 exchanges (parallelism repartition +
    window-hash count + doc-id groupBy). A join or a Python stage here
    is a 100 TB regression — the window explosion is the dominant row
    volume in the whole training tier."""
    from lens_spark.operators.dedup import duplicate_spans
    from lens_spark.plans.inspect import formatted_plan, plan_stats

    q = duplicate_spans(docs, "doc_id", "text", k=5)
    s = plan_stats(q)
    assert "Join" not in formatted_plan(q)
    assert s.scans == 1, f"window subtree duplicated: {s.scans} scans"
    assert s.exchanges <= 3, f"exchanges={s.exchanges}"
    assert s.python_stages == 0
    # keep_first adds a row_number over the SAME window-hash key: the
    # ordered Window must reuse the count Window's exchange, not add one
    qk = duplicate_spans(docs, "doc_id", "text", k=5, keep_first=True)
    sk = plan_stats(qk)
    assert "Join" not in formatted_plan(qk)
    assert sk.exchanges <= 3, f"keep_first exchanges={sk.exchanges}"
    assert sk.python_stages == 0


def test_estimated_partitions_plan_level(spark):
    """VERDICT r4: partition-width probing must not build an RDD.
    estimated_partitions reads the plan: topmost exchange wins, file
    scans use Spark's split-packing formula, exotic leaves → None."""
    from lens_spark.plans.inspect import estimated_partitions

    d = spark.read.parquet(f"{SF}/documents.parquet")
    est = estimated_partitions(d)
    # small single-file scan: estimate must agree with the real width
    assert est == d.rdd.getNumPartitions()
    # explicit repartition: the exchange's count, exactly
    assert estimated_partitions(d.repartition(16)) == 16
    assert estimated_partitions(d.groupBy("lang").count().coalesce(1)) \
        is not None
    # non-file leaf: unknown → None (callers assume narrow)
    assert estimated_partitions(spark.range(100)) is None


def test_upsample_and_stratified_plan_shape(docs):
    from lens_spark.operators.mixing import (
        stratified_sample, upsample_mixture,
    )
    from lens_spark.plans.inspect import formatted_plan

    # upsample: the rate table is the only joined relation and it must
    # come in as a broadcast (one row per group) — the corpus side never
    # shuffles; copy expansion is a map-side explode
    q = upsample_mixture(docs, "source", "doc_id", target_tokens=60000)
    p = formatted_plan(q)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert plan_stats(q).python_stages == 0

    # stratified: broadcast threshold join + ONE window; the window's
    # shuffle moves only the pre-filtered sliver (the filter sits below
    # the window exchange in the plan)
    s = stratified_sample(docs, "source", "doc_id", k=5)
    ps = formatted_plan(s)
    assert "BroadcastHashJoin" in ps and "SortMergeJoin" not in ps
    assert ps.count("Window") >= 1
    assert plan_stats(s).python_stages == 0


def test_dsir_fit_bounded_and_scoring_maponly(docs):
    from lens_spark.functions.dsir import dsir_log_weight, ngram_buckets
    from lens_spark.plans.inspect import formatted_plan

    # fit-side count query: explode + groupBy on <= dim keys, no join
    cnt = (
        docs.select(F.explode(ngram_buckets(F.col("text"), 64)).alias("b"))
        .groupBy("b").count()
    )
    assert_max_exchanges(cnt, 2)
    assert "Join" not in formatted_plan(cnt)

    # scoring: literal ratio table -> zero exchange, zero join
    q = docs.select(
        dsir_log_weight(F.col("text"), [0] * 64, 64).alias("w")
    )
    p = formatted_plan(q)
    assert "Exchange" not in p and "Join" not in p
    assert plan_stats(q).python_stages == 0


def test_kmeans_iteration_and_semdedup_plan_shape(spark):
    """The semantic-dedup tier's scale contract: each kmeans update is
    ONE map-side-combined shuffle over the quantized scan (the k·dim
    collect is model-sized); semdedup's flag side adds only the cluster
    groupBy and the capped-prefix re-attach join — no cartesian, no
    Python, no row-level window anywhere."""
    from lens_spark.operators.semdedup import (
        _assign, embedding_kmeans_model, quantize_grid, semdedup,
    )
    from lens_spark.plans.inspect import formatted_plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.select(
        F.col("vec_id").alias("id"),
        quantize_grid(F.col("embedding")).alias("q"),
    )
    _, cents = embedding_kmeans_model(
        emb, "vec_id", "embedding", k=4, iters=0, pin=False
    )
    # the per-iteration update aggregation: posexplode is map-only, the
    # (cluster, dim) groupBy is the single exchange, partial agg present
    upd = (
        base.select(_assign(F.col("q"), cents).alias("__c"), "q")
        .select("__c", F.posexplode("q").alias("pos", "val"))
        .groupBy("__c", "pos")
        .agg(F.sum("val"), F.count(F.lit(1)))
    )
    assert_max_exchanges(upd, 1)
    s = plan_stats(upd)
    assert s.python_stages == 0
    p = formatted_plan(upd)
    assert p.count("HashAggregate") >= 2, "map-side combine missing"

    q = semdedup(emb, "vec_id", "embedding", k=4, iters=0, tau=0.9)
    p = formatted_plan(q)
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "Window" not in p
    assert plan_stats(q).python_stages == 0
    # cluster groupBy (+AQE-decided re-attach join) — bounded budget
    assert_max_exchanges(q, 4)


def test_token_budget_and_quantile_bins_plan_shape(docs):
    """The two global-order-free selection ops: corpus-side work is one
    map-side-combined histogram shuffle; every Window in the plan runs
    on the TINY aggregated table (hist/bucket rows), never partitioned
    by corpus row; assignment joins back via broadcast."""
    from lens_spark.functions.text import quality_score, token_count_ws
    from lens_spark.operators.mixing import (
        quantile_bins, token_budget_select,
    )
    from lens_spark.plans.inspect import formatted_plan

    d = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
    )
    qb = quantile_bins(d, "quality", n_bins=10)
    p = formatted_plan(qb)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert plan_stats(qb).python_stages == 0

    tb = token_budget_select(d, "doc_id", "quality", "n_tokens", 10_000)
    p = formatted_plan(tb)
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "SortMergeJoin" not in p  # bucket map joins via broadcast
    assert plan_stats(tb).python_stages == 0
