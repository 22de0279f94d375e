"""Bigram-LM quality scoring (operators/lm.py) — the CCNet signal."""

from __future__ import annotations

import math

from lens_spark.operators.lm import LOGPROB_Q, bigram_lm_scores


def _q(x: float) -> int:
    return math.floor(x * LOGPROB_Q + 0.5)


def test_bigram_lm_hand_computed(spark):
    # corpus: uni a=3 b=3 z=1 (V=3); bigrams 'a b'=3, 'b a'=1
    rows = [(1, "a b a b"), (2, "a b"), (3, "z"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(
        df, "doc_id", "text", add_k=0.5).collect()}

    k, v = 0.5, 3
    lp_ab = math.log((3 + k) / (3 + k * v))
    lp_ba = math.log((1 + k) / (3 + k * v))
    assert got[1]["n_bigrams"] == 3
    assert got[1]["sum_lp_q"] == 2 * _q(lp_ab) + _q(lp_ba)
    want_avg = round(((2 * _q(lp_ab) + _q(lp_ba)) / LOGPROB_Q) / 3, 6)
    assert abs(got[1]["avg_logprob"] - want_avg) < 1e-12
    assert abs(got[1]["perplexity"]
               - math.exp(-got[1]["avg_logprob"])) < 1e-6
    assert got[2]["sum_lp_q"] == _q(lp_ab)

    # <2-token and null-text docs are PRESENT with explicit zero/null —
    # the no-silent-drops invariant
    for d in (3, 4):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["sum_lp_q"] is None
        assert got[d]["avg_logprob"] is None


def test_bigram_lm_ranks_in_domain_text_lower_ppl(spark):
    # the CCNet property: text resembling the corpus scores lower
    # perplexity than shuffled/out-of-domain junk
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in
            range(10)]
    rows = base + [(100, "the quick brown fox"), (101, "dog the over qq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["perplexity"]
           for r in bigram_lm_scores(df).collect()}
    assert got[100] < got[101]


def test_bigram_lm_train_corpus_and_pruning(spark):
    train = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "x y"), (11, "a b")], "doc_id long, text string")

    got = {r["doc_id"]: r for r in bigram_lm_scores(
        score, train=train, add_k=0.5, min_count=2).collect()}
    # 'x y' (count 3) survives pruning; 'a b' (count 1) is pruned from
    # the model, so doc 11 takes the unseen path (cb -> 0)
    k, v = 0.5, 4  # vocab: x y a b
    lp_xy = math.log((3 + k) / (3 + k * v))
    lp_ab_pruned = math.log((0 + k) / (1 + k * v))
    assert got[10]["sum_lp_q"] == _q(lp_xy)
    assert got[11]["sum_lp_q"] == _q(lp_ab_pruned)
    assert got[10]["perplexity"] < got[11]["perplexity"]


def test_perplexity_buckets_ccnet_split(spark):
    from lens_spark.operators.lm import perplexity_buckets

    # 9 scorable docs in three distinct perplexity classes (in-domain
    # repeats, mixed, alien vocabulary) + 1 unscorable
    common = "the cat sat on the mat and the dog ran off today."
    rows = (
        [(i, common) for i in range(3)]
        + [(i, common + " some rarer words appear here too.")
           for i in range(10, 13)]
        + [(i, f"zz{i} qq{i} xx{i} vv{i} ww{i} uu{i}")
           for i in range(20, 23)]
        + [(30, "one")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(df).collect()}
    assert got[30] == "unscored"
    assert all(got[i] == "head" for i in range(3))
    assert all(got[i] == "middle" for i in range(10, 13))
    assert all(got[i] == "tail" for i in range(20, 23))


def test_bigram_lm_executor_count_invariance(spark):
    # the quantized-integer sum is partition-layout independent
    rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["sum_lp_q"] for r in bigram_lm_scores(
        df.repartition(1)).collect()}
    b = {r["doc_id"]: r["sum_lp_q"] for r in bigram_lm_scores(
        df.repartition(16)).collect()}
    assert a == b
