"""N-gram language-model quality scoring (the CCNet signal).

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model and keeps the low-perplexity head — the single most
widely replicated model-based quality filter in LLM data pipelines
(used by LLaMA, RedPajama, and the CC-derived corpora that followed).
This module is the distributed, self-contained analogue: a **bigram LM
with add-k smoothing trained on the corpus itself** (or any reference
corpus passed as ``train``), scored entirely in Catalyst expressions.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)

per-document score = mean log P over the doc's bigram stream;
perplexity = exp(−mean). Lower perplexity ⇒ more like the training
corpus (CCNet keeps the head of that ranking).

Determinism (the repo's cross-engine convention): a float sum over a
shuffled dataset is order-dependent, so the mean is computed over
**per-bigram quantized integers** — floor(logP·1e6 + 0.5) — whose sum
is exact and executor-count-independent (the classifier.py precedent).
``avg_logprob`` is then (Σq/1e6)/n with one final round; any oracle
must mirror that exact expression shape.

Scale shape (100 TB):

- two map-side-combinable count aggregations (unigram, bigram) — the
  count tables are vocabulary-sized, orders of magnitude smaller than
  the corpus;
- the bigram stream joins those tables on their keys: both joins are
  plain equi-joins AQE will broadcast when the vocab fits (it does for
  natural-language token vocabs) and shuffle-hash otherwise — never a
  corpus×corpus product;
- final per-doc aggregation is one shuffle on doc id;
- at open-web scale the bigram tail is enormous; production KenLM
  prunes it. ``min_count`` drops bigrams with count < min_count from
  the MODEL (a scored doc's pruned bigram then takes the unseen path,
  c=0), bounding the model table the way KenLM pruning does. V
  (vocabulary size) is driver-collected once — one scalar, not data.

Reference parity: the reference engine has no LM tier; this extends
the training-data tier (SURVEY §2 LLM ops) like classifier.py does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lens_spark.functions.hof import transform_u
from lens_spark.functions.text import ws_tokens

#: logprob quantization: floor(logP·Q + 0.5) ints summed exactly
LOGPROB_Q = 1_000_000


def _bigram_structs(tk: Column) -> Column:
    """array<struct<w1,pair>> of adjacent token pairs — JVM-side, empty
    (not NULL) for docs with < 2 tokens."""
    return F.when(
        F.size(tk) >= 2,
        transform_u(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.concat(
                    F.element_at(tk, i), F.lit(" "), F.element_at(tk, i + 1)
                ).alias("pair"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,pair:string>>"))


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.1,
    train: DataFrame | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Per-document bigram-LM score: ``(id, n_bigrams, sum_lp_q,
    avg_logprob, perplexity)``.

    ``train`` is the corpus the model is estimated from (default: ``df``
    itself; the CCNet in-domain setup scores against a *reference*
    corpus — pass a curated slice there; only its ``text_col`` is
    read). Docs with < 2 tokens get ``n_bigrams = 0`` and NULL scores —
    explicitly present, never silently dropped (the curation-report
    invariant).

    ``avg_logprob`` is deterministic across executor counts and engines
    (quantized-integer mean, see module docstring); ``perplexity`` is
    exp(−avg_logprob), monotone in it.
    """
    tdf = train if train is not None else df
    # materialize the token array as a COLUMN before _bigram_structs:
    # its transform lambda references the tokens three times per bigram
    # position, and a naked ws_tokens SUBTREE there is re-evaluated per
    # element (HOF lambdas get no CSE) — the whole-document tokenizer
    # regex ran O(positions) times per doc (r06, the winnow trap)
    ttokd = tdf.select(ws_tokens(F.col(text_col)).alias("tk"))

    uni = (
        ttokd.select(F.explode(F.col("tk")).alias("w1"))
        .groupBy("w1").agg(F.count("*").alias("c1"))
    )
    big = (
        ttokd.select(
            F.explode(_bigram_structs(F.col("tk"))["pair"]).alias("pair")
        )
        .groupBy("pair").agg(F.count("*").alias("cb"))
    )
    if min_count > 1:
        big = big.filter(F.col("cb") >= min_count)  # KenLM-style pruning

    # V: one scalar (vocab size) — a driver literal like the idf stats
    vocab = uni.count()

    stream = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("tk")
    ).select(
        F.col(id_col), F.explode(_bigram_structs(F.col("tk"))).alias("bg")
    ).select(id_col, "bg.w1", "bg.pair")
    lp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)).cast("double") + F.lit(add_k))
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
           + F.lit(add_k * vocab))
    )
    lp_q = F.floor(lp * LOGPROB_Q + F.lit(0.5)).cast("long")
    scored = (
        stream
        .join(big, "pair", "left")
        .join(uni, "w1", "left")
        .select(id_col, lp_q.alias("lp_q"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_q").alias("sum_lp_q"),
        )
    )
    out = df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "sum_lp_q",
    )
    avg = (F.col("sum_lp_q").cast("double") / F.lit(float(LOGPROB_Q))
           ) / F.col("n_bigrams").cast("double")
    return out.select(
        id_col,
        "n_bigrams",
        "sum_lp_q",
        F.when(F.col("n_bigrams") > 0, F.round(avg, 6))
        .alias("avg_logprob"),
        F.when(F.col("n_bigrams") > 0, F.exp(-avg)).alias("perplexity"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    **lm_kwargs,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by corpus-level
    perplexity percentiles (Wenzek et al. 2020 §4.4 — CCNet releases
    each language shard split into the lowest-, middle-, and highest-
    perplexity thirds; training recipes then sample mostly from the
    head).

    Returns ``(id, n_bigrams, avg_logprob, bucket)`` with bucket ∈
    head / middle / tail / unscored. Bucketing compares
    **avg_logprob** (deterministic, see :func:`bigram_lm_scores`) —
    perplexity is exp(−avg_logprob), so high avg_logprob = low
    perplexity = head; the cut points are exact corpus percentiles of
    avg_logprob at ``1−cuts[1]`` and ``1−cuts[0]`` (driver-collected
    literals, one extra aggregation pass — the idf-stats precedent).
    Unscorable docs (< 2 tokens) are labeled, never dropped.

    Scale: exact ``percentile`` buffers the score column once; at
    100 TB switch to ``approx_percentile`` (t-digest, mergeable) — the
    corpus_stats trade, documented there too.
    """
    scored = bigram_lm_scores(df, id_col, text_col, **lm_kwargs)
    lo_q, hi_q = sorted(cuts)
    row = scored.agg(
        # ppl ascending == avg_logprob descending: the ppl lo_q-quantile
        # is the avg_logprob (1-lo_q)-quantile
        F.percentile(F.col("avg_logprob"), F.lit(1.0 - hi_q)).alias("lo"),
        F.percentile(F.col("avg_logprob"), F.lit(1.0 - lo_q)).alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    bucket = (
        F.when(F.col("avg_logprob").isNull(), "unscored")
        .when(F.col("avg_logprob") > F.lit(hi), "head")
        .when(F.col("avg_logprob") > F.lit(lo), "middle")
        .otherwise("tail")
    )
    return scored.select(
        id_col, "n_bigrams", "avg_logprob", bucket.alias("bucket")
    )
