"""Data-mixing operators: temperature-scaled sampling weights and
BPE adjacent-pair counts (operators/mixing.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lens_spark.operators.mixing import bpe_pair_counts, mixture_weights


def _docs(spark):
    rows = [
        (1, "a b c d", "en"),
        (2, "a b", "en"),
        (3, "x y z", "de"),
        (4, "q", "fr"),          # single token: no pairs
        (5, "", "fr"),           # empty: no tokens, no pairs
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_mixture_weights_hand_computed(spark):
    got = {r["lang"]: r for r in mixture_weights(
        _docs(spark), "lang", alpha=0.5).collect()}
    sizes = {"en": 6, "de": 3, "fr": 1}
    total = sum(math.sqrt(s) for s in sizes.values())
    for lang, size in sizes.items():
        assert got[lang]["group_size"] == size
        assert abs(got[lang]["weight"]
                   - round(math.sqrt(size) / total, 6)) < 1e-9
    assert got["en"]["n_docs"] == 2
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-5


def test_mixture_weights_alpha_extremes(spark):
    # alpha=1: proportional to size; alpha=0: uniform over groups
    prop = {r["lang"]: r["weight"] for r in mixture_weights(
        _docs(spark), "lang", alpha=1.0).collect()}
    assert abs(prop["en"] - 0.6) < 1e-6 and abs(prop["fr"] - 0.1) < 1e-6
    unif = {r["lang"]: r["weight"] for r in mixture_weights(
        _docs(spark), "lang", alpha=0.0).collect()}
    assert all(abs(w - round(1 / 3, 6)) < 1e-9 for w in unif.values())


def test_mixture_weights_smooths_toward_uniform(spark):
    # 0 < alpha < 1 sits strictly between proportional and uniform for
    # the dominant group — the whole point of temperature scaling
    w = {r["lang"]: r["weight"] for r in mixture_weights(
        _docs(spark), "lang", alpha=0.5).collect()}
    assert 1 / 3 < w["en"] < 0.6
    assert 0.1 < w["fr"] < 1 / 3


def test_bpe_pair_counts_hand_computed(spark):
    got = {r["pair"]: r["pair_count"]
           for r in bpe_pair_counts(_docs(spark), "text").collect()}
    # doc1: (a b)(b c)(c d); doc2: (a b); doc3: (x y)(y z); docs 4-5 none
    assert got == {"a b": 2, "b c": 1, "c d": 1, "x y": 1, "y z": 1}


def test_bpe_pair_counts_topk_deterministic(spark):
    top = bpe_pair_counts(_docs(spark), "text", top_k=2).collect()
    assert [(r["pair"], r["pair_count"]) for r in top] == [
        ("a b", 2), ("b c", 1),  # count desc, then pair asc on the tie
    ]


def test_bpe_pair_counts_custom_tokens(spark):
    # tokens override: pair stream over a caller-supplied analyzer
    got = bpe_pair_counts(
        _docs(spark).filter(F.col("doc_id") == 1), "text",
        tokens=F.split(F.upper(F.col("text")), " "),
    ).collect()
    assert {r["pair"] for r in got} == {"A B", "B C", "C D"}


def test_sample_mixture_deterministic(spark):
    """sample_mixture equals a python reference of the same rule
    (rounded temperature weight -> capped rate -> md5 bucket) and is
    deterministic across runs; a huge target keeps everything."""
    import hashlib

    from pyspark.sql import functions as F

    from lens_spark.operators.mixing import sample_mixture

    rows = []
    for i in range(40):
        rows.append((i, "en", "word " * 20))
    for i in range(40, 50):
        rows.append((i, "de", "wort " * 10))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    target = 300
    sizes = {"en": 40 * 20, "de": 10 * 10}
    pw = {g: s ** 0.5 for g, s in sizes.items()}
    tot = sum(pw.values())
    exp_keep = set()
    rate_q = {}
    for g, s in sizes.items():
        w = round(pw[g] / tot, 6)
        rate_q[g] = int(min(1.0, w * float(target) / s) * 1e6)
    for i, g, _ in rows:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000000
        if b < rate_q[g]:
            exp_keep.add(i)

    out = sample_mixture(df, "lang", "doc_id", target_tokens=target)
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got == exp_keep and 0 < len(got) < 50
    got2 = {r["doc_id"] for r in
            sample_mixture(df, "lang", "doc_id", target_tokens=target)
            .select("doc_id").collect()}
    assert got2 == got
    # a target far above the corpus keeps every row (rate capped at 1)
    assert sample_mixture(df, "lang", "doc_id", 10**9).count() == 50
    # rate_q audit column matches the integer actually compared
    rq = {r["lang"]: r["rate_q"] for r in
          out.select("lang", "rate_q").distinct().collect()}
    assert rq == rate_q


def test_upsample_mixture_reference(spark):
    """upsample_mixture equals the python reference: floor(rate) full
    copies + one fractional md5-gated copy; epochs 0..n-1; huge target
    upsamples everything > 1 epoch."""
    import hashlib

    from lens_spark.operators.mixing import upsample_mixture

    rows = []
    for i in range(40):
        rows.append((i, "en", "word " * 20))
    for i in range(40, 50):
        rows.append((i, "de", "wort " * 10))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    target = 2000  # > corpus tokens: de (small group) upsamples past 1
    sizes = {"en": 800, "de": 100}
    pw = {g: s ** 0.5 for g, s in sizes.items()}
    tot = sum(pw.values())
    rate_q = {
        g: int(round(pw[g] / tot, 6) * float(target) / s * 1e6 // 1)
        for g, s in sizes.items()
    }
    want = {}
    for i, g, _ in rows:
        b = int(
            hashlib.md5(str(i).encode()).hexdigest()[:8], 16
        ) % 1000000
        n = rate_q[g] // 1000000 + (1 if b < rate_q[g] % 1000000 else 0)
        if n:
            want[i] = list(range(n))
    out = upsample_mixture(df, "lang", "doc_id", target_tokens=target)
    got = {}
    for r in out.select("doc_id", "epoch").collect():
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    assert {k: sorted(v) for k, v in got.items()} == want
    # at least one group genuinely upsampled (epoch >= 1 present)
    assert any(max(v) >= 1 for v in want.values())


def test_stratified_sample_exact_k(spark):
    """stratified_sample returns exactly min(k, group size) rows per
    group — the k smallest (md5 bucket, id) keys, python-verified."""
    import hashlib

    from lens_spark.operators.mixing import stratified_sample

    rows = [(i, "g" + str(i % 3), "t") for i in range(90)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    out = stratified_sample(df, "lang", "doc_id", k=5)
    got = {}
    for r in out.select("doc_id", "lang").collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    for g in ("g0", "g1", "g2"):
        members = [i for i, gg, _ in rows if gg == g]
        key = lambda i: (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1000000,
            i,
        )
        want = set(sorted(members, key=key)[:5])
        assert got[g] == want, g
    # k above group size keeps the whole group
    assert stratified_sample(df, "lang", "doc_id", k=100).count() == 90


class TestCorpusShuffle:
    def _df(self, spark, n=400):
        return spark.createDataFrame(
            [(i, f"t{i}") for i in range(n)], "doc_id long, text string"
        )

    def test_partition_and_determinism(self, spark):
        from lens_spark.operators.mixing import corpus_shuffle

        df = self._df(spark)
        a = corpus_shuffle(df, "doc_id", 8).collect()
        b = corpus_shuffle(df, "doc_id", 8).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # every doc exactly once, pos is 1..n_s dense per shard
        assert len(a) == 400
        by_shard = {}
        for r in a:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert set(by_shard) <= set(range(8))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))

    def test_seed_changes_order_not_membership(self, spark):
        from lens_spark.operators.mixing import corpus_shuffle

        df = self._df(spark)
        a = corpus_shuffle(df, "doc_id", 8, seed="0").collect()
        b = corpus_shuffle(df, "doc_id", 8, seed="1").collect()
        assert {r.doc_id for r in a} == {r.doc_id for r in b}
        assert {(r.doc_id, r.shard, r.pos) for r in a} != {
            (r.doc_id, r.shard, r.pos) for r in b}

    def test_balanced(self, spark):
        from lens_spark.operators.mixing import corpus_shuffle

        counts = [0] * 8
        for r in corpus_shuffle(self._df(spark, 800), "doc_id", 8).collect():
            counts[r.shard] += 1
        assert min(counts) > 60 and max(counts) < 140  # 100 ± sqrt-ish

    def test_executor_count_independent(self, spark):
        from lens_spark.operators.mixing import corpus_shuffle

        df1 = self._df(spark).coalesce(1)
        df4 = self._df(spark).repartition(7)
        a = sorted(map(tuple, corpus_shuffle(df1, "doc_id", 4).collect()))
        b = sorted(map(tuple, corpus_shuffle(df4, "doc_id", 4).collect()))
        assert a == b


class TestQuantileBins:
    def _naive(self, scores, n_bins, scale=1_000_000):
        import math

        cells = {s: math.floor(s * scale + 0.5) for s in scores
                 if s is not None}
        vals = sorted(cells[s] for s in scores if s is not None)
        n = len(vals)
        out = {}
        for s in scores:
            if s is None:
                out[s] = None
                continue
            rank0 = sum(1 for v in vals if v < cells[s])
            out[s] = (rank0 * n_bins) // n
        return out

    def test_equals_naive_rank_rule(self, spark):
        import hashlib

        from lens_spark.operators.mixing import quantile_bins

        scores = []
        for i in range(300):
            h = hashlib.md5(f"qb:{i}".encode()).digest()
            scores.append(round(h[0] / 255.0, 3))  # heavy ties
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(scores)],
            "id long, score double")
        for nb in (2, 10, 7):
            want = self._naive(scores, nb)
            got = {r["score"]: r["qbin"] for r in quantile_bins(
                df, "score", n_bins=nb).collect()}
            assert got == {s: want[s] for s in set(scores)}, nb

    def test_ties_share_bin_nulls_pass_through(self, spark):
        from lens_spark.operators.mixing import quantile_bins

        df = spark.createDataFrame(
            [(1, 0.5), (2, 0.5), (3, 0.5), (4, 0.9), (5, None)],
            "id long, score double")
        got = {r["id"]: r["qbin"] for r in quantile_bins(
            df, "score", n_bins=2).collect()}
        assert got[1] == got[2] == got[3] == 0
        assert got[4] == 1
        assert got[5] is None
        import pytest as _pytest

        with _pytest.raises(ValueError):
            quantile_bins(df, "score", n_bins=0)

    def test_plan_is_broadcast_no_row_window(self, spark):
        # the corpus-side plan must carry NO row-level Window and join
        # the cell→bin map via broadcast (the whole point vs ntile)
        from lens_spark.operators.mixing import quantile_bins

        df = spark.range(1000).selectExpr(
            "id", "cast(id % 97 as double) / 97 as score")
        plan = quantile_bins(df, "score")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        # exactly the two bounded hist windows, nothing partitioned by row
        assert plan.count("Window") <= 2


class TestTopKPerGroup:
    def _naive(self, rows, k):
        # exact rule: per group, score desc then id asc, first k
        out = set()
        groups = {g for _, g, _ in rows}
        for g in groups:
            members = sorted(
                [(i, s) for i, gg, s in rows if gg == g and s is not None],
                key=lambda t: (-t[1], t[0]),
            )
            out |= {i for i, _ in members[:k]}
        return out

    def test_equals_naive_rule_unrounded_scores(self, spark):
        import hashlib

        # scores NOT pre-rounded to the grid: distinct exact values
        # collide into shared cells, exercising the boundary window's
        # exact-order tie-break
        rows = []
        for i in range(400):
            h = hashlib.md5(f"tk:{i}".encode()).digest()
            rows.append((i, f"g{h[2] % 3}",
                         (h[0] * 256 + h[1]) / 65535.0))
        df = spark.createDataFrame(
            rows, "id long, grp string, score double")
        from lens_spark.operators.mixing import top_k_per_group

        for k in (1, 7, 50, 1000):
            got = {r["id"] for r in top_k_per_group(
                df, "grp", "score", k, "id").collect()}
            assert got == self._naive(rows, k), k

    def test_nulls_excluded_validation(self, spark):
        from lens_spark.operators.mixing import top_k_per_group

        df = spark.createDataFrame(
            [(1, "a", 0.9), (2, "a", None), (3, "b", 0.1)],
            "id long, grp string, score double")
        got = {r["id"] for r in top_k_per_group(
            df, "grp", "score", 5, "id").collect()}
        assert got == {1, 3}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            top_k_per_group(df, "grp", "score", 0, "id")
