"""Training-data pipeline operators: text analysis, dedup families,
similarity search."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lens_spark.functions.text import (
    fingerprint, lang_id, quality_score, token_count_bpe, token_count_ws,
)
from lens_spark.operators.dedup import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash64,
    simhash_pairs, word_shingles,
)
from lens_spark.operators.similarity import (
    ann_lsh_topk, cosine_topk, embedding_neardup_pairs, hyperplane_signs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (4, "der hund ist nicht der gleiche und das ist gut"),
    (5, "le chat est dans la maison et il est content pour toujours"),
    (6, "completely different content about spark shuffles and partitions"),
    (7, "THE  Quick   Brown fox jumps over the lazy dog again and again"),  # exact dup modulo normalization
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id int, text string")


def test_text_functions(docs):
    rows = {
        r["id"]: r
        for r in docs.select(
            "id",
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
            token_count_ws(F.col("text")).alias("ws"),
            token_count_bpe(F.col("text")).alias("bpe"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert rows[1]["lang"] == "en"
    assert rows[4]["lang"] == "de"
    assert rows[5]["lang"] == "fr"
    assert rows[1]["ws"] == 12
    assert 0 < rows[1]["q"] <= 1
    # normalization: 1 and 7 share a fingerprint
    assert rows[1]["fp"] == rows[7]["fp"]
    assert rows[1]["fp"] != rows[3]["fp"]
    # md5 parity with Python (the oracle relies on this)
    norm = "the quick brown fox jumps over the lazy dog again and again"
    assert rows[1]["fp"] == hashlib.md5(norm.encode()).hexdigest()


def test_exact_dedup(docs):
    groups = exact_dedup(docs, "id", "text").collect()
    by_rep = {r["rep_id"]: r["dup_count"] for r in groups}
    assert by_rep[1] == 3  # ids 1, 2, 7
    assert sum(by_rep.values()) == 7


def test_shingles(spark):
    row = spark.range(1).select(
        word_shingles(F.lit("a b c d"), 3).alias("s")
    ).collect()[0]
    assert row["s"] == ["a b c", "b c d"]
    short = spark.range(1).select(
        word_shingles(F.lit("a b"), 3).alias("s")
    ).collect()[0]
    assert short["s"] == ["a b"]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "id", "text").collect()
    }
    assert (1, 2) in pairs and (1, 7) in pairs and (2, 7) in pairs
    assert (1, 3) in pairs  # one-word change shares most shingles
    assert not any(6 in p for p in pairs)


def test_simhash_near_dups(docs):
    sh = {
        r["id"]: r["sh"]
        for r in docs.select(
            "id", simhash64(F.col("text")).alias("sh")
        ).collect()
    }
    assert sh[1] == sh[2] == sh[7]
    assert bin(sh[1] ^ sh[3]).count("1") <= 6  # near dup: small hamming
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, "id", "text").collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 7)] == 0
    assert not any(6 in p for p in pairs)


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "id", "text",
                                     threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs


VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
    (5, [0.95, 0.05, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<float>")


def test_cosine_topk(vecs):
    got = cosine_topk(vecs, "vec_id", "embedding", [1.0, 0.0, 0.0, 0.0],
                      k=3).collect()
    assert [r["id"] for r in got] == [1, 5, 2]
    assert got[0]["score"] == 1.0


def test_ann_lsh_topk_subset_of_brute_force(vecs):
    q = [1.0, 0.0, 0.0, 0.0]
    ann = ann_lsh_topk(vecs, "vec_id", "embedding", q, k=3, num_planes=2)
    got = [r["id"] for r in ann.collect()]
    assert 1 in got          # the exact hit shares every hyperplane side
    assert 4 not in got      # the antipode never lands in the same bucket


def test_embedding_neardup(vecs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            vecs, "vec_id", "embedding", threshold=0.95, num_planes=2
        ).collect()
    }
    assert (1, 5) in pairs
    assert all({a, b} != {1, 4} for a, b in pairs)


def test_pair_structs_exhaustive(spark):
    """The join-free pairing primitive, exhaustively: for every sorted
    id array of size 2..8 (plus ragged/string ids), pair_structs emits
    exactly n(n-1)/2 structs, each a<b, no duplicates — ONE Spark job
    over all cases. Every pair operator (minhash/simhash/jaccard/
    embedding) rides on this."""
    from itertools import combinations

    from lens_spark.operators.dedup import pair_structs

    cases = [[f"id{j:02d}" for j in range(n)] for n in range(2, 9)]
    cases.append(["a", "b", "zz", "zzz"])
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_no int, ids array<string>",
    )
    got = {
        r["case_no"]: [(p["a"], p["b"]) for p in r["p"]]
        for r in df.select(
            "case_no", pair_structs(F.col("ids")).alias("p")
        ).collect()
    }
    for i, c in enumerate(cases):
        want = list(combinations(c, 2))
        assert got[i] == want, f"case {i}"
        assert len(set(got[i])) == len(c) * (len(c) - 1) // 2


def test_embedding_neardup_bucket_cap(spark):
    """A cluster of near-identical embeddings lands in ONE hyperplane
    bucket; the cap must drop it (0 pairs) instead of materializing
    n(n-1)/2 structs in one aggregation row — and a cap above the
    bucket size must leave results identical to uncapped."""
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    capped = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.5, num_planes=2, dim=4,
        max_bucket=10,
    )
    assert capped.count() == 0
    loose = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.99, num_planes=2, dim=4,
        max_bucket=200,
    )
    assert loose.count() == 30 * 29 // 2  # quadratic only when allowed


def test_simhash_hot_key_cap(spark):
    """Many identical docs share every simhash band key: the bucket cap
    must drop the hot keys (ADVICE r2 — one aggregation row would
    otherwise materialize n(n-1)/2 pair structs)."""
    rows = [(i, "identical boilerplate text repeated everywhere always")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id int, text string")
    assert simhash_pairs(df, "id", "text", max_hamming=3,
                         max_bucket=10).count() == 0
    assert simhash_pairs(df, "id", "text", max_hamming=3,
                         max_bucket=200).count() == 30 * 29 // 2


def test_gopher_quality_rules(spark):
    """Gopher filter rules (Rae et al. 2021 App. A.1.1) on crafted docs:
    each rule must fire on the doc built to violate it and pass on a
    clean doc; repetition ratios must count duplicate lines/3-grams."""
    from pyspark.sql import functions as F

    from lens_spark.functions.text import (
        gopher_quality_flags, gopher_quality_metrics, repetition_ratios,
    )

    clean = ("the quick brown fox jumps over the lazy dog and then "
             "continues to run with great speed because it must have "
             "been chased by something that it feared deeply ") * 3
    bullets = "\n".join(f"- bullet item {i}" for i in range(10))
    ellipses = "\n".join(f"line that trails off {i}..." for i in range(10))
    symbols = "# " * 60
    short = "too short"
    no_stop = "alpha beta gamma delta " * 20
    dup_lines = "\n".join(["same line of text"] * 8 + ["unique line"])

    rows = [("clean", clean), ("bullets", bullets),
            ("ellipses", ellipses), ("symbols", symbols),
            ("short", short), ("nostop", no_stop),
            ("duplines", dup_lines)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            gopher_quality_flags(F.col("text")).alias("fl"),
            gopher_quality_metrics(F.col("text")).alias("m"),
            repetition_ratios(F.col("text"), 3).alias("rep"),
        ).collect()
    }

    assert out["clean"]["fl"]["keep"]
    assert not out["bullets"]["fl"]["bullet_ok"]
    assert not out["ellipses"]["fl"]["ellipsis_ok"]
    assert not out["symbols"]["fl"]["symbol_ratio_ok"]
    assert not out["symbols"]["fl"]["alpha_ok"]  # '#' words, no letters
    assert not out["short"]["fl"]["word_count_ok"]
    assert not out["nostop"]["fl"]["stop_ok"]
    assert out["nostop"]["m"]["stop_hits"] == 0
    assert out["clean"]["m"]["stop_hits"] >= 2

    # repetition: 8 of 9 lines are the same → 7 duplicate occurrences
    assert abs(out["duplines"]["rep"]["dup_line_frac"] - 7 / 9) < 1e-9
    # clean text repeats its sentence 3x → heavy 3-gram duplication
    assert out["clean"]["rep"]["dup_ngram_frac"] > 0.5
    assert out["short"]["rep"]["dup_ngram_frac"] == 0.0


def test_cap_drops_are_observable(spark):
    """ADVICE r3: over-cap truncation must be metered, not silent. The
    Observation metrics ride the caller's action (no extra pass) and
    report the rows living in over-cap groups plus the largest group.
    The all-dropped case needs AQE_EMPTY_RELATION_RULE excluded (the
    collapsed empty plan otherwise eliminates the metrics node —
    measured Spark 4.1 behavior); cap_metrics() tolerates the drop."""
    from pyspark.sql import Observation

    from lens_spark.operators.dedup import (
        AQE_EMPTY_RELATION_RULE, cap_metrics,
    )

    rows = [(i, "identical boilerplate text repeated everywhere always")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id int, text string")
    vrows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(30)]
    vdf = spark.createDataFrame(vrows,
                                "vec_id int, embedding array<float>")

    conf_key = "spark.sql.adaptive.optimizer.excludedRules"
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, AQE_EMPTY_RELATION_RULE)
    try:
        obs = Observation("simhash-caps")
        out = simhash_pairs(df, "id", "text", max_hamming=3,
                            max_bucket=10, observation=obs)
        assert out.count() == 0
        m = cap_metrics(obs)
        # 30 identical docs × 4 bands (max_hamming=3), every key over-cap
        assert m["simhash_rows_in_overcap_groups"] == 30 * 4
        assert m["simhash_max_group_size"] == 30

        obs2 = Observation("emb-caps")
        assert embedding_neardup_pairs(
            vdf, "vec_id", "embedding", threshold=0.5, num_planes=2,
            dim=4, max_bucket=10, observation=obs2,
        ).count() == 0
        m2 = cap_metrics(obs2)
        assert m2["emb_neardup_rows_in_overcap_groups"] == 30
        assert m2["emb_neardup_max_group_size"] == 30
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)

    # under-cap: metrics report zero dropped (results unchanged), and no
    # AQE exclusion is needed because the plan never collapses
    obs3 = Observation("simhash-caps-ok")
    n = simhash_pairs(df, "id", "text", max_hamming=3, max_bucket=200,
                      observation=obs3).count()
    assert n == 30 * 29 // 2
    assert cap_metrics(obs3)["simhash_rows_in_overcap_groups"] == 0

    # without the exclusion, an all-dropped plan may lose the metrics
    # row; cap_metrics degrades to None instead of raising
    obs4 = Observation("simhash-caps-collapsed")
    assert simhash_pairs(df, "id", "text", max_hamming=3, max_bucket=10,
                         observation=obs4).count() == 0
    assert cap_metrics(obs4) in (None,) or isinstance(
        cap_metrics(obs4), dict)


def test_hyperplanes_deterministic():
    assert hyperplane_signs(0, 8) == hyperplane_signs(0, 8)
    assert hyperplane_signs(0, 8) != hyperplane_signs(1, 8)
    assert set(hyperplane_signs(0, 64)) == {-1, 1}


# ---------------------------------------------------------------- round 2
def test_simhash_bands_layout():
    from lens_spark.operators.dedup import simhash_bands

    for h in (0, 3, 8, 15):
        layout = simhash_bands(h)
        assert len(layout) == max(4, h + 1)
        # contiguous cover of all 60 bits, widths differ by <= 1
        assert layout[0][0] == 0
        assert sum(w for _, w in layout) == 60
        for (o1, w1), (o2, _) in zip(layout, layout[1:]):
            assert o1 + w1 == o2
        widths = {w for _, w in layout}
        assert max(widths) - min(widths) <= 1
    with pytest.raises(ValueError):
        simhash_bands(60)  # 61 bands > 60 bits


def test_simhash_pairs_full_recall_at_radius(docs):
    """Pigeonhole guarantee holds for the REQUESTED max_hamming: banding
    must return exactly the brute-force pair set (ADVICE r1: 4 fixed
    bands silently lost Hamming 4..8 pairs)."""
    sh = {
        r["id"]: r["sh"]
        for r in docs.select(
            "id", simhash64(F.col("text")).alias("sh")
        ).collect()
    }
    for radius in (3, 8):
        brute = {
            (a, b)
            for a in sh for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= radius
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(docs, "id", "text",
                                   max_hamming=radius).collect()
        }
        assert got == brute, f"radius={radius}"


def test_jaccard_hot_shingle_cap(spark):
    """A shingle shared by every doc must not create a quadratic join
    bucket: with the df cap it contributes ZERO candidate pairs; without
    it (max_df=None) it yields all-pairs."""
    boiler = "subscribe to our newsletter now"
    rows = [(i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "id int, text string")
    capped = ngram_jaccard_pairs(df, "id", "text", k=3, threshold=0.01,
                                 max_df=10)
    # every ubiquitous shingle (df=30 > 10) dropped; the unique{i} tails
    # share nothing, so no candidates survive at all
    assert capped.count() == 0
    uncapped = ngram_jaccard_pairs(df, "id", "text", k=3, threshold=0.01,
                                   max_df=None)
    assert uncapped.count() == 30 * 29 // 2  # quadratic without the cap


def test_jaccard_cap_consistent_universe(docs):
    """Cap larger than every df leaves results identical to uncapped."""
    a = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "id", "text", threshold=0.5, max_df=None).collect()))
    b = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "id", "text", threshold=0.5, max_df=100).collect()))
    assert a == b


def test_ivf_training_and_probe(spark, tmp_path):
    """IVF-flat ANN: deterministic k-means (Spark trainer == Spark-free
    parquet twin), argmin assignment with lowest-index ties, nprobe
    pruning keeps the right cluster."""
    from lens_spark.operators.similarity import (
        ann_ivf_topk, ivf_centroids_from_parquet, ivf_list_id,
        train_ivf_centroids,
    )

    # two well-separated clusters in 4-d
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [(100 + i, [0.0, 0.0, -10.0 - (i % 3) * 0.1, 0.0])
             for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = train_ivf_centroids(df, "vec_id", "embedding", nlist=2,
                                sample=40)
    assert train_ivf_centroids(df, "vec_id", "embedding", nlist=2,
                               sample=40) == cents  # deterministic

    path = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(path)
    twin = ivf_centroids_from_parquet(path, nlist=2, sample=40)
    assert twin == cents  # Spark-free oracle twin trains identically

    # assignment: every row lands in the centroid of its own cluster
    assigned = df.select(
        "vec_id",
        ivf_list_id(F.col("embedding"), cents).alias("list_id"),
    ).collect()
    by_cluster = {r["vec_id"] < 100: {a["list_id"] for a in assigned
                  if (a["vec_id"] < 100) == (r["vec_id"] < 100)}
                  for r in assigned}
    assert all(len(s) == 1 for s in by_cluster.values())
    assert by_cluster[True] != by_cluster[False]

    # probing: query near cluster A with nprobe=1 sees only A members
    got = ann_ivf_topk(df, "vec_id", "embedding", [10.0, 0.0, 0.0, 0.0],
                       cents, k=5, nprobe=1).collect()
    assert len(got) == 5
    assert all(r["id"] < 100 for r in got)
    assert got[0]["score"] == 1.0


def test_ivf_stored_index_prunes_partitions(spark, tmp_path):
    """VERDICT r2 #7: the stored IVF index must be read partition-pruned
    — a query touches ONLY its nprobe list directories (counted via
    input_file_name), the list_id predicate appears as a PartitionFilter
    (pruned at planning, not post-scan), and results equal the
    assign-on-the-fly operator."""
    from lens_spark.operators.similarity import (
        ann_ivf_topk, ann_ivf_topk_stored, train_ivf_centroids,
        write_ivf_index,
    )
    from lens_spark.plans.inspect import formatted_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, "vec_id", "embedding", nlist=8,
                                sample=256)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, "vec_id", "embedding", cents, path)

    import os
    n_lists = len([d for d in os.listdir(path)
                   if d.startswith("list_id=")])
    assert n_lists >= 4  # sanity: the index actually fans out

    q = [0.1] * 64
    stored = ann_ivf_topk_stored(spark, path, q, cents, k=10, nprobe=2)
    # partition pruning visible in the plan...
    assert "list_id" in "".join(
        __import__("re").findall(r"PartitionFilters: \[([^\]]*)\]",
                                 formatted_plan(stored))
    )
    # ...and in the files actually touched
    touched = {
        r[0].split("list_id=")[1].split("/")[0]
        for r in spark.read.parquet(path)
        .filter(F.col("list_id").isin(
            __import__("lens_spark.operators.similarity",
                       fromlist=["nearest_lists"])
            .nearest_lists(q, cents, 2)))
        .select(F.input_file_name()).distinct().collect()
    }
    assert len(touched) <= 2, f"scanned {touched}"

    fly = ann_ivf_topk(emb, "vec_id", "embedding", q, cents, k=10,
                       nprobe=2)
    assert [(r["id"], r["score"]) for r in stored.collect()] == \
        [(r["id"], r["score"]) for r in fly.collect()]


def test_winnowing_guarantee(spark):
    """Winnowing property (SIGMOD'03): two documents sharing a substring
    of length >= w + k - 1 share at least one selected fingerprint; and
    the scheme is deterministic."""
    from lens_spark.functions.text import winnow_fingerprints

    shared = "the common passage appears verbatim in both documents"
    rows = [
        (1, "left preamble AAA " + shared + " right tail one"),
        (2, "totally different opening " + shared + " and ending two"),
        (3, "no overlap here at all just unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    fps = {
        r["id"]: set(r["fp"])
        for r in df.select(
            "id", winnow_fingerprints(F.col("text"), k=5, w=4).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2], "shared passage must share a fingerprint"
    overlap_12 = len(fps[1] & fps[2])
    overlap_13 = len(fps[1] & fps[3])
    assert overlap_12 > overlap_13  # related docs overlap more
    # deterministic
    again = df.select(
        "id", winnow_fingerprints(F.col("text"), k=5, w=4).alias("fp")
    ).collect()
    assert {r["id"]: set(r["fp"]) for r in again} == fps
    # short-text degenerate case: still exactly one fingerprint, no error
    tiny = spark.createDataFrame([(9, "ab")], "id int, text string")
    got = tiny.select(
        winnow_fingerprints(F.col("text"), k=5, w=4).alias("fp")
    ).collect()[0]["fp"]
    assert len(got) == 1


# ------------------------------------------------ exact substring spans
def _duplicate_spans_bruteforce(corpus, k, min_count=2, max_count=10**9,
                                keep_first=False):
    """Pure-Python oracle for duplicate_spans: sliding k-token windows,
    global occurrence counting on the joined window text, per-doc
    gaps-and-islands merge (break at gap > k)."""
    import re
    from collections import Counter
    from itertools import groupby

    toks = {i: [t for t in re.split(r"\s+", txt) if t] for i, txt in corpus}
    wins = []
    for i, ts in toks.items():
        for p in range(1, len(ts) - k + 2):
            wins.append((i, p, " ".join(ts[p - 1:p - 1 + k])))
    c = Counter(w for _, _, w in wins)
    first = {}
    if keep_first:
        for i, p, w in sorted(wins):
            first.setdefault(w, (i, p))
    occ = sorted(
        (i, p) for i, p, w in wins
        if min_count <= c[w] <= max_count and first.get(w) != (i, p)
    )
    out = []
    for i, grp in groupby(occ, key=lambda x: x[0]):
        cur = None
        for _, p in grp:
            if cur is not None and p <= cur[1]:
                cur = (cur[0], p + k, cur[2] + 1)
            else:
                if cur is not None:
                    out.append((i, *cur))
                cur = (p, p + k, 1)
        if cur is not None:
            out.append((i, *cur))
    return set(out)


def _spans_set(df):
    return {
        (r["id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in df.collect()
    }


def test_duplicate_spans_matches_bruteforce(docs):
    from lens_spark.operators.dedup import duplicate_spans

    got = _spans_set(duplicate_spans(docs, "id", "text", k=4))
    want = _duplicate_spans_bruteforce(DOCS, k=4)
    assert got == want and want, f"{got} != {want}"
    # docs 1 and 2 are verbatim duplicates: the span must cover the
    # whole 12-token document as ONE merged island
    assert (1, 1, 13, 9) in got


def test_duplicate_spans_within_doc_repeat(spark):
    """A substring repeated WITHIN one document is a duplicate too
    (corpus-global counting, same as Lee et al.'s suffix array)."""
    from lens_spark.operators.dedup import duplicate_spans

    corpus = [
        (1, "alpha beta gamma delta xx yy alpha beta gamma delta"),
        (2, "unrelated words only here nothing repeats at all today"),
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    got = _spans_set(duplicate_spans(df, "id", "text", k=4))
    want = _duplicate_spans_bruteforce(corpus, k=4)
    assert got == want
    # "alpha beta gamma delta" occurs at pos 1 and 7 of doc 1 — two
    # non-adjacent islands (gap 6 > k=4), never merged
    assert (1, 1, 5, 1) in got and (1, 7, 11, 1) in got
    assert not any(i == 2 for i, *_ in got)


def test_duplicate_spans_adjacent_merge(spark):
    """Windows whose start equals the previous span's exclusive end
    merge (contiguous coverage, no zero-gap splits)."""
    from lens_spark.operators.dedup import duplicate_spans

    # doc 1 = A B, doc 2 = A, doc 3 = B with A, B disjoint 3-grams:
    # in doc 1 the A-island [1,4) and B-island [4,7) are adjacent
    corpus = [
        (1, "a1 a2 a3 b1 b2 b3"),
        (2, "a1 a2 a3 q1 q2 q3"),
        (3, "z1 z2 z3 b1 b2 b3"),
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    got = _spans_set(duplicate_spans(df, "id", "text", k=3))
    want = _duplicate_spans_bruteforce(corpus, k=3)
    assert got == want
    assert (1, 1, 7, 2) in got  # merged A+B coverage in doc 1


def test_duplicate_spans_max_count_cap(spark):
    from pyspark.sql import Observation

    from lens_spark.operators.dedup import cap_metrics, duplicate_spans

    # one window shared by 4 docs, another by 2
    corpus = [(i, "hot hot hot hot tail%d x" % i) for i in range(4)] + [
        (10, "cold cold cold cold y z"),
        (11, "cold cold cold cold w v"),
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    obs = Observation()
    got = _spans_set(
        duplicate_spans(df, "id", "text", k=4, max_count=3, observation=obs)
    )
    want = _duplicate_spans_bruteforce(corpus, k=4, max_count=3)
    assert got == want
    assert all(i in (10, 11) for i, *_ in got)
    m = cap_metrics(obs)
    assert m and m["duplicate_spans_rows_in_overcap_groups"] == 4


def test_duplicate_spans_keep_first(spark):
    """keep_first excludes each window's corpus-global first occurrence
    (min (id, pos)) from the marked set."""
    from lens_spark.operators.dedup import duplicate_spans

    corpus = [
        (1, "alpha beta gamma delta one two"),
        (2, "alpha beta gamma delta three four"),
        (3, "five six alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    got = _spans_set(duplicate_spans(df, "id", "text", k=4, keep_first=True))
    # doc 1 pos 1 is the first occurrence — unmarked; docs 2, 3 marked
    assert got == {(2, 1, 5, 1), (3, 3, 7, 1)}


def test_remove_duplicate_spans(spark):
    from lens_spark.operators.dedup import remove_duplicate_spans

    corpus = [
        (1, "alpha beta gamma delta one two"),
        (2, "alpha beta gamma delta three four"),
        (3, "nothing shared here at all six"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    # remove ALL copies
    out = {
        r["id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(df, "id", "text", k=4).collect()
    }
    assert out[1] == ("one two", 4)
    assert out[2] == ("three four", 4)
    assert out[3] == ("nothing shared here at all six", 0)
    assert out[4] == ("", 0)
    assert out[5] == (None, 0)  # null text stays null, not ""
    assert set(out) == {1, 2, 3, 4, 5}
    # leave-one-copy (Lee et al.): doc 1 keeps the duplicated prefix
    kept = {
        r["id"]: r["text"]
        for r in remove_duplicate_spans(
            df, "id", "text", k=4, keep_first=True
        ).collect()
    }
    assert kept[1] == "alpha beta gamma delta one two"
    assert kept[2] == "three four"
    # output schema: original columns + counter, text replaced in place
    cols = remove_duplicate_spans(df, "id", "text", k=4).columns
    assert cols == ["id", "text", "n_removed_tokens"]


# ----------------------------------------------------------- doc chunking
def _chunks_bruteforce(corpus, max_tokens, overlap):
    import re

    stride = max_tokens - overlap
    out = []
    for i, txt in corpus:
        ts = [t for t in re.split(r"\s+", txt) if t]
        n = len(ts)
        if n == 0:
            continue
        n_chunks = 1 if n <= max_tokens else -((n - max_tokens) // -stride) + 1
        for j in range(n_chunks):
            c = ts[j * stride:j * stride + max_tokens]
            out.append((i, j, len(c), " ".join(c)))
    return set(out)


def test_chunk_documents(spark):
    from lens_spark.operators.pack import chunk_documents

    corpus = [
        (1, " ".join(f"t{i}" for i in range(13))),  # 3 chunks at 8/4
        (2, "a b c"),                               # 1 short chunk
        (3, " ".join(f"u{i}" for i in range(8))),   # exactly max → 1
        (4, " ".join(f"v{i}" for i in range(9))),   # max+1 → 2
        (5, ""),                                    # no chunks
    ]
    df = spark.createDataFrame(corpus, "id int, text string")
    got = {
        (r["id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, "id", "text", max_tokens=8, overlap=4
        ).collect()
    }
    want = _chunks_bruteforce(corpus, 8, 4)
    assert got == want
    assert (1, 2, 5, "t8 t9 t10 t11 t12") in got
    assert sum(1 for i, *_ in got if i == 3) == 1
    assert sum(1 for i, *_ in got if i == 4) == 2
    assert not any(i == 5 for i, *_ in got)
    # every token of every doc appears in some chunk (coverage)
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", max_tokens=4, overlap=4)


def test_chunk_documents_no_shuffle(spark):
    from lens_spark.operators.pack import chunk_documents
    from lens_spark.plans.inspect import plan_stats

    df = spark.range(10).selectExpr(
        "id", "repeat('w ', 100) as text"
    )
    s = plan_stats(chunk_documents(df, "id", "text", max_tokens=32))
    assert s.exchanges == 0, "chunking must be map-only"
    assert s.python_stages == 0


def test_dedup_lines_keep_first(spark):
    from lens_spark.operators.dedup import dedup_lines

    rows = [
        (1, "unique one\nboiler plate line\nunique two"),
        (2, "boiler plate line\nother text here"),
        (3, "boiler plate line"),
        (4, ""),        # single empty line: structural, exempt
        (5, None),      # null text stays null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(
        df, "doc_id", "text").collect()}
    # corpus-global first occurrence (doc 1, pos 1) survives; others go
    assert got[1]["text"] == "unique one\nboiler plate line\nunique two"
    assert got[2]["text"] == "other text here"
    assert got[2]["n_removed_lines"] == 1
    # a doc whose every line was removed is PRESENT as empty string
    assert got[3]["text"] == "" and got[3]["n_removed_lines"] == 1
    assert got[4]["text"] == "" and got[4]["n_removed_lines"] == 0
    assert got[5]["text"] is None and got[5]["n_removed_lines"] == 0


def test_dedup_lines_drop_all_and_exemption(spark):
    from lens_spark.operators.dedup import dedup_lines

    rows = [
        (1, "dup line here\nkeep me"),
        (2, "dup line here\nx\nme too"),
        (3, "x"),  # 1-char line: duplicated but exempt at min 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(
        df, "doc_id", "text", keep_first=False, min_line_chars=2
    ).collect()}
    assert got[1]["text"] == "keep me"       # every copy removed
    assert got[2]["text"] == "x\nme too"
    assert got[3]["text"] == "x" and got[3]["n_removed_lines"] == 0


def test_semdedup_matches_bruteforce(spark):
    """semdedup_pairs/semdedup_keep equal a single-process numpy
    reference (nearest-centroid assign, rank by (d2, id), upper-
    triangular cos >= threshold drop rule of Abbas et al. 2023) on a
    deterministic pseudo-random corpus with planted duplicates."""
    import hashlib as _h

    import numpy as np

    from lens_spark.operators.similarity import (
        semdedup_keep, semdedup_pairs, train_ivf_centroids,
    )

    def vec(seed: int) -> list[float]:
        d = _h.md5(f"sd:{seed}".encode()).digest() * 4
        return [round((b / 255.0) * 2 - 1, 6) for b in d[:8]]

    rows = [(i, vec(i)) for i in range(60)]
    # planted near-dups: tiny perturbations of vector 3
    for j, i in enumerate(range(60, 66)):
        base = vec(3)
        base[0] = round(base[0] + 0.0001 * (j + 1), 6)
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = train_ivf_centroids(df, "vec_id", "embedding",
                                nlist=4, sample=64)

    # numpy reference
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype="float64")
    C = np.array(cents)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
    assign, dist = d2.argmin(1), d2.min(1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    exp_pairs, exp_drop = set(), set()
    for c in set(assign.tolist()):
        idx = np.where(assign == c)[0]
        order = sorted(idx, key=lambda i: (dist[i], ids[i]))
        for bi, b in enumerate(order):
            for a in order[:bi]:
                if round(S[a, b], 6) >= 0.9:
                    exp_pairs.add((int(ids[a]), int(ids[b])))
                    exp_drop.add(int(ids[b]))

    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(df, "vec_id", "embedding", cents,
                                threshold=0.9).collect()
    }
    assert got == exp_pairs and exp_pairs  # non-vacuous: dups planted
    kept = {
        r["vec_id"]
        for r in semdedup_keep(df, "vec_id", "embedding", cents,
                               threshold=0.9).collect()
    }
    assert kept == set(ids.tolist()) - exp_drop


def test_semdedup_cluster_cap(spark):
    """Over-cap clusters are excluded from pairing (recall contract) and
    metered; a cap above the cluster size leaves results quadratic."""
    from pyspark.sql import Observation

    from lens_spark.operators.similarity import semdedup_pairs

    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = [[1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]]
    obs = Observation("semdedup_cap")
    capped = semdedup_pairs(df, "vec_id", "embedding", cents,
                            threshold=0.5, max_cluster=10,
                            observation=obs)
    assert capped.count() == 0
    loose = semdedup_pairs(df, "vec_id", "embedding", cents,
                           threshold=0.99, max_cluster=200)
    assert loose.count() == 30 * 29 // 2


def test_dedup_lines_in_doc(spark):
    """Intra-doc line dedup: first occurrence kept in order, later
    repeats removed; null text preserved; no cross-doc state (the same
    line in another doc is untouched)."""
    from lens_spark.operators.dedup import dedup_lines_in_doc

    rows = [
        (1, "a\nb\na\nc\nb\na"),     # dups of a (x2) and b
        (2, "a\nz"),                  # 'a' also in doc 1 — must stay
        (3, None),
        (4, "same\nsame\nsame"),
        (5, "only one line"),
        (6, ""),                      # one empty line, nothing removed
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in
           dedup_lines_in_doc(df, "doc_id", "text").collect()}
    assert got[1]["text"] == "a\nb\nc" and got[1]["n_removed_lines"] == 3
    assert got[2]["text"] == "a\nz" and got[2]["n_removed_lines"] == 0
    assert got[3]["text"] is None and got[3]["n_removed_lines"] == 0
    assert got[4]["text"] == "same" and got[4]["n_removed_lines"] == 2
    assert got[5]["text"] == "only one line"
    assert got[6]["text"] == "" and got[6]["n_removed_lines"] == 0
    # single-doc python reference over a pseudo-random multi-line doc
    import hashlib as _h
    words = [_h.md5(str(i).encode()).hexdigest()[:3] for i in range(40)]
    lines = [words[int(_h.md5(str(i).encode()).hexdigest()[:4], 16) % 12]
             for i in range(60)]
    seen, kept = set(), []
    for ln in lines:
        if ln not in seen:
            seen.add(ln)
            kept.append(ln)
    df2 = spark.createDataFrame([(9, "\n".join(lines))],
                                "doc_id int, text string")
    r = dedup_lines_in_doc(df2, "doc_id", "text").collect()[0]
    assert r["text"] == "\n".join(kept)
    assert r["n_removed_lines"] == len(lines) - len(kept)


def test_unicode_normalize(spark):
    """NFC/NFKC via the Arrow-batched UDF equal unicodedata.normalize;
    nulls pass through; bad form rejected."""
    import unicodedata

    import pytest as _pytest

    from lens_spark.functions.normalize import unicode_normalize

    rows = [
        (1, "café"),           # e + combining acute -> é
        (2, "Ångström"),  # angstrom sign + o-diaeresis
        (3, "ﬁle"),             # fi ligature: NFC keeps, NFKC splits
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r["id"]: (r["nfc"], r["nfkc"])
        for r in df.select(
            "id",
            unicode_normalize(F.col("t")).alias("nfc"),
            unicode_normalize(F.col("t"), "NFKC").alias("nfkc"),
        ).collect()
    }
    for i, t in rows:
        if t is None:
            assert got[i] == (None, None)
        else:
            assert got[i] == (
                unicodedata.normalize("NFC", t),
                unicodedata.normalize("NFKC", t),
            )
    assert got[3][0] == "ﬁle" and got[3][1] == "file"
    with _pytest.raises(ValueError):
        unicode_normalize(F.col("t"), "NFX")


def test_script_profile(spark):
    """Per-script counts + dominant: ties go to the earlier script in
    SCRIPTS order; digits/punct-only and null text yield 'none'."""
    from lens_spark.functions.text import script_profile

    rows = [
        (1, "hello world"),
        (2, "привет мир"),
        (3, "ab пр"),          # 2 latin vs 2 cyrillic — tie → latin
        (4, "123 .,!"),
        (5, None),
        (6, "日本語 と カタカナ"),  # han+hiragana+katakana mix
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    p = script_profile(F.col("t"))
    got = {
        r["id"]: r
        for r in df.select(
            "id", p["dominant"].alias("dom"),
            p["n_latin"].alias("lat"), p["n_cyrillic"].alias("cyr"),
            p["n_han"].alias("han"), p["n_hiragana"].alias("hira"),
            p["n_katakana"].alias("kata"),
        ).collect()
    }
    assert got[1]["dom"] == "latin" and got[1]["lat"] == 10
    assert got[2]["dom"] == "cyrillic" and got[2]["cyr"] == 9
    assert got[3]["dom"] == "latin" and got[3]["lat"] == 2 == got[3]["cyr"]
    assert got[4]["dom"] == "none"
    assert got[5]["dom"] == "none"
    assert got[6]["han"] == 3 and got[6]["hira"] == 1  # と
    assert got[6]["kata"] == 4  # カタカナ


def test_minhash_contamination(spark):
    """Fuzzy decontam: exact bench copy agrees on all components; a
    light paraphrase still clears the threshold; unrelated docs get the
    (0, -1, 0) sentinel row; ties go to the lowest bench id."""
    from lens_spark.operators.decontam import minhash_contamination

    eval_text = ("what is the capital of france paris is the capital "
                 "of france and has been since the tenth century")
    corpus = spark.createDataFrame(
        [
            (1, eval_text),                              # verbatim leak
            (2, eval_text + " according to the quiz"),   # paraphrase-ish
            (3, "completely unrelated text about spark shuffle tuning "
                "and adaptive query execution at scale"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, eval_text), (101, eval_text)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in minhash_contamination(
            corpus, bench, "doc_id", "text",
            num_hashes=8, bands=4, threshold=0.5,
        ).collect()
    }
    assert got[1]["n_agree"] == 8 and got[1]["fuzzy_contaminated"] == 1
    assert got[1]["fuzzy_match_id"] == 100          # tie → lowest id
    assert got[2]["fuzzy_contaminated"] == 1 and got[2]["n_agree"] >= 4
    assert (got[3]["n_agree"], got[3]["fuzzy_match_id"],
            got[3]["fuzzy_contaminated"]) == (0, -1, 0)


def test_project_embeddings_matches_numpy(spark):
    """Signed random projection == the numpy reference under identical
    signs and floor(x*1e4+0.5) quantization; map-only plan."""
    import math

    from lens_spark.operators.similarity import (
        project_embeddings, projection_signs,
    )

    rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 3.0 for j in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["proj_q"]
        for r in project_embeddings(
            df, "vec_id", "embedding", dim_in=8, dim_out=4
        ).collect()
    }
    signs = projection_signs(8, 4)
    for i, vec in rows:
        # replicate float32 storage then double fold in index order
        import struct as _s

        v32 = [_s.unpack("f", _s.pack("f", x))[0] for x in vec]
        want = []
        for j in range(4):
            acc = 0.0
            for x, s in zip(v32, signs[j]):
                acc += float(x) * float(s)
            want.append(math.floor(acc * 10000.0 + 0.5))
        assert out[i] == want, i
    # map-only: no exchange, no join (sign matrix is literal)
    plan = (
        project_embeddings(df, "vec_id", "embedding", 8, 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_exact_dedup_increment(spark):
    """Increment classification against a stored digest index: corpus
    dup → stored rep, within-increment dup → first id, else unique."""
    from lens_spark.operators.dedup import (
        exact_dedup, exact_dedup_increment,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    index = exact_dedup(corpus, "doc_id", "text")  # (fingerprint, rep_id)
    new = spark.createDataFrame(
        [
            (10, "alpha  BETA"),   # corpus dup (normalized)
            (11, "fresh text one"),
            (12, "fresh text one"),  # increment dup of 11
            (13, "entirely new"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["status"], r["dup_of"])
        for r in exact_dedup_increment(new, index, "doc_id", "text")
        .collect()
    }
    assert got[10] == ("corpus_dup", 1)
    assert got[11] == ("unique", -1)
    assert got[12] == ("increment_dup", 11)
    assert got[13] == ("unique", -1)


def test_minhash_increment(spark):
    """New docs probe the stored band table: a near-copy of a corpus
    doc surfaces as a (new, corpus) candidate; unrelated text doesn't.
    Candidates equal re-running full LSH over corpus+increment and
    keeping only cross pairs (same params, no caps hit)."""
    from lens_spark.operators.dedup import (
        minhash_band_rows, minhash_increment, minhash_lsh_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank every single morning before the sun rises over the hills"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about cooking pasta "
                        "with tomatoes garlic and fresh basil leaves")],
        "doc_id long, text string",
    )
    stored = minhash_band_rows(corpus, "doc_id", "text")
    new = spark.createDataFrame(
        [(10, base + " tail"), (11, "unrelated quantum physics lecture "
                                    "notes on entanglement and qubits")],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_increment(new, stored, "doc_id", "text")
        .collect()
    }
    assert (10, 1) in got
    assert not any(n == 11 for n, _ in got)
    # cross-check vs full-corpus LSH restricted to cross pairs
    both = corpus.union(new)
    full = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs(both, "doc_id", "text").collect()
        if (r["id_a"] >= 10) != (r["id_b"] >= 10)
    }
    assert got == full


class TestTokenBudgetSelect:
    def _naive(self, rows, budget):
        # global rule: order by (score desc, id asc), keep while the
        # running total BEFORE the doc is < budget
        kept, cum = set(), 0
        for _id, score, tok in sorted(
            rows, key=lambda r: (-r[1], r[0])
        ):
            if cum < budget:
                kept.add(_id)
            cum += tok
        return kept

    def test_equals_naive_global_rule(self, spark):
        import hashlib

        rows = []
        for i in range(400):
            h = hashlib.md5(f"tb:{i}".encode()).digest()
            score = round(h[0] / 255.0, 4)  # ~256 distinct -> ties
            rows.append((i, score, 1 + h[1] % 50))
        df = spark.createDataFrame(
            rows, "id long, score double, tok long")
        from lens_spark.operators.mixing import token_budget_select

        for budget in (1, 137, 2500, 10**9):
            got = {
                r["id"]
                for r in token_budget_select(
                    df, "id", "score", "tok", budget
                ).collect()
            }
            assert got == self._naive(rows, budget), budget

    def test_null_rows_dropped_and_validation(self, spark):
        from lens_spark.operators.mixing import token_budget_select

        df = spark.createDataFrame(
            [(1, 0.9, 10), (2, None, 10), (3, 0.5, None), (4, 0.1, 10)],
            "id long, score double, tok long",
        )
        got = {r["id"] for r in token_budget_select(
            df, "id", "score", "tok", 10**6).collect()}
        assert got == {1, 4}
        with pytest.raises(ValueError):
            token_budget_select(df, "id", "score", "tok", 0)

    def test_zero_token_doc_at_exact_boundary(self, spark):
        # budget lands exactly on a bucket edge; the zero-token doc
        # sitting there has cum_before == budget -> excluded (strict <)
        from lens_spark.operators.mixing import token_budget_select

        df = spark.createDataFrame(
            [(1, 0.9, 10), (2, 0.8, 0), (3, 0.7, 5)],
            "id long, score double, tok long",
        )
        got = {r["id"] for r in token_budget_select(
            df, "id", "score", "tok", 10).collect()}
        assert got == {1}


def test_boilerplate_ngrams(spark):
    from lens_spark.operators.dedup import boilerplate_ngrams

    rows = [
        (1, "cookie policy applies here . unique alpha text one"),
        (2, "our cookie policy applies to everything on this site"),
        (3, "cookie policy applies . cookie policy applies twice"),
        (4, "totally unrelated words nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["ngram"]: r["doc_freq"]
        for r in boilerplate_ngrams(df, "id", "text", k=3).collect()
    }
    # in 3 docs; doc 3's internal repetition counts ONCE (distinct/doc)
    assert got["cookie policy applies"] == 3
    assert all(v >= 2 for v in got.values())
    # top_k truncates on (doc_freq desc, ngram asc)
    top1 = boilerplate_ngrams(df, "id", "text", k=3, top_k=1).collect()
    assert [(r["ngram"], r["doc_freq"]) for r in top1] == [
        ("cookie policy applies", 3)
    ]


# ---------------------------------------------------- interleaved pack
class TestPackInterleaved:
    def _mk(self, spark, spans_rows):
        from lens_spark.schema import OUT_SPAN
        from pyspark.sql.types import (
            ArrayType, StringType, StructField, StructType,
        )

        schema = StructType([
            StructField("doc_id", StringType()),
            StructField("spans", ArrayType(OUT_SPAN)),
        ])
        return spark.createDataFrame(spans_rows, schema)

    def test_media_atomic_text_splits(self, spark):
        from lens_spark.operators.pack import pack_interleaved

        spans = [
            ("text", " ".join(f"w{i}" for i in range(10)), None, 0),
            ("media", None, "ref-a", 1),
            ("text", "x y z", None, 2),
        ]
        df = self._mk(spark, [("d1", spans)])
        out = sorted(
            pack_interleaved(df, max_tokens=6).collect(),
            key=lambda r: r.chunk_id,
        )
        # 10 text tokens -> chunks of 6 and 4; media (+x y z) rides
        # with the 4-token remainder
        assert [r.n_tokens for r in out] == [6, 6, 2]
        assert [r.n_media for r in out] == [0, 1, 0]
        assert out[1].media_refs == ["ref-a"]
        assert out[1].text.endswith("<|media|> x")
        joined = " ".join(r.text for r in out).replace("<|media|> ", "")
        assert joined == " ".join(f"w{i}" for i in range(10)) + " x y z"

    def test_media_never_split_across_boundary(self, spark):
        from lens_spark.operators.pack import pack_interleaved

        spans = [
            ("text", "a b c d e f", None, 0),   # exactly fills 6
            ("media", None, "ref-m", 1),
            ("media", None, "ref-n", 2),
        ]
        df = self._mk(spark, [("d1", spans)])
        out = sorted(
            pack_interleaved(df, max_tokens=6).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [r.n_tokens for r in out] == [6, 2]
        assert out[1].media_refs == ["ref-m", "ref-n"]

    def test_matches_pure_rows(self, spark):
        import random

        from lens_spark.operators.pack import (
            pack_interleaved, pack_interleaved_rows,
        )

        rng = random.Random(3)
        rows = []
        for d in range(12):
            spans, order = [], 0
            for _ in range(rng.randrange(1, 6)):
                if rng.random() < 0.3:
                    spans.append(
                        ("media", None, f"r{d}-{order}", order))
                else:
                    spans.append((
                        "text",
                        " ".join(
                            f"t{j}"
                            for j in range(rng.randrange(0, 40))
                        ) or None,
                        None, order,
                    ))
                order += 1
            rows.append((f"d{d}", spans))
        df = self._mk(spark, rows)
        got = {
            (r.doc_id, r.chunk_id):
                (r.n_tokens, r.n_media, r.text, list(r.media_refs))
            for r in pack_interleaved(df, max_tokens=16).collect()
        }
        want = {}
        for did, spans in rows:
            dicts = [
                {"kind": k, "text": t, "media_ref": m}
                for k, t, m, _ in spans
            ]
            for (i, cid, nt, nm, text, refs) in pack_interleaved_rows(
                    did, dicts, 16):
                want[(i, cid)] = (nt, nm, text, refs)
        assert got == want

    def test_budget_validation(self, spark):
        import pytest as _pytest

        from lens_spark.operators.pack import pack_interleaved

        df = self._mk(spark, [("d", [])])
        with _pytest.raises(ValueError):
            pack_interleaved(df, max_tokens=4, media_cost=9)

    def test_plan_is_map_only(self, spark):
        from lens_spark.operators.pack import pack_interleaved

        df = self._mk(spark, [("d", [("text", "a", None, 0)])])
        plan = pack_interleaved(
            df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
