"""C4 cleaning, PII redaction, int8 quantization, sequence packing —
crafted inputs with hand-computed expectations (the unit layer under the
sf0.01 DuckDB oracle rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark.functions.text import c4_clean, pii_redact
from lens_spark.operators.pack import pack_sequences
from lens_spark.operators.similarity import quantize_int8


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("r")).first()["r"]


C4_DOC = "\n".join(
    [
        "This line survives the filter.",        # kept
        "too short.",                             # < 3 words
        "No terminal punctuation here",           # bad ending
        "Enable javascript to view this page.",   # javascript
        "  Trimmed line also survives!  ",        # kept (trimmed)
        "",                                       # empty
    ]
)


def test_c4_clean_line_rules(spark):
    r = _one(spark, C4_DOC, c4_clean(F.col("text")))
    assert r["clean_text"] == (
        "This line survives the filter.\nTrimmed line also survives!"
    )
    assert r["n_kept"] == 2 and r["n_dropped"] == 4
    assert r["has_lorem"] == 0 and r["has_brace"] == 0


def test_c4_doc_flags(spark):
    r = _one(
        spark,
        "Lorem Ipsum dolor sit amet.\nvar x = {a: 1};",
        c4_clean(F.col("text")),
    )
    assert r["has_lorem"] == 1 and r["has_brace"] == 1


def test_pii_redact_all_three(spark):
    text = (
        "Mail bob.smith+tag@sub.example.org, host 192.168.10.5, "
        "call +1 (555) 123-4567 now"
    )
    r = _one(spark, text, pii_redact(F.col("text")))
    assert r["redacted"] == (
        "Mail <EMAIL>, host <IP>, call <PHONE> now"
    )
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1)


def test_pii_order_emails_win_over_digits(spark):
    # the email's digit run must not be phone-redacted
    r = _one(spark, "reach 12345678@digits.example.com ok",
             pii_redact(F.col("text")))
    assert r["redacted"] == "reach <EMAIL> ok"
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 0, 0)


def test_quantize_int8(spark):
    df = spark.createDataFrame(
        [([1.0, -2.0, 0.5],), ([0.0, 0.0],)],
        "vec array<double>",
    )
    rows = df.select(quantize_int8(F.col("vec")).alias("r")).collect()
    r0, r1 = rows[0]["r"], rows[1]["r"]
    assert r0["q"] == [64, -127, 32]          # floor(x*63.5 + 0.5)
    assert abs(r0["scale"] - 63.5) < 1e-12
    assert r1["scale"] == 0.0 and r1["q"] == [0, 0]


def test_pack_sequences_next_fit(spark):
    rows = [
        # group g: 100+100 fit in 256, 100 more overflows → seq 1;
        # then a 300-token giant gets its own seq 2
        ("g", 1, 100), ("g", 2, 100), ("g", 3, 100), ("g", 4, 300),
        # group h: zero-token doc then a giant stays in seq 0 (acc==0)
        ("h", 1, 0), ("h", 2, 400),
    ]
    df = spark.createDataFrame(rows, "src string, id long, n int")
    got = {
        (r["group"], r["id"]): (r["seq_id"], r["seq_pos"])
        for r in pack_sequences(df, "id", "src", "n", 256).collect()
    }
    assert got == {
        ("g", 1): (0, 0), ("g", 2): (0, 1),
        ("g", 3): (1, 0), ("g", 4): (2, 0),
        ("h", 1): (0, 0), ("h", 2): (0, 1),
    }


def test_contamination_flags(spark):
    from lens_spark.operators.decontam import contamination_flags

    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly"),
         (101, "tiny eval")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim benchmark sentence inside a longer doc → hits
            (1, "padding words here the secret benchmark answer is "
                "forty two exactly and trailing context"),
            # unrelated → clean
            (2, "completely different content about weather patterns "
                "in the north atlantic region today"),
            # short doc copying the short benchmark doc verbatim →
            # whole-text gram convention still catches it
            (3, "tiny eval"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(
            corpus, bench, "doc_id", "text", n=8
        ).collect()
    }
    assert got[1][1] == 1 and got[1][0] >= 1
    assert got[2] == (0, 0)
    # both sides apply the whole-text convention below n words, so the
    # verbatim copy of the 2-word benchmark doc is caught
    assert got[3] == (1, 1)


# --------------------------------------------------- linear classifier
def test_classifier_score_matches_python(spark):
    """classifier_features' exact-integer contract vs a pure-Python
    reimplementation: same md5 buckets, same weights, same sum — then
    the sigmoid head's range/edge behavior."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from lens_spark.functions.classifier import (
        WEIGHT_SCALE, classifier_features, classifier_score,
        linear_weights,
    )

    dim = 64
    w = linear_weights(dim)
    texts = [
        (1, "The Quick brown FOX jumps"),
        (2, "completely different words entirely here today"),
        (3, ""),
        (4, None),
        (5, "café 北京 mixed unicode tokens"),
        (6, "ΣΟΦΟΣ σοφός ends"),  # final-sigma fold: JVM vs simple lower
    ]
    df = spark.createDataFrame(texts, "id int, text string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            classifier_features(F.col("text"), dim=dim).alias("f"),
            classifier_score(F.col("text"), dim=dim).alias("p"),
        ).collect()
    }

    def py_bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

    for i, txt in texts:
        toks = [
            t for t in (txt or "").lower().replace("ς", "σ").split() if t
        ]
        want_sum = sum(w[py_bucket(t)] for t in toks)
        got = rows[i]["f"]
        if txt is None:
            assert got["sum_w"] == 0 and got["n_tok"] == 0
        else:
            assert got["sum_w"] == want_sum, (i, txt)
            assert got["n_tok"] == len(toks)
        want_logit = (want_sum if txt else 0) / (
            WEIGHT_SCALE * max(len(toks), 1)
        )
        assert abs(rows[i]["p"] - 1 / (1 + math.exp(-want_logit))) < 1e-9
        assert 0.0 < rows[i]["p"] < 1.0
    # empty/null doc scores sigmoid(bias) exactly
    assert rows[3]["p"] == 0.5 and rows[4]["p"] == 0.5
    # bias shifts the score monotonically
    hi = df.filter("id = 3").select(
        classifier_score(F.col("text"), dim=dim, bias=2.0).alias("p")
    ).collect()[0]["p"]
    assert abs(hi - 1 / (1 + math.exp(-2.0))) < 1e-9


def test_classifier_gated_fasttext(spark):
    from lens_spark.functions.classifier import load_fasttext_weights

    with pytest.raises(NotImplementedError):
        load_fasttext_weights("/nonexistent/model.bin")


def test_contamination_gram_df_cap(spark):
    """ADVICE r4: a boilerplate gram in the eval set must be cappable —
    max_gram_df drops bench grams matching more than that many corpus
    docs, and the drop is metered (no-silent-caps convention)."""
    from pyspark.sql import Observation

    from lens_spark.operators.decontam import contamination_flags
    from lens_spark.operators.dedup import cap_metrics

    boiler = "this content is provided as is without any warranty"
    bench = spark.createDataFrame(
        [(100, boiler), (101, "the rare answer is exactly seventeen")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} body text. {boiler}") for i in range(1, 7)]
        + [(7, "the rare answer is exactly seventeen")],
        "doc_id long, text string",
    )
    # uncapped: all 7 contaminated
    base = contamination_flags(corpus, bench, "doc_id", "text", n=8)
    assert sum(r["contaminated"] for r in base.collect()) == 7
    # capped at 5: the boilerplate grams (6 corpus docs each) drop;
    # only the genuine rare hit survives, and the cap is metered
    obs = Observation("decontam-cap")
    capped = contamination_flags(
        corpus, bench, "doc_id", "text", n=8,
        max_gram_df=5, observation=obs,
    )
    got = {r["doc_id"]: r["contaminated"] for r in capped.collect()}
    assert got[7] == 1
    assert sum(got.values()) == 1
    m = cap_metrics(obs)
    assert m["decontam_rows_in_overcap_groups"] > 0
    assert m["decontam_max_group_size"] == 6


def test_cap_metrics_real_failure_raises():
    """VERDICT r4: a real metrics-read failure must raise, not warn —
    only the documented AQE empty-row elimination returns None."""
    import pytest

    class _BoomRow:
        def length(self):
            raise RuntimeError("py4j connection dead")

    class _FakeJo:
        def getRow(self):
            return _BoomRow()

    class _FakeObs:
        _jo = _FakeJo()

    from lens_spark.operators.dedup import cap_metrics

    with pytest.raises(RuntimeError, match="py4j connection dead"):
        cap_metrics(_FakeObs())


def test_py_hash_bucket_matches_spark(spark):
    """Weight-loader bucket mapping (ADVICE r4) must equal the scoring
    engine's md5 bucket for any token."""
    from pyspark.sql import functions as F

    from lens_spark.functions.classifier import hash_bucket, py_hash_bucket

    toks = ["the", "Zürich", "σκιά", "x" * 40, "42", "a-b_c"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    rows = df.select("tok", hash_bucket(F.col("tok"), 256).alias("b")
                     ).collect()
    for r in rows:
        assert r["b"] == py_hash_bucket(r["tok"], 256)


def test_encoding_quality_detects_mojibake(spark):
    from lens_spark.functions.text import encoding_quality
    from pyspark.sql import functions as F

    rows = [
        (1, "clean ascii text"),
        (2, "double encoded cafÃ© and Ã¼ber"),
        (3, "curly quote artifact â€œhere"),
        (4, "decoder gave up �� here"),
        (5, "nbsp artifactÂ here"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = encoding_quality(F.col("text"))
    got = {r["doc_id"]: r["q"] for r in df.select("doc_id", q.alias("q"))
           .collect()}
    assert got[1]["suspect"] is False and got[1]["n_mojibake"] == 0
    assert got[2]["n_mojibake"] == 2 and got[2]["suspect"] is True
    assert got[3]["n_mojibake"] == 1
    assert got[4]["n_replacement"] == 2 and got[4]["suspect"] is True
    assert got[5]["n_mojibake"] == 1
    assert got[6]["suspect"] is None  # null text stays null, not false


def test_lexicon_flags_words_phrases_null(spark):
    from lens_spark.functions.text import lexicon_flags
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a BAD word here"),
            (2, "clean text only"),
            (3, "the exact phrase lives here"),
            (4, None),
            (5, "badword and badly split"),  # substring != token
        ],
        "i long, text string",
    )
    fl = lexicon_flags(
        F.col("text"), words=["bad"], phrases=["exact phrase"])
    got = {
        r.i: (r.f.word_hit, r.f.phrase_hit, r.f.keep)
        for r in df.select("i", fl.alias("f")).collect()
    }
    assert got[1] == (1, 0, 0)      # case-folded token hit
    assert got[2] == (0, 0, 1)
    assert got[3] == (0, 1, 0)      # phrase substring hit
    assert got[4] == (0, 0, 1)      # null text is clean, not dropped
    assert got[5] == (0, 0, 1)      # 'badword'/'bad split' tokens: no


def test_lexicon_flags_is_map_only(spark):
    from lens_spark.functions.text import lexicon_flags
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x")], "i long, text string")
    plan = df.select(
        lexicon_flags(F.col("text"), words=["w"], phrases=["p q"])
        .alias("f")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
