"""LSH banding tuner (operators/tuning.py) vs a pure-Python
reference on a corpus with known duplicate structure."""
from __future__ import annotations

import hashlib

import pytest

from lens_spark.operators.tuning import lsh_tuning_report


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    if len(toks) >= k:
        sh = {" ".join(toks[i:i + k])
              for i in range(len(toks) - k + 1)}
    else:
        sh = {" ".join(toks)}
    return sorted(sh)


def _sig(sh: list[str], num_hashes: int) -> list[str]:
    return [
        min(hashlib.md5(f"{h}:{s}".encode()).hexdigest() for s in sh)
        for h in range(num_hashes)
    ]


def ref_report(rows, num_hashes=8, configs=(1, 2, 4, 8),
               sample_k=150, tau_bp=3500):
    samp = sorted(
        rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(),
                             r[0])
    )[:sample_k]
    docs = [(i, _shingles(t), _sig(_shingles(t), num_hashes))
            for i, t in samp]
    out = {}
    pairs = [(x, y) for x in docs for y in docs if x[0] < y[0]]
    dups = []
    for x, y in pairs:
        inter = len(set(x[1]) & set(y[1]))
        union = len(set(x[1]) | set(y[1]))
        jac = 10000 if union == 0 else inter * 10000 // union
        dups.append(jac >= tau_bp)
    for b in configs:
        r = num_hashes // b
        cand = []
        for x, y in pairs:
            cand.append(any(
                x[2][i * r:(i + 1) * r] == y[2][i * r:(i + 1) * r]
                for i in range(b)))
        caught = sum(1 for c, d in zip(cand, dups) if c and d)
        out[b] = (len(pairs), sum(cand), sum(dups), caught)
    return out


@pytest.fixture()
def corpus():
    base = ("the quick brown fox jumps over the lazy dog and runs "
            "far away into the deep green forest tonight")
    rows = []
    for i in range(40):
        words = base.split()
        # families of 4 near-identical docs + noise tail per family
        words[i % len(words)] = f"w{i // 4}"
        rows.append((i, " ".join(words) + f" tail{i // 4}"))
    for i in range(40, 60):  # unrelated docs
        rows.append((i, " ".join(f"u{i}x{j}" for j in range(25))))
    return rows


def test_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.bands: (r.n_pairs, r.candidates, r.dups, r.caught,
                  r.precision_bp, r.recall_bp)
        for r in lsh_tuning_report(
            df, "doc_id", "text", num_hashes=8,
            band_configs=(1, 2, 4, 8), sample_k=50,
        ).collect()
    }
    ref = ref_report(corpus, sample_k=50)
    for b, (n, cand, dups, caught) in ref.items():
        prec = caught * 10000 // max(cand, 1)
        rec = caught * 10000 // max(dups, 1)
        assert got[b] == (n, cand, dups, caught, prec, rec), b
    # monotonicity: more bands -> never fewer candidates or caught
    for lo, hi in [(1, 2), (2, 4), (4, 8)]:
        assert got[hi][1] >= got[lo][1]
        assert got[hi][3] >= got[lo][3]


def test_report_is_nontrivial(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r.bands: r for r in lsh_tuning_report(
        df, "doc_id", "text", sample_k=50).collect()}
    assert rows[8].dups > 0          # the near-dup families exist
    assert rows[8].caught > 0        # and LSH finds some
    assert rows[1].candidates <= rows[8].candidates


def test_bad_band_config_rejected(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    with pytest.raises(ValueError, match="does not divide"):
        lsh_tuning_report(df, "doc_id", "text", num_hashes=8,
                          band_configs=(3,))
