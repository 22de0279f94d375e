"""Byte-Pair-Encoding tokenizer: distributed training + application
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units").

`bpe_pair_counts` (operators/mixing.py) computes ONE merge step's pair
statistics; this module completes the tokenizer: `learn_bpe` runs the
full merge loop and `apply_bpe` segments documents with a learned merge
table.

100 TB shape — the standard scalable BPE formulation:

    corpus (10^12 docs) ──explode/groupBy──▶ word-frequency table
                                              (vocab-sized: ~10^7-10^8
                                               rows, min_count-pruned)
    learn loop (n_merges rounds) runs on the COMPACT word table only:
      each round = one adjacent-pair aggregation (small shuffle) + a
      1-row argmax collect + a map-only segmentation rewrite.

The corpus is touched exactly once (the word-count shuffle); Sennrich's
reference implementation trains on the same word-frequency collapse.
Per-round lineage is pinned with lazy localCheckpoint (the iterative-
loop pattern from operators/cluster.py — one job per round, no
re-execution of prior rounds).

The greedy left-to-right merge rewrite and the application step are
genuinely sequential per word (each merge consumes its left neighbor —
no Catalyst higher-order function expresses it), so they run as
Arrow-batched pandas UDFs over the VOCAB table (training) and with a
per-batch word→segmentation memo (application: Zipf makes the memo hit
rate ≈ 1, so the Python cost is per DISTINCT word per batch, not per
token). Everything else is JVM-side.

Determinism: the argmax tie-break is (max count, then lexicographically
smallest (left, right)) — executor-count-independent; `py_learn_bpe` /
`py_apply_bpe` are single-process reference twins (token split pinned
ASCII-`\\s` to match Java's default `\\s`, the analyzer-parity rule)
used by the property tests and the frozen driver-row oracle
(scripts/freeze_bpe_oracle.py, the extract_full pattern).

The reference engine has no tokenizer tier (bleve analysis stops at
word tokens, engine/engine.go) — training-data layer.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from lens_spark.functions.hof import transform_u

END = "</w>"
_WS = re.compile(r"\s+", re.ASCII)  # == Java default \s


# ---------------------------------------------------------------- words


def word_freqs(df: DataFrame, text_col: str, min_count: int = 1) -> DataFrame:
    """(word, n) vocabulary table — THE one corpus-wide pass (single
    shuffle, map-side combined). ``min_count`` prunes hapax noise and
    bounds the training table (Sennrich's --min-frequency)."""
    out = (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def _init_seg(word: Column) -> Column:
    """Initial segmentation: characters, with END fused onto the last
    one — list(w[:-1]) + [w[-1] + END] (Sennrich's init). Split on
    `(?<=.)` (a code-POINT boundary in Java regex) — splitting on ''
    would cut UTF-16 surrogate pairs in half where Python's list(word)
    keeps astral characters whole."""
    # split keeps a trailing '' here (limit=-1 semantics) — remove it,
    # a real character is never the empty string
    chars = F.array_remove(F.split(word, r"(?<=.)"), "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END))),
    )


# ---------------------------------------------------------------- learn


def _merge_seg_series(segs: pd.Series, left: str, right: str) -> pd.Series:
    """Greedy left-to-right merge of the (left, right) symbol pair in
    each segmentation — the sequential rewrite Catalyst can't express."""
    fused = left + right

    def one(seg):
        seg = list(seg)
        out, i, n = [], 0, len(seg)
        while i < n:
            if i + 1 < n and seg[i] == left and seg[i + 1] == right:
                out.append(fused)
                i += 2
            else:
                out.append(seg[i])
                i += 1
        return out

    return segs.map(one)


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Train BPE: returns the ordered merge list [(left, right, freq)].
    Stops early when no pair occurs ≥ 2 times (nothing left to fuse)."""
    spark = df.sparkSession
    wf = word_freqs(df, text_col, min_count)
    seg_df = wf.select(
        F.col("n"), _init_seg(F.col("word")).alias("seg")
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        n_sym = F.size("seg")
        pair_rows = (
            seg_df.filter(n_sym >= 2)
            .select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.slice("seg", 1, n_sym - 1),
                        F.slice("seg", 2, n_sym - 1),
                    )
                ).alias("p"),
            )
            .groupBy(
                F.col("p.0").alias("left"), F.col("p.1").alias("right")
            )
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "left", "right")
            .take(1)
        )
        if not pair_rows or int(pair_rows[0]["cnt"]) < 2:
            break
        left, right, cnt = (
            pair_rows[0]["left"],
            pair_rows[0]["right"],
            int(pair_rows[0]["cnt"]),
        )
        merges.append((left, right, cnt))
        seg_df = seg_df.select(
            "n", _make_merge_udf(left, right)("seg").alias("seg")
        ).localCheckpoint(eager=False)
    return merges


def _make_merge_udf(left: str, right: str):
    """Factory so each round's UDF closes over ITS OWN (left, right) —
    closing over the loop variables would late-bind every lazily
    pickled round to the final merge."""

    @F.pandas_udf(ArrayType(StringType()))
    def _apply(s: pd.Series) -> pd.Series:
        return _merge_seg_series(s, left, right)

    return _apply


# ---------------------------------------------------------------- apply


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment ``text_col`` with a learned merge table → ``out_col``
    array<string> (END markers kept — join on '' and strip END to
    recover the text). Arrow-batched pandas UDF with a per-batch
    word→segmentation memo; NULL text → empty array."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def word_seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = _py_word_bpe(w, ranks)
            return got

        def doc(t):
            if t is None:
                return []
            out: list[str] = []
            for w in _WS.split(t):
                if w:
                    out.extend(word_seg(w))
            return out

        return texts.map(doc)

    return df.withColumn(out_col, _tok(F.col(text_col)))


# ------------------------------------------------- single-process twins


def _py_word_bpe(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Segment one word: repeatedly fuse the lowest-rank adjacent pair
    (the standard BPE application order — merge-table order, not
    left-to-right scan order; both orders agree for merges learned
    greedily, this is the canonical one)."""
    seg = list(word[:-1]) + [word[-1] + END] if word else []
    while len(seg) >= 2:
        best, best_rank = None, None
        for i in range(len(seg) - 1):
            r = ranks.get((seg[i], seg[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        left, right = seg[best], seg[best + 1]
        fused = left + right
        # fuse ALL occurrences of this pair left-to-right (matches the
        # training rewrite, which fuses every occurrence in one round)
        out, i, n = [], 0, len(seg)
        while i < n:
            if i + 1 < n and seg[i] == left and seg[i + 1] == right:
                out.append(fused)
                i += 2
            else:
                out.append(seg[i])
                i += 1
        seg = out
    return seg


def py_learn_bpe(
    rows: Iterable[str | None],
    n_merges: int = 100,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Single-process reference twin of :func:`learn_bpe` — identical
    split, init, argmax tie-break, and greedy rewrite."""
    freqs: dict[str, int] = {}
    for t in rows:
        if t is None:
            continue
        for w in _WS.split(t):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    segs: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + END], n)
        for w, n in freqs.items()
        if n >= min_count
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for seg, n in segs:
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        fused = left + right
        nxt = []
        for seg, n in segs:
            out, i, m = [], 0, len(seg)
            while i < m:
                if i + 1 < m and seg[i] == left and seg[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            nxt.append((out, n))
        segs = nxt
    return merges


def py_apply_bpe(
    text: str | None, merges: list[tuple[str, str, int]]
) -> list[str]:
    """Single-process reference twin of :func:`apply_bpe`."""
    if text is None:
        return []
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    out: list[str] = []
    for w in _WS.split(text):
        if w:
            out.extend(_py_word_bpe(w, ranks))
    return out
