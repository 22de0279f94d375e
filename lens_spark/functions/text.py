"""Text-analysis functions for training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage codegen) — no Python
in any of these. Each has a deliberately simple, *documented* definition so
the DuckDB oracle can reproduce it exactly.

- language id: marker-stopword voting (n-gram-free heuristic; real systems
  use char n-gram models — this is the deterministic, SQL-checkable core)
- quality score: length / punctuation-ratio / stopword-ratio composite
- token counting: whitespace tokens + a BPE-ish regex token count
- fingerprint: md5 of whitespace-normalized lowercased text (rolling-hash
  class of document fingerprints, exactly reproducible in any engine)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lens_spark.functions.hof import filter_u

# marker words per language — tiny curated sets; voting is by hit count
LANG_MARKERS: dict[str, tuple] = {
    "en": ("the", "and", "of", "to", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "que", "pour", "dans"),
    "es": ("el", "la", "los", "que", "es", "y", "por", "con"),
}

EN_STOPWORDS = (
    "the a an and or of to in is are was were be for with on at by it this"
).split()

_WS_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(col: Column) -> Column:
    # filter_u: several ws_tokens/marker-hit lambdas often share one
    # projection (lang_id builds four) — see functions/hof.py
    return filter_u(F.split(col, _WS_SPLIT), lambda t: F.length(t) > 0)


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish regex token count (letters / digits / single symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def _marker_hits(tokens: Column, markers: tuple) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(filter_u(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(col: Column) -> Column:
    """Marker-voting language id over lowercased whitespace tokens.

    Deterministic tie-break: languages compared as (hits, lang-code)
    structs and the greatest wins — equal scores resolve to the
    lexicographically larger code ('fr' beats 'en' at equal hits).
    Documents with zero marker hits → 'und' (undetermined, BCP-47)."""
    toks = ws_tokens(F.lower(col))
    best = F.greatest(
        *[
            F.struct(
                _marker_hits(toks, m).alias("hits"),
                F.lit(code).alias("lang"),
            )
            for code, m in sorted(LANG_MARKERS.items())
        ]
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(col: Column) -> Column:
    punct = F.length(col) - F.length(
        F.regexp_replace(col, r"[^\w\s]", "")
    )
    return punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    toks = ws_tokens(F.lower(col))
    return _marker_hits(toks, tuple(EN_STOPWORDS)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]:

    0.4·length_term + 0.3·(1−punct_ratio) + 0.3·stopword_term

    length_term  = least(n_chars, 2000)/2000
    stopword_term= least(stopword_ratio·4, 1)   (≈25% stopwords is ideal)
    """
    length_term = F.least(F.length(col), F.lit(2000)) / F.lit(2000.0)
    sw_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    return (
        0.4 * length_term + 0.3 * (1 - punct_ratio(col)) + 0.3 * sw_term
    ).cast("double")


def normalize_text(col: Column) -> Column:
    """lowercase + collapse whitespace + trim — the canonical form used
    for exact-dup hashing and fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def winnow_fingerprints(col: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS scheme): the rolling-hash document fingerprint that guarantees
    any match of length ≥ w+k-1 shares a selected hash.

    Pure Catalyst: char k-grams of the normalized text → 60-bit hash per
    gram (md5-prefix, same bit-reproducible form the simhash uses, so the
    DuckDB oracle matches) → per window of w consecutive gram hashes keep
    the minimum → sorted distinct selected hashes.

    O(n·w) per doc via slice-min (the classic O(n) deque doesn't exist as
    a Catalyst primitive; w is small, 4-8, so the constant is fine) —
    entirely JVM-side, no shuffle, no Python."""
    from lens_spark.functions.hof import transform_u

    t = normalize_text(col)
    n = F.length(t)
    # substring with a COLUMN start position needs the SQL function
    # (F.substring requires literal positions) — call_function it
    grams = F.when(
        n >= k,
        transform_u(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.call_function("substring", t, i, F.lit(k))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
        ),
    ).otherwise(
        F.array(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        )
    )
    m = F.size(grams)
    selected = F.when(
        m >= w,
        transform_u(
            F.sequence(F.lit(1), F.greatest(m - w + 1, F.lit(1))),
            lambda j: F.array_min(F.slice(grams, j, w)),
        ),
    ).otherwise(F.array(F.array_min(grams)))
    return F.array_sort(F.array_distinct(selected))
