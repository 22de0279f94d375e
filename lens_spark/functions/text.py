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

from lens_spark.functions.hof import filter_u, transform_u

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
    # \S+ extraction ≡ split-on-\s+ + drop-empties (identical output for
    # every input, incl. leading/trailing/multiple separators and ""),
    # in ONE regex pass with no empty-string churn and no per-element
    # lambda filter (HOF lambdas are excluded from codegen subexpression
    # elimination, so they were the expensive half — measured r06)
    return F.regexp_extract_all(col, F.lit(r"\S+"), F.lit(0))


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


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A.1.1
# — public paper; the same rule set underlies C4/MassiveText-style
# training-data curation). Each rule is a deterministic, SQL-checkable
# predicate; thresholds are the paper's.
GOPHER_REQUIRED_WORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with"
)


def _doc_lines(col: Column) -> Column:
    return filter_u(
        F.split(col, r"\n"), lambda ln: F.length(F.trim(ln)) > 0
    )


def gopher_quality_flags(col: Column) -> Column:
    """Gopher quality-filter flags as one struct — pure Catalyst, one
    pass over the text, no shuffle. Fields (thresholds from the paper):

    - ``word_count_ok``: 50 ≤ words ≤ 100 000
    - ``mean_word_len_ok``: 3 ≤ mean word length ≤ 10
    - ``symbol_ratio_ok``: (# + '...' occurrences) / words ≤ 0.1
    - ``bullet_ok``: ≤ 90% of lines start with a bullet
    - ``ellipsis_ok``: ≤ 30% of lines end with an ellipsis
    - ``alpha_ok``: ≥ 80% of words contain ≥ 1 alphabetic char
    - ``stop_ok``: ≥ 2 distinct words of GOPHER_REQUIRED_WORDS present
    - ``keep``: AND of all of the above

    The ratios behind the flags are exposed by
    :func:`gopher_quality_metrics` (same expressions) so pipelines can
    re-threshold without re-reading."""
    m = gopher_quality_metrics(col)
    word_count_ok = (m["n_words"] >= 50) & (m["n_words"] <= 100_000)
    mean_ok = (m["mean_word_len"] >= 3.0) & (m["mean_word_len"] <= 10.0)
    symbol_ok = m["symbol_ratio"] <= 0.1
    bullet_ok = m["bullet_line_frac"] <= 0.9
    ellipsis_ok = m["ellipsis_line_frac"] <= 0.3
    alpha_ok = m["alpha_word_frac"] >= 0.8
    stop_ok = m["stop_hits"] >= 2
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ratio_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (word_count_ok & mean_ok & symbol_ok & bullet_ok & ellipsis_ok
         & alpha_ok & stop_ok).alias("keep"),
    )


def gopher_quality_metrics(col: Column) -> Column:
    """The raw Gopher-rule measurements as a struct of doubles/longs —
    the exact expressions :func:`gopher_quality_flags` thresholds.
    Divisions are guarded (greatest(·,1)) so empty docs yield 0-valued
    ratios, not errors (ANSI mode)."""
    from lens_spark.functions.hof import aggregate_u, transform_u

    words = ws_tokens(col)
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    total_chars = aggregate_u(
        transform_u(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_word_len = total_chars / nw
    hash_count = F.length(col) - F.length(
        F.regexp_replace(col, r"#", "")
    )
    ellipsis_count = F.size(
        F.regexp_extract_all(col, F.lit(r"\.\.\.|…"), 0)
    )
    symbol_ratio = (hash_count + ellipsis_count) / nw
    lines = _doc_lines(col)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.size(
        filter_u(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])"))
    ) / n_lines
    ellipsis_line_frac = F.size(
        filter_u(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    ) / n_lines
    alpha_frac = F.size(
        filter_u(words, lambda w: w.rlike("[A-Za-z]"))
    ) / nw
    lowered = ws_tokens(F.lower(col))
    stop_hits = None
    for m in GOPHER_REQUIRED_WORDS:
        hit = F.array_contains(lowered, m).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    return F.struct(
        n_words.alias("n_words"),
        mean_word_len.cast("double").alias("mean_word_len"),
        symbol_ratio.cast("double").alias("symbol_ratio"),
        bullet_frac.cast("double").alias("bullet_line_frac"),
        ellipsis_line_frac.cast("double").alias("ellipsis_line_frac"),
        alpha_frac.cast("double").alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )


def repetition_ratios(col: Column, ngram: int = 3) -> Column:
    """Within-document repetition measurements (the Gopher repetition
    filters' SQL-checkable core): struct of

    - ``dup_line_frac``: 1 − distinct/total over non-empty lines
    - ``dup_ngram_frac``: 1 − distinct/total over word ``ngram``-grams

    Pure Catalyst, bounded per doc, no shuffle. The paper thresholds
    (dup_line_frac ≤ 0.3, dup 3-gram char fraction by size) apply
    downstream; this exposes the measurements.

    r06: lines / tokens / grams are LET-BOUND (hof.let_u) — the gram
    lambda slices the token subtree per position (O(n²) re-tokenize, no
    CSE inside HOF lambdas), and the multiply-referenced line/gram
    arrays re-expanded per reference. Identical values."""
    from lens_spark.functions.hof import let_u, transform_u

    def _line_frac(lines: Column) -> Column:
        nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
        return (F.size(lines) - F.size(F.array_distinct(lines))) / nl

    def _gram_frac(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.when(
            n >= ngram,
            transform_u(
                F.sequence(F.lit(1), F.greatest(n - ngram + 1, F.lit(1))),
                lambda i: F.array_join(F.slice(toks, i, ngram), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))

        def _frac(g: Column) -> Column:
            ng = F.greatest(F.size(g), F.lit(1)).cast("double")
            return (F.size(g) - F.size(F.array_distinct(g))) / ng

        return let_u(grams, _frac)

    dup_line = let_u(
        transform_u(_doc_lines(col), lambda ln: F.trim(ln)), _line_frac
    )
    dup_gram = let_u(ws_tokens(col), _gram_frac)
    return F.struct(
        dup_line.cast("double").alias("dup_line_frac"),
        dup_gram.cast("double").alias("dup_ngram_frac"),
    )


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
    entirely JVM-side, no shuffle, no Python.

    r06: the normalized text and the gram-hash array are LET-BOUND via
    single-element transforms so each is evaluated once per row. The
    previous formulation referenced the `t` / `grams` SUBTREES inside
    the transform lambdas, and lambda-bearing expressions get no
    common-subexpression elimination — so the whole normalize pass
    re-ran per gram and the whole gram-hash array re-ran per window:
    O(n²) per document (measured: the doc_winnow row alone was 278 s
    of a 640 s all-rows sweep at sf0.1; 1.9 s after). Values are
    bit-identical — only the evaluation strategy changes."""
    from lens_spark.functions.hof import let_u as _let, transform_u

    def _selected(grams: Column) -> Column:
        m = F.size(grams)
        sel = F.when(
            m >= w,
            transform_u(
                F.sequence(F.lit(1), F.greatest(m - w + 1, F.lit(1))),
                lambda j: F.array_min(F.slice(grams, j, w)),
            ),
        ).otherwise(F.array(F.array_min(grams)))
        return F.array_sort(F.array_distinct(sel))

    def _fingers(t: Column) -> Column:
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
        return _let(grams, _selected)

    return _let(normalize_text(col), _fingers)


# C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
# public paper). Line rules: keep only lines that end in a terminal
# punctuation mark, have ≥ `min_words` words, and do not mention
# "javascript"; document flags: "lorem ipsum" and curly-brace (code)
# contamination. All pure Catalyst — one pass, no shuffle, SQL-checkable.
C4_TERMINALS = (".", "!", "?", '"', "'")


def _c4_line_ok(ln: Column, min_words: int) -> Column:
    t = F.trim(ln)
    ends_ok = F.substring(t, -1, 1).isin(*C4_TERMINALS)
    return (
        ends_ok
        & (F.size(ws_tokens(t)) >= min_words)
        & ~F.contains(F.lower(t), F.lit("javascript"))
    )


def c4_clean(col: Column, min_words: int = 3) -> Column:
    """C4 cleaning as one struct:

    - ``clean_text``: surviving lines re-joined with ``\\n``
    - ``n_kept`` / ``n_dropped``: line-filter accounting (the repo's
      no-silent-drops convention — filtering that can delete 90% of a
      crawl must be observable without a second pass)
    - ``has_lorem`` / ``has_brace``: document-level contamination flags
      (C4 discards these documents outright; the flag is emitted instead
      of the drop so callers choose the policy)
    """
    lines = F.split(col, r"\n")
    kept = filter_u(lines, lambda ln: _c4_line_ok(ln, min_words))
    kept_trimmed = transform_u(kept, F.trim)
    low = F.lower(col)
    return F.struct(
        F.array_join(kept_trimmed, "\n").alias("clean_text"),
        F.size(kept).alias("n_kept"),
        (F.size(lines) - F.size(kept)).alias("n_dropped"),
        F.contains(low, F.lit("lorem ipsum")).cast("int").alias("has_lorem"),
        F.contains(col, F.lit("{")).cast("int").alias("has_brace"),
    )


# PII redaction — the standard pre-training scrub (emails, IPv4s,
# phone-like digit runs) as sequential regexp_replace passes. The
# patterns deliberately use only the regex subset where Java
# (java.util.regex, Spark's engine) and RE2 (DuckDB's) agree byte-for-
# byte: ASCII classes, bounded quantifiers, non-capturing groups, \b —
# no lookaround, no backrefs — so the oracle can run the SAME patterns.
# Order matters and is part of the contract: emails first (their local
# part may contain digit runs), then IPv4 (dots would otherwise split
# into phone-ish fragments), then phones over the already-redacted text.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_redact(col: Column) -> Column:
    """Redact emails → IPv4s → phone-like runs; returns a struct of the
    redacted text and per-category match counts (counts are measured on
    the text as each pass sees it, so they equal the number of
    substitutions actually made)."""
    n_email = F.regexp_count(col, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phone = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return F.struct(
        t3.alias("redacted"),
        n_email.cast("int").alias("n_email"),
        n_ip.cast("int").alias("n_ip"),
        n_phone.cast("int").alias("n_phone"),
    )


# UTF-8-decoded-as-CP1252 artifacts (the classic double-encoding
# mojibake). "â€" is the CP1252 rendering of the UTF-8 lead bytes
# E2 80 shared by ALL general-punctuation artifacts (curly quotes,
# dashes, ellipsis — including the right-double-quote variant whose
# third byte decodes to the unprintable C1 control U+009D), so the
# bare two-char prefix covers that family; the Ã-pairs are the common
# Latin accents; "Â " is the nbsp artifact. Plain-literal
# alternation: portable across Java regex and RE2 (the pii_redact
# convention).
MOJIBAKE_RE = (
    "â€|"
    "Ã©|Ã¨|Ãª|Ã«|"
    "Ã¼|Ã¶|Ã¤|Ã±|"
    "Ã§|Ã |Ã¡|Ã³|"
    "Ãº|Ã­|"
    "Â "
)


def encoding_quality(col: Column) -> Column:
    """ftfy-lite encoding hygiene signal (the unicode-fixing pass Dolma
    / CCNet-style pipelines run before any text heuristic): counts of
    U+FFFD replacement characters (a decoder already gave up) and of
    CP1252-mojibake artifact sequences (``MOJIBAKE_RE``), plus the
    composite ``suspect`` flag. Detection only — the FIX needs the
    original bytes (re-encode latin-1/cp1252 → decode utf-8), which
    belongs upstream at extraction where the bytes still exist; callers
    route flagged docs there or drop them. Pure Catalyst, map-only, no
    shuffle."""
    n_repl = F.regexp_count(col, F.lit("�"))
    n_moji = F.regexp_count(col, F.lit(MOJIBAKE_RE))
    return F.struct(
        n_repl.cast("int").alias("n_replacement"),
        n_moji.cast("int").alias("n_mojibake"),
        ((n_repl > 0) | (n_moji > 0)).alias("suspect"),
    )


# ------------------------------------------------------ script detection
# Unicode-script char classes. JVM regex spells a script \p{IsLatin},
# RE2 (DuckDB) \p{Latin} — both are UAX #24 script properties, so counts
# agree (probed incl. Cyrillic/Greek/Han mixes). Counting uses
# regexp_extract-all length, which counts CODEPOINT matches on both
# engines for BMP scripts (all of these are BMP).
SCRIPTS = ("Latin", "Cyrillic", "Greek", "Han", "Arabic", "Hebrew",
           "Devanagari", "Hangul", "Hiragana", "Katakana")


def script_profile(col: Column) -> Column:
    """Writing-system profile: per-script character counts plus the
    dominant script — struct(n_latin, ..., dominant string).

    ``dominant`` = the script with the most characters (first in
    :data:`SCRIPTS` order on ties); ``'none'`` when no scripted
    character occurs (digits/punctuation/whitespace only) or text is
    null. Complements :func:`lang_id` (marker-word voting only works
    within a script; real pipelines gate on script first — CCNet
    routes by fastText langid which is script-aware).

    100 TB shape: map-only pure Catalyst — one regexp pass per script
    (Unicode classes, not ASCII ranges — the JVM's ASCII-range trap is
    12x slower, see SNIPPETS/memory), zero shuffles, whole-stage
    codegen.
    """
    counts = [
        F.size(
            F.regexp_extract_all(col, F.lit(rf"[\p{{Is{s}}}]"), F.lit(0))
        ).alias(f"n_{s.lower()}")
        for s in SCRIPTS
    ]
    best = F.greatest(*[
        F.struct(
            F.size(F.regexp_extract_all(
                col, F.lit(rf"[\p{{Is{s}}}]"), F.lit(0))).alias("n"),
            # DESCENDING priority for ties: earlier script wins ⇒ larger
            # tiebreak value; greatest() picks the max (n, tie) struct
            F.lit(len(SCRIPTS) - i).alias("tie"),
            F.lit(s.lower()).alias("name"),
        )
        for i, s in enumerate(SCRIPTS)
    ])
    dominant = F.when(
        col.isNull() | (best["n"] == 0), F.lit("none")
    ).otherwise(best["name"])
    return F.struct(*counts, dominant.alias("dominant"))


def lexicon_flags(
    col: Column,
    words: list[str] | None = None,
    phrases: list[str] | None = None,
) -> Column:
    """C4-style lexicon screen: the public C4 pipeline drops any page
    containing a word from its blocklist (the LDNOOBW list);
    RefinedWeb/Dolma carry the same signal as a tagger.  The LIST is
    the caller's — policy, locale and licensing live outside the
    engine, so this repo ships no lexicon.

    ``words`` match whole lowercased whitespace tokens
    (``arrays_overlap`` against a literal array — map-only, zero
    shuffle, codegen); ``phrases`` match as lowercased substrings.
    Returns ``struct(word_hit, phrase_hit, keep)`` ints —
    annotate-don't-drop (the curate() convention): keep the flags as
    columns, route drops through apply_mix / a filter so the attrition
    stays observable."""
    low = F.lower(F.coalesce(col, F.lit("")))
    word_hit = F.lit(False)
    if words:
        word_hit = F.arrays_overlap(
            ws_tokens(low),
            F.array(*[F.lit(w.lower()) for w in words]),
        )
    phrase_hit = F.lit(False)
    if phrases:
        acc = None
        for p in phrases:
            c = low.contains(p.lower())
            acc = c if acc is None else (acc | c)
        phrase_hit = acc
    keep = ~(word_hit | phrase_hit)
    return F.struct(
        word_hit.cast("int").alias("word_hit"),
        phrase_hit.cast("int").alias("phrase_hit"),
        keep.cast("int").alias("keep"),
    )
