"""Search tier — DataFrame layer over the extracted table.

Reimplements the reference's query semantics (engine/query.go:36-102,
engine/engine.go:172-214) as Catalyst expressions:

- **Conjunction** (Q1): every provided clause must match — boolean columns
  AND-folded (query.NewConjunctionQuery, query.go:37).
- **Match-phrase on content** (Q2): tokenized-adjacency match of the query
  phrase against the content token stream (bleve MatchPhrase, query.go:42-46).
- **Required terms** (Q3): each required string split on spaces, tokens of
  length ≤1 dropped, lowercased, matched as ONE should-group (any-of) with
  boost ×100 (query.go:49-53, 82-102).
- **Tags / Categories / MimeTypes** (Q4): exact (case-insensitive,
  trimmed) membership — the *intended* semantics of the reference's test
  matrix (engine_test.go:151-229: category 'amazing startup' matches,
  'amazing' alone must not; note the negative cases in that test are
  weakly asserted, engine_test.go:240-251 — we implement the intent).
- **DocID filter** (Q5): filter-only, must combine with other clauses
  (query.go:25-26).
- **Tokenizer** (Q6): split on spaces, drop len ≤ 1, lowercase
  (query.go:80-99).
- **Top-k + score** (Q7): scoring + `orderBy desc limit 1000`
  (engine.go:175-205). Default scoring='tf' is a cheap deterministic
  term-frequency ratio; scoring='tfidf' computes Lucene classic
  similarity — sqrt(tf)·idf²·queryNorm·fieldNorm, the formula bleve's
  term scorer implements — from a one-pass corpus-stats aggregation
  (the index-dictionary lookup bleve does per query); scoring='bm25'
  computes Okapi BM25 with the Lucene-6+ idf variant (ln(1+(N−df+0.5)/
  (df+0.5))) and k1/b length normalization from the same one-pass
  stats (plus avgdl). None is bit-identical to a given bleve build
  (the reference treats score as an opaque float, result.go:12-17);
  ordering among equal scores is doc_id for stability.
- **Projection** (Q8): all metadata fields except content
  (engine.go:177, index.go:20-26).
- **Empty result** (Q9): caller checks; `search()` mirrors the engine by
  raising ``NoResultsError`` ("no results found", engine.go:203-205).

Content for a document = concatenation of its extracted span texts in
order (the interleaved-model analogue of the single content string the
reference indexes, engine/engine.go:144-150).

Scale: every clause is a Catalyst expression over one scan — predicate
pushdown applies to category/mime equality; the top-k is
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from lens_spark.config import SearchConfig, DEFAULT_SEARCH
from lens_spark.functions.hof import exists_u, filter_u, transform_u


class NoResultsError(Exception):
    """reference engine.go:203-205"""


class SearchDeadlineError(Exception):
    """reference engine.go:196-198: 30 s context deadline on search"""


# bleve's `en` stop token filter = Lucene's classic 33-word English stop
# set (bleve/analysis/lang/en; public Lucene constant). The reference's
# index mapping uses the standard analyzer which applies it at index time
# (engine/index.go:44); our default analyzer keeps stop words for
# match/no-match parity with the test matrix, and `remove_stop_words`
# opts into bleve-faithful token streams.
STOP_WORDS_EN = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
    .split()
)

# Version stamp of the content analyzer (``analyze``): v1 = the round-2
# ASCII separator class, v2 = the Unicode ``[^\p{L}\p{N}]+`` class
# (ADVICE r2). ``prepare_search_index`` stamps it on the materialized
# table; ``search()`` re-analyzes (with a warning) when a stored table
# carries a different or missing stamp — silently trusting v1 tokens
# would mismatch Unicode query tokens ('café' tokenized as 'caf') with
# no error (ADVICE r3). Bump this whenever ``analyze`` changes
# behavior; existing tables then re-analyze until reindexed.
ANALYZER_VERSION = 3  # v3: Greek final-sigma folding (see analyze())


class EmptyQueryError(Exception):
    """reference v2.go:150-158: reject if no query and no options"""


@dataclass
class Query:
    """reference engine/query.go:15-27"""

    text: str = ""
    required: list = field(default_factory=list)
    tags: list = field(default_factory=list)
    categories: list = field(default_factory=list)
    mime_types: list = field(default_factory=list)
    hashes: list = field(default_factory=list)

    def is_empty(self) -> bool:
        return not (
            self.text or self.required or self.tags or self.categories
            or self.mime_types or self.hashes
        )


def tokenize(col: Column) -> Column:
    """Q6 (query.go:80-99): split on ' ', drop len<=1, lowercase.
    This is the QUERY-side term builder (the reference applies it when
    constructing term queries)."""
    return filter_u(
        F.split(F.lower(col), " "), lambda t: F.length(t) > 1
    )


def analyze(col: Column, remove_stop_words: bool = False) -> Column:
    """CONTENT-side analyzer — the DataFrame analogue of bleve's standard
    analyzer used at index time (word tokenizer + lowercase;
    engine/index.go:44 default text mapping): split on any run of
    non-alphanumerics, drop empties.

    The separator class is UNICODE non-alphanumeric ``[^\\p{L}\\p{N}]+``
    (ADVICE r2: the round-2 ASCII class tokenized 'café'→'caf',
    diverging from bleve's Unicode tokenizer on every non-English
    corpus) — and deliberately identical in all three engines so content
    and query tokenize the same way:

    - JVM: ``[^\\p{L}\\p{N}]+`` (underscore is \\p{Pc}, hence a
      separator). Measured as fast as the ASCII ``[\\W_]+`` and ~7x
      faster than the explicit range class ``[^0-9a-zA-Z]+`` (the JVM
      regex trap, see repo memory);
    - query-side Python (``_analyze_py``): ``[\\W_]+`` WITHOUT re.ASCII
      — Python's \\w is exactly L∪N∪{_}, so [\\W_] = non-(L∪N);
    - DuckDB oracle: RE2 ``[^\\p{L}\\p{N}]+``.

    Verified three-way identical on 'café über straße 北京 a_b i18n'.
    Known residual divergence (documented, not load-bearing): Java
    additionally treats combining marks (\\p{Mn}..), ZWJ/ZWNJ and exotic
    \\p{Pc} as word chars — NFC-normalized text (the overwhelming real
    case) never exposes it.

    Greek final sigma is FOLDED (ς → σ) after lowercasing: JVM and
    Python lowercase apply SpecialCasing's contextual rule (ΣΟΦΟΣ →
    σοφος) while DuckDB and Go's strings.ToLower — the reference's own
    analyzer substrate — use the simple per-rune mapping (σοφοσ), the
    one conditional mapping that differs across the four engines
    (measured). Folding converges every form to σ, exactly what
    Lucene's GreekLowerCaseFilter does, and makes the token stream
    byte-identical in all engines. Pinned by
    tests/test_search.py::test_analyzer_sigma_folding and fuzzed by
    tests/test_property.py.

    ``remove_stop_words=True`` additionally drops bleve/Lucene's standard
    English stop set (bleve's ``en`` analyzer token filter) — see
    ``STOP_WORDS_EN``; the default analyzer used for match/no-match parity
    keeps them (scores differ from bleve either way, documented)."""
    # r06: extract the token runs directly instead of splitting on the
    # separator class and dropping empties — identical output for every
    # input (both yield the maximal [\p{L}\p{N}]+ runs in order; the
    # split form additionally produced leading/between empties that the
    # lambda filter removed), one regex pass, no empty-string churn, no
    # interpreted per-element filter (HOF lambdas are excluded from
    # codegen subexpression elimination).
    toks = F.regexp_extract_all(
        F.translate(F.lower(col), "ς", "σ"),
        F.lit(r"[\p{L}\p{N}]+"), F.lit(0),
    )
    if remove_stop_words:
        toks = filter_u(toks, lambda t: ~t.isin(*sorted(STOP_WORDS_EN)))
    return toks


def _analyze_py(text: str, remove_stop_words: bool = False) -> list[str]:
    """Query-side analyzer — same separator class and stop handling as
    the content-side ``analyze`` (asymmetry would silently break
    matches). Unicode by default: Python ``[\\W_]`` ≡ non-(L∪N) ≡ the
    JVM's ``[^\\p{L}\\p{N}]`` (see ``analyze``)."""
    import re as _re

    toks = [
        t
        for t in _re.split(r"[\W_]+", text.lower().replace("ς", "σ"))
        if t
    ]
    if remove_stop_words:
        toks = [t for t in toks if t not in STOP_WORDS_EN]
    return toks


def doc_content(extracted: DataFrame) -> DataFrame:
    """Flatten extracted spans into one content string per doc (offset
    order is already materialized in the spans array).

    r06: ``array_join(spans.text, ' ', '')`` ≡ the old
    ``array_join(transform(spans, s → coalesce(s.text, '')), ' ')`` —
    null elements/fields become '' either way — but the lambda-free
    field extraction lets nested-schema pruning reach the scan
    (ReadSchema: spans.element.text only, not the whole struct) and the
    whole expression stays codegen-able."""
    return extracted.withColumn(
        "content",
        F.array_join(F.col("spans.text"), " ", ""),
    )


def prepare_search_index(extracted: DataFrame,
                         cfg: SearchConfig = DEFAULT_SEARCH) -> DataFrame:
    """Write-time analysis: materialize the `content` and `tokens`
    columns once so queries don't re-tokenize every document per search
    (bleve does exactly this — analysis happens at index time,
    engine/index.go:40-60; re-analyzing per query is the DataFrame-layer
    shortcut that stops being acceptable at 10^9 docs). Store the result
    (e.g. ``table.merge_upsert(prepare_search_index(df), 'doc_id')``);
    ``search()`` detects the materialized `tokens` column and skips
    per-query analysis.

    The output carries an ``analyzer_version`` stamp (see
    ``ANALYZER_VERSION``) so a later engine with a changed analyzer
    detects the mismatch instead of silently comparing differently-
    tokenized streams. Note the LensTable layer does not schema-evolve
    carried-forward buckets: adding the stamp to a table written by a
    pre-stamp engine requires a reindex (``reindex=True``), which is
    also what refreshes the stale tokens themselves."""
    return doc_content(extracted).withColumn(
        "tokens", analyze(F.col("content"), cfg.remove_stop_words)
    ).withColumn("analyzer_version", F.lit(ANALYZER_VERSION))


def _stored_analyzer_version(df: DataFrame):
    """Version stamp of a stored tokens table: the stamped value, or
    None when the table is EMPTY (nothing can mismatch). Returns -1
    (→ mismatch, re-analyze) for every unknown-provenance shape:
    missing stamp column, NULL stamp values (schema-evolved/backfilled
    rows), or MIXED stamps (increments written by different engine
    versions) — trusting any of them silently is exactly the bug the
    stamp exists to prevent. The distinct-probe is a single pruned
    column scan, negligible next to the full-table match scan that
    follows it."""
    if "analyzer_version" not in df.columns:
        return -1
    rows = df.select("analyzer_version").distinct().limit(2).collect()
    if not rows:
        return None
    if len(rows) > 1 or rows[0][0] is None:
        return -1
    return rows[0][0]


def _phrase_clause(tokens_col: Column, phrase: str,
                   remove_stop_words: bool = False) -> Column:
    """Tokenized-adjacency phrase match. The query phrase is normalized
    with the same tokenizer; a doc matches when its token stream contains
    the query tokens consecutively."""
    q = _analyze_py(phrase, remove_stop_words)
    if not q:
        return F.lit(True)
    qarr = F.array(*[F.lit(t) for t in q])
    n = len(q)
    # exists i in [1, len-n+1]: slice(tokens, i, n) == qarr
    # (sequence() descends when start > stop, so clamp and pre-guard)
    return (F.size(tokens_col) >= n) & exists_u(
        F.sequence(F.lit(1), F.greatest(F.size(tokens_col) - n + 1, F.lit(1))),
        lambda i: F.slice(tokens_col, i, n) == qarr,
    )


def _corpus_term_stats(df: DataFrame, terms: list[str]
                       ) -> tuple[int, dict[str, int]]:
    """N (corpus size) + per-term document frequency in ONE aggregation
    pass (JVM-side array_contains, no lambdas). Driver-collects one row
    of len(terms)+1 longs — bounded by the query's term count, never by
    the corpus. This is the stat lookup a bleve/Lucene index serves from
    its dictionary; the DataFrame analogue pays one scan per query, so
    it's opt-in (SearchConfig.scoring='tfidf')."""
    n, dfs, _ = _corpus_term_stats_avgdl(df, terms)
    return n, dfs


def _corpus_term_stats_avgdl(
    df: DataFrame, terms: list[str]
) -> tuple[int, dict[str, int], float]:
    """:func:`_corpus_term_stats` plus average document length in tokens
    (the extra corpus statistic BM25's length normalization needs) —
    still ONE aggregation pass, one driver row."""
    aggs = [
        F.count("*").alias("__n"),
        F.sum(F.size("tokens").cast("long")).alias("__toks"),
    ] + [
        F.sum(F.array_contains(F.col("tokens"), t).cast("long"))
        .alias(f"__df_{i}")
        for i, t in enumerate(terms)
    ]
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    avgdl = float(row["__toks"] or 0) / max(n, 1)
    return n, {
        t: int(row[f"__df_{i}"] or 0) for i, t in enumerate(terms)
    }, avgdl


def _lucene_idf(df_count: int, n_docs: int) -> float:
    """Lucene classic idf (what bleve's term scorer uses):
    1 + ln(N / (df + 1))."""
    import math

    return 1.0 + math.log(max(n_docs, 1) / (df_count + 1))


def _group_score(tokens_col: Column, group_terms: list[str],
                 idf: dict[str, float], boost: float = 1.0) -> Column:
    """Lucene classic similarity for one should-group (the bleve term
    scorer's formula): Σ_t sqrt(tf_t) · idf_t² · queryNorm · boost,
    all × fieldNorm = 1/sqrt(|d|). idf values are driver-side literals
    (from _corpus_term_stats), so the whole score is one JVM expression."""
    import math

    qnorm = 1.0 / math.sqrt(
        sum(idf[t] ** 2 for t in group_terms) or 1.0
    )
    field_norm = F.lit(1.0) / F.sqrt(
        F.greatest(F.size(tokens_col), F.lit(1)).cast("double")
    )
    comp: Column | None = None
    for t in group_terms:
        tf = F.size(
            filter_u(tokens_col, lambda x, t=t: x == t)
        ).cast("double")
        c = F.sqrt(tf) * F.lit(idf[t] ** 2 * qnorm * boost)
        comp = c if comp is None else comp + c
    return comp * field_norm


def _bm25_idf(df_count: int, n_docs: int) -> float:
    """Okapi BM25 idf, the Lucene BM25Similarity variant (default
    scorer since Lucene 6 — what a modern bleve/Lucene deployment
    ranks with): ln(1 + (N - df + 0.5) / (df + 0.5)). Always ≥ 0."""
    import math

    return math.log(
        1.0 + (max(n_docs, 1) - df_count + 0.5) / (df_count + 0.5)
    )


def _bm25_group_score(
    tokens_col: Column,
    group_terms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    boost: float = 1.0,
) -> Column:
    """BM25 for one should-group: Σ_t idf_t · tf·(k1+1) /
    (tf + k1·(1 − b + b·|d|/avgdl)). idf/avgdl are driver-side literals
    (from :func:`_corpus_term_stats_avgdl`), so the whole score is one
    JVM expression over the stored token column — map-only, no
    per-query shuffle.

    Expression shape note (ADVICE r4 classifier lesson): the length
    term multiplies ``dl`` by the single literal ``b/avgdl`` rather
    than computing ``b·(dl/avgdl)``; any oracle mirroring this score
    must use the identical operation order or risk 1-ulp drift."""
    dl = F.size(tokens_col).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b / avgdl) * dl)
    comp: Column | None = None
    for t in group_terms:
        tf = F.size(
            filter_u(tokens_col, lambda x, t=t: x == t)
        ).cast("double")
        c = F.lit(idf[t] * boost) * (tf * F.lit(k1 + 1.0)) / (tf + norm)
        comp = c if comp is None else comp + c
    return comp


def _required_terms(required: list[str]) -> list[str]:
    """query.go:82-102: multi-word strings split on spaces (len>1 kept),
    single strings trimmed (len>1 kept); all lowercased into one
    should-group."""
    terms: list[str] = []
    for s in required:
        parts = s.split()
        if len(parts) > 1:
            terms.extend(p.lower() for p in parts if len(p) > 1)
        else:
            stripped = s.strip()
            if len(stripped) > 1:
                terms.append(stripped.lower())
    return terms


def _exact_in(col: Column, values: list[str]) -> Column:
    lowered = [v.strip().lower() for v in values]
    return F.lower(F.trim(col)).isin(lowered)


def search(
    extracted: DataFrame,
    q: Query,
    cfg: SearchConfig = DEFAULT_SEARCH,
) -> DataFrame:
    """Run a query; returns (doc_id, display_name, mime_type, category,
    tags, score) top-k by score (Q7/Q8)."""
    if q.is_empty():
        raise EmptyQueryError(
            "no query or search options provided"  # v2.go:150-158
        )

    # prefer a write-time token column (prepare_search_index) — analysis
    # per query is linear in corpus size and pure waste when repeated.
    # Contract: stored tokens were produced with the INDEX-time cfg; a
    # per-query cfg with different stop-word handling does not re-analyze
    # (bleve behaves the same way — the analyzer is part of the index
    # mapping, not the query). Stored tokens are trusted ONLY when their
    # analyzer_version stamp matches the running engine's (ADVICE r3: a
    # v1-ASCII-tokenized table silently mismatches v2 Unicode query
    # tokens); a missing/stale stamp falls back to re-analysis with a
    # warning. The stamp probe is a limit-1 job on one column — O(one
    # partition), paid once per search() call on a stored table.
    analyzed_per_query = True
    if "tokens" in extracted.columns:
        if _stored_analyzer_version(extracted) in (ANALYZER_VERSION, None):
            analyzed_per_query = False
        else:
            import warnings

            warnings.warn(
                "stored tokens were produced by a different analyzer "
                f"version (table != engine v{ANALYZER_VERSION}); "
                "re-analyzing per query — reindex to refresh the table",
                stacklevel=2,
            )

    # metadata clauses (Q4/Q5) reference only stored columns — apply
    # them BELOW tokenization (r06): they push down to the scan
    # (PushedFilters), and the per-query analyzer then runs over the
    # survivors only instead of the whole corpus. AND-reordering —
    # the result set is unchanged.
    meta_clauses: list[Column] = []
    if q.tags:
        meta_clauses.append(
            exists_u(F.col("tags"), lambda t: _exact_in(t, q.tags))
        )
    if q.categories:
        meta_clauses.append(_exact_in(F.col("category"), q.categories))
    if q.mime_types:
        meta_clauses.append(_exact_in(F.col("mime_type"), q.mime_types))
    if q.hashes:
        meta_clauses.append(F.col("doc_id").isin(list(q.hashes)))

    base = extracted
    for c in meta_clauses:
        base = base.filter(c)

    # Q8 projection: all metadata fields except content (engine.go:177,
    # index.go:20-26) — includes `indexed` (properties.indexed,
    # engine/index.go:36-38) when the table carries it; tolerate tables
    # written by pre-`indexed` versions of the engine.
    fields = ["doc_id", "display_name", "mime_type", "category", "tags"]
    if "indexed" in base.columns:
        fields.append("indexed")

    qtoks = _analyze_py(q.text, cfg.remove_stop_words) if q.text else []
    terms = _required_terms(q.required)

    df = prepare_search_index(base, cfg) if analyzed_per_query else base

    clauses: list[Column] = []
    score: Column = F.lit(0.0)
    idf: dict[str, float] = {}
    avgdl = 1.0
    if cfg.scoring in ("tfidf", "bm25") and (qtoks or terms):
        # one corpus pass for N + df (+ avgdl for bm25), folded into
        # literals (bleve reads the same stats from the index dictionary
        # per query). Stats are CORPUS-GLOBAL — computed over the
        # unfiltered table, exactly like an index dictionary, never over
        # the meta-filtered subset.
        stats_df = (
            prepare_search_index(extracted, cfg)
            if analyzed_per_query else extracted
        )
        n_docs, dfs, avgdl = _corpus_term_stats_avgdl(
            stats_df, sorted({*qtoks, *terms})
        )
        if cfg.scoring == "bm25":
            idf = {t: _bm25_idf(c, n_docs) for t, c in dfs.items()}
        else:
            idf = {t: _lucene_idf(c, n_docs) for t, c in dfs.items()}

    if q.text:
        clauses.append(
            _phrase_clause(F.col("tokens"), q.text, cfg.remove_stop_words)
        )
        if qtoks:
            if cfg.scoring == "bm25":
                score = score + _bm25_group_score(
                    F.col("tokens"), qtoks, idf, avgdl,
                    k1=cfg.bm25_k1, b=cfg.bm25_b,
                )
            elif cfg.scoring == "tfidf":
                score = score + _group_score(F.col("tokens"), qtoks, idf)
            else:
                qarr = F.array(*[F.lit(t) for t in qtoks])
                score = score + F.size(
                    filter_u(F.col("tokens"),
                             lambda t: F.array_contains(qarr, t))
                ) / F.greatest(F.size("tokens"), F.lit(1))

    if q.required:
        if terms:
            tarr = F.array(*[F.lit(t) for t in terms])
            hits = F.size(
                filter_u(F.col("tokens"), lambda t: F.array_contains(tarr, t))
            )
            clauses.append(hits > 0)
            # boost ×100 (query.go:52)
            if cfg.scoring == "bm25":
                score = score + _bm25_group_score(
                    F.col("tokens"), terms, idf, avgdl,
                    k1=cfg.bm25_k1, b=cfg.bm25_b,
                    boost=cfg.required_boost,
                )
            elif cfg.scoring == "tfidf":
                score = score + _group_score(
                    F.col("tokens"), terms, idf, boost=cfg.required_boost
                )
            else:
                score = score + cfg.required_boost * hits / F.greatest(
                    F.size("tokens"), F.lit(1)
                )
        else:
            # required strings that normalize to nothing (e.g. "   ")
            # build an empty should-group in the reference, which can
            # never match (bleve boolean query with no clauses)
            clauses.append(F.lit(False))

    if clauses:
        cond = clauses[0]
        for c in clauses[1:]:
            cond = cond & c
        if analyzed_per_query:
            # Evaluate the token clauses against a MATERIALIZED
            # projection (r06): with the plain filter-above-project
            # shape the optimizer pushes the condition below the tokens
            # projection by re-inlining the analyzer into it, and
            # lambda-bearing expressions are excluded from both CSE and
            # codegen subexpression elimination — so the full
            # tokenization ran once in the Filter and again in the
            # scoring Project (2x per row, measured in the plan). The
            # barrier is a no-op CollectMetrics node (`observe`):
            # PushPredicateThroughNonJoin does not push filters through
            # it, and it costs one count accumulator (verified on Spark
            # 4.1 — non-deterministic dummy columns get column-pruned
            # and `rand() < 0` gets constant-folded, so neither works
            # as a barrier). Deterministic, retry-safe, no row change.
            # Stored-tokens tables skip the barrier: their tokens are
            # scan columns, and blocking pushdown there would cost the
            # scan its PushedFilters.
            import uuid as _uuid

            pre = df.select(
                *fields,
                score.cast("double").alias("score"),
                cond.alias("__keep"),
            ).observe(
                f"lens_search_barrier_{_uuid.uuid4().hex[:12]}",
                F.count(F.lit(1)).alias("rows_scored"),
            )
            topk = pre.filter(F.col("__keep")).select(*fields, "score")
        else:
            topk = df.filter(cond).select(
                *fields, score.cast("double").alias("score")
            )
    else:
        # metadata-only query: every clause already applied below
        topk = df.select(*fields, score.cast("double").alias("score"))
    return _finish_topk(topk, fields, cfg)


def _finish_topk(scored: DataFrame, fields: list,
                 cfg: SearchConfig) -> DataFrame:
    """Shared top-k tail: order, limit, optional max-score normalize."""
    topk = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(cfg.top_k)
    )
    if cfg.normalize_max_score:
        # bleve tracks MaxScore per result set (engine.go:190 logs
        # out.MaxScore); normalized = score / max(score). The window is
        # global but runs over <= top_k (1000) already-limited rows — a
        # single-partition window on a bounded set, not a scale concern.
        from pyspark.sql import Window

        w = Window.partitionBy()
        topk = topk.withColumn(
            "score",
            (F.col("score")
             / F.greatest(F.max("score").over(w), F.lit(1e-12)))
            .cast("double"),
        ).orderBy(F.desc("score"), F.asc("doc_id"))
    return topk


def _collect_with_deadline(df: DataFrame, seconds: float):
    """Collect with the reference's search deadline (engine.go:196-198:
    30 s context deadline). The collect runs in a worker thread holding a
    job group (PySpark pinned-thread mode makes setJobGroup thread-local);
    on timeout the group is cancelled and SearchDeadlineError raised."""
    import threading
    import uuid

    spark = df.sparkSession
    group = f"lens-search-{uuid.uuid4().hex[:12]}"
    out: list = []
    err: list = []

    def run():
        try:
            spark.sparkContext.setJobGroup(group, "lens search", True)
            out.append(df.collect())
        except Exception as e:  # surfaced to caller below
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        raise SearchDeadlineError(
            f"failed to execute search: deadline of {seconds}s exceeded"
        )
    if err:
        raise err[0]
    return out[0]


def search_or_raise(extracted: DataFrame, q: Query,
                    cfg: SearchConfig = DEFAULT_SEARCH):
    """Engine-faithful wrapper: 30 s deadline (engine.go:196-198),
    0 hits ⇒ error (engine.go:203-205)."""
    rows = _collect_with_deadline(search(extracted, q, cfg), cfg.deadline_s)
    if not rows:
        raise NoResultsError("no results found")
    return rows


def export_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Inverted-index export: the flat ``(token, doc_id, tf, df)``
    postings table an ONLINE index (OpenSearch/Lucene/pg_trgm — the
    README serving path this backs) bulk-loads. Analyzer = the same
    :func:`analyze` the search tier stores, so the online replica and
    the Spark facade agree on tokenization by construction.

    ``k`` caps each token's postings at its k highest-tf documents
    (tf desc, doc asc — the impact-ordered index-pruning rule,
    Anh & Moffat: serving top-k queries rarely needs the full list of
    a stop-word-grade token). The cap runs through
    :func:`~lens_spark.operators.mixing.top_k_per_group` — cell
    decomposition, so the hottest token costs its boundary sliver,
    never a whole-token sort on one partition.

    100 TB shape: explode is map-only; tf is one map-side-combined
    groupBy on (token, doc); df is a second combine on token (rows
    already one-per-doc); the df join-back is a plain equi-join on
    token AQE-sizes (vocab can be model-sized OR huge — never forced
    broadcast). No collect anywhere; the output is a table, written
    like any other export."""
    from lens_spark.operators.mixing import top_k_per_group

    tf = (
        docs.select(
            F.col(id_col),
            F.explode(analyze(F.col(text_col))).alias("token"),
        )
        .groupBy("token", id_col)
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    capped = (
        top_k_per_group(tf, "token", "tf", k, id_col)
        .select("token", id_col, "tf")
        if k is not None
        else tf
    )
    return capped.join(dfreq, "token").select(
        "token", id_col, "tf", "df"
    )
