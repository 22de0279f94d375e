"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full interleaved-extraction pipeline over a
deterministic spans corpus derived from sf0.001 documents, reporting
per-category doc counts and span totals.

``queries()`` / ``oracle_sql()`` — one pair per operator family from
SURVEY.md §2 plus the training-data ops. Spark and DuckDB run on the same
parquet views; every computed column is aliased identically on both sides.
Hash-sensitive operators (minhash, fingerprints, buckets) use md5 so both
engines produce bit-identical values.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF001 = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive an interleaved spans table from the sf0.001 flat
    documents (deterministic), run the full extraction pipeline, and
    return per-category counts with span totals."""
    from lens_spark.benchdata import derive_spans
    from lens_spark.pipeline import extract

    docs = derive_spans(_docs(spark, SF001))
    res = extract(docs)
    return (
        res.extracted.groupBy("category")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
        )
        .orderBy("category")
    )


# ---------------------------------------------------------------- queries
_FIT_MEMO: dict = {}  # per-process cache of expensive model fits
# (BPE merge tables, DSIR log-ratio tables) shared between the driver
# rows that train and the rows that apply — the fits are deterministic
# functions of (sf_dir, params), so caching changes nothing observable


def _memo_fit(key, fn):
    if key not in _FIT_MEMO:
        _FIT_MEMO[key] = fn()
    return _FIT_MEMO[key]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lens_spark.functions.mime import category_for, mime_parse, sniff_col
    from lens_spark.functions.text import (
        fingerprint, lang_id, quality_score, token_count_bpe, token_count_ws,
    )
    from lens_spark.operators.dedup import (
        exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs,
    )
    from lens_spark.functions.hof import exists_u, filter_u, transform_u
    from lens_spark.operators.search import analyze
    from lens_spark.operators.similarity import (
        ann_lsh_topk, cosine_topk, embedding_neardup_pairs,
    )
    from lens_spark.streaming.stream import windowed_event_counts

    # ---- extraction-tier ops (E1-E5, E12-E13, reassembly) over a spans
    # table derived 1:1 from the flat documents table in pure SQL-parity
    # expressions (see _sql_spans below)

    def q_mime_sniff(spark, sf):
        # E1/E2/E12: sniff document text bytes, parse, categorize
        d = _docs(spark, sf)
        mime = sniff_col(F.encode(F.col("text"), "UTF-8"))
        return d.select(
            "doc_id",
            mime.alias("mime_type"),
        ).withColumn("parsed", mime_parse(F.col("mime_type"))).withColumn(
            "category", category_for(F.col("mime_type"))
        ).orderBy("doc_id")

    def q_explode_reassemble(spark, sf):
        # M0 slice: explode the derived spans, reassemble ordered by
        # offset; emit one row per span in order (row-shaped so the
        # DuckDB value-hash compares arrays element-wise)
        from lens_spark.benchdata import derive_spans_sqlparity

        spans = derive_spans_sqlparity(_docs(spark, sf))
        ex = spans.select(
            "doc_id", F.explode("spans").alias("s")
        ).select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("ord"),
        )
        return ex.orderBy("doc_id", "ord")

    def q_text_passthrough(spark, sf):
        # E5: text/* identity; category literal 'document'
        return _docs(spark, sf).select(
            "doc_id",
            F.col("text").alias("content"),
            F.lit("document").alias("category"),
        ).orderBy("doc_id")

    def q_media_passthrough(spark, sf):
        # E13: media spans carried with stable media_ref, text NULL
        d = _docs(spark, sf)
        return d.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("ref-"), F.col("doc_id").cast("string"))
            .alias("media_ref"),
        ).orderBy("doc_id")

    def q_quarantine(spark, sf):
        # E4 unsupported-type semantics: docs whose source marks them as
        # an unsupported family are quarantined, others pass
        d = _docs(spark, sf)
        return d.select(
            "doc_id",
            F.when(
                F.col("source").isin("src7", "src8"),
                F.lit("unsupported content type for indexing"),
            ).alias("error"),
        ).filter(F.col("error").isNotNull()).orderBy("doc_id")

    # ---- search tier (Q1-Q8)
    def q_search_required(spark, sf):
        # Q3: required-terms any-of group over analyzed content
        d = _docs(spark, sf)
        toks = analyze(F.col("text"))
        hits = F.size(
            filter_u(toks, lambda t: t.isin("merge", "shuffle", "vector"))
        )
        return (
            d.select("doc_id", hits.alias("hits"))
            .filter(F.col("hits") > 0)
            .orderBy("doc_id")
        )

    def q_search_phrase(spark, sf):
        # Q2: adjacency phrase match 'the fast' over analyzed tokens.
        # The token array is LET-BOUND (hof.let_u, r06): the exists
        # lambda references it twice per position, and a naked analyze()
        # subtree there is re-evaluated per element (HOF lambdas get no
        # CSE) — the whole-document tokenizer regex ran O(positions)
        # times per doc. Same rows, same oracle.
        from lens_spark.functions.hof import let_u

        d = _docs(spark, sf)

        # size guard first: under ANSI mode (Spark 4 default) element_at
        # on an out-of-range index aborts the job, and the sequence below
        # clamps to [1,1] even for 0/1-token docs — same guard as
        # operators/search.py:_phrase_clause ("bad rows never kill the job")
        def _phrase(toks):
            return (F.size(toks) >= 2) & exists_u(
                F.sequence(F.lit(1),
                           F.greatest(F.size(toks) - 1, F.lit(1))),
                lambda i: (F.element_at(toks, i) == "the")
                & (F.element_at(toks, i + 1) == "fast"),
            )

        phrase = let_u(analyze(F.col("text")), _phrase)
        return d.select("doc_id").filter(phrase).orderBy("doc_id")

    def q_search_filters(spark, sf):
        # Q4/Q5: metadata should-groups + id filter, conjunction (Q1)
        d = _docs(spark, sf)
        return (
            d.filter(
                F.col("lang").isin("en", "de")
                & F.col("source").isin("src1", "src2", "src3")
                & (F.col("doc_id") < 400)
            )
            .select("doc_id", "lang", "source")
            .orderBy("doc_id")
        )

    def q_search_topk(spark, sf):
        # Q7: tf score + top-k (deterministic tie-break)
        d = _docs(spark, sf)
        toks = analyze(F.col("text"))
        score = F.size(filter_u(toks, lambda t: t == "spark")) / F.greatest(
            F.size(toks), F.lit(1)
        )
        return (
            d.select(
                "doc_id", F.round(score, 6).cast("double").alias("score")
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(100)
        )

    def q_search_topk_tfidf(spark, sf):
        # Q7 tfidf (VERDICT r3 #5): Lucene classic similarity end-to-end
        # — sqrt(tf)·idf²·queryNorm·fieldNorm — with idf derived from the
        # one-pass corpus-stats aggregation (_corpus_term_stats). The
        # oracle recomputes N/df Spark-free over the same parquet with
        # the same analyzer and embeds identical coefficient literals,
        # so the formula is pinned end-to-end, not just term counting.
        from lens_spark.operators.search import (
            _corpus_term_stats, _group_score, _lucene_idf,
        )

        terms = ["merge", "shuffle", "vector"]
        df = _docs(spark, sf).select(
            "doc_id", analyze(F.col("text")).alias("tokens")
        )
        n_docs, dfs = _corpus_term_stats(df, terms)
        idf = {t: _lucene_idf(c, n_docs) for t, c in dfs.items()}
        score = _group_score(F.col("tokens"), terms, idf)
        return (
            df.select(
                "doc_id", F.round(score, 6).cast("double").alias("score")
            )
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(100)
        )

    def q_search_topk_bm25(spark, sf):
        # Q7 bm25: Okapi BM25 with the Lucene-6+ idf variant — the
        # modern default ranking a production deployment of the
        # reference would use. Stats (N, per-term df, avgdl) come from
        # the operator's one-pass aggregation; the oracle recomputes
        # them Spark-free over the same parquet and embeds identical
        # coefficient doubles (idf via the same Python function,
        # b/avgdl folded to ONE literal on both sides — the
        # expression-shape convention from the r4 classifier fix).
        from lens_spark.operators.search import (
            _bm25_group_score, _bm25_idf, _corpus_term_stats_avgdl,
        )

        terms = ["merge", "shuffle", "vector"]
        df = _docs(spark, sf).select(
            "doc_id", analyze(F.col("text")).alias("tokens")
        )
        n_docs, dfs, avgdl = _corpus_term_stats_avgdl(df, terms)
        idf = {t: _bm25_idf(c, n_docs) for t, c in dfs.items()}
        score = _bm25_group_score(F.col("tokens"), terms, idf, avgdl)
        return (
            df.select(
                "doc_id", F.round(score, 6).cast("double").alias("score")
            )
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(100)
        )

    def q_tokenize(spark, sf):
        # Q6 tokenizer: split ' ', drop len<=1, lowercase — exploded
        d = _docs(spark, sf).filter(F.col("doc_id") < 50)
        toks = filter_u(
            F.split(F.lower(F.col("text")), " "),
            lambda t: F.length(t) > 1,
        )
        return (
            d.select("doc_id", F.posexplode(toks).alias("pos", "token"))
            .orderBy("doc_id", "pos")
        )

    # ---- training-data ops
    def q_dedup_exact(spark, sf):
        return (
            exact_dedup(_docs(spark, sf), "doc_id", "text")
            .orderBy("fingerprint")
        )

    def q_dedup_minhash(spark, sf):
        return minhash_lsh_pairs(
            _docs(spark, sf).filter(F.col("doc_id") < 200),
            "doc_id", "text", num_hashes=8, bands=4,
        ).orderBy("id_a", "id_b")

    def q_dedup_jaccard(spark, sf):
        # max_df=150 (< the 200-doc slice) so the hot-shingle cap is a
        # live code path in the correctness gate, mirrored in the oracle
        return ngram_jaccard_pairs(
            _docs(spark, sf).filter(F.col("doc_id") < 200),
            "doc_id", "text", k=3, threshold=0.35, max_df=150,
        ).orderBy("id_a", "id_b")

    def q_dedup_simhash(spark, sf):
        # max_hamming=8 → simhash_bands gives 9 bands (full recall at the
        # requested radius by pigeonhole); the oracle below bands from the
        # SAME layout so the comparison is non-circular in shape but
        # identical in banding
        return simhash_pairs(
            _docs(spark, sf).filter(F.col("doc_id") < 300),
            "doc_id", "text", max_hamming=8,
        ).orderBy("id_a", "id_b")

    def q_ann_cosine(spark, sf):
        q = _query_vec()
        return cosine_topk(_emb(spark, sf), "vec_id", "embedding", q, k=25)

    def q_ann_lsh(spark, sf):
        q = _query_vec()
        return ann_lsh_topk(_emb(spark, sf), "vec_id", "embedding", q,
                            k=25, num_planes=4)

    def q_ann_ivf(spark, sf):
        # IVF-flat: deterministic k-means on an id-ordered sample (both
        # engines embed identical centroid literals; see
        # ivf_centroids_from_parquet), nprobe nearest lists scanned
        from lens_spark.operators.similarity import (
            ann_ivf_topk, train_ivf_centroids,
        )

        emb = _emb(spark, sf)
        cents = train_ivf_centroids(emb, "vec_id", "embedding",
                                    nlist=8, sample=256)
        return ann_ivf_topk(emb, "vec_id", "embedding", _query_vec(),
                            cents, k=25, nprobe=2)

    def q_ann_ivf_stored(spark, sf):
        # Stored-IVF read path (VERDICT r3 #6): top-k over the FROZEN
        # hive-partitioned index fixture (scripts/freeze_ivf_index.py —
        # the write_ivf_index layout). The list_id filter is a partition
        # predicate, so only the nprobe nearest list directories are
        # scanned (partition count asserted in tests/test_training_ops);
        # the oracle scans the same fixture with the same probes.
        from lens_spark.operators.similarity import (
            ann_ivf_topk_stored, ivf_centroids_from_parquet,
        )

        cents = ivf_centroids_from_parquet(
            "/root/testdata/sf0.01/embeddings.parquet",
            nlist=8, sample=256,
        )
        return ann_ivf_topk_stored(
            spark, "/root/repo/tests/fixtures/ivf_index",
            _query_vec(), cents, k=25, nprobe=2,
        )

    def q_stream_first_seen(spark, sf):
        # Streaming stateful dedup (VERDICT r3 #7): the
        # applyInPandasWithState first-seen operator run over a REAL
        # two-micro-batch file stream (maxFilesPerTrigger=1, mtime-ordered
        # files, availableNow) into a memory sink. The fixture is pure
        # arithmetic so the DuckDB oracle regenerates it with range();
        # batch-2 duplicates carry strictly larger `ord`, so first-seen
        # equals the global arg-min by ord and the oracle is an honest
        # min/arg_min GROUP BY.
        import glob
        import os
        import shutil
        import tempfile
        import uuid

        from lens_spark.streaming.stream import first_seen_filter

        schema = "key bigint, ord bigint, val string"
        b1 = ([(i, 2 * i, "a") for i in range(300)]
              + [(i, 2 * i + 1, "b") for i in range(50)])
        b2 = ([(i, 1000 + i, "c") for i in range(100)]
              + [(i, 1000 + i, "n") for i in range(300, 350)])

        base = tempfile.mkdtemp(prefix="lens_stream_fs_")
        src = os.path.join(base, "src")
        os.makedirs(src)
        for name, rows, mtime in (("b1", b1, 1_000_000_000),
                                  ("b2", b2, 2_000_000_000)):
            tmp = os.path.join(base, "w_" + name)
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.parquet(tmp)
            f = glob.glob(os.path.join(tmp, "*.parquet"))[0]
            dst = os.path.join(src, name + ".parquet")
            shutil.copy(f, dst)
            os.utime(dst, (mtime, mtime))  # pin micro-batch order

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        qname = "first_seen_" + uuid.uuid4().hex[:8]
        stream_query = (
            first_seen_filter(stream, "key", "ord", schema)
            .writeStream.format("memory").queryName(qname)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = stream_query.awaitTermination(180)
        if not finished:
            # reading the memory sink mid-stream would hand the gate a
            # nondeterministic partial table — fail loudly instead
            stream_query.stop()
            raise TimeoutError(
                "first_seen stream did not finish within 180s"
            )
        shutil.rmtree(base, ignore_errors=True)
        return spark.table(qname).orderBy("key")

    def q_emb_neardup(spark, sf):
        # max_bucket=40 (< the 500-row table) keeps the degenerate-bucket
        # cap a LIVE code path in the correctness gate (mirrored in the
        # oracle's qualify clause), like jaccard's max_df=150
        return embedding_neardup_pairs(
            _emb(spark, sf), "vec_id", "embedding",
            threshold=0.40, num_planes=4, dim=64, max_bucket=40,
        ).orderBy("id_a", "id_b")

    def q_semdedup_pairs(spark, sf):
        # SemDeDup (Abbas et al. 2023): k-means-blocked semantic dup
        # pairs. max_cluster=70 sits below the two largest sf0.01
        # clusters (72/74 members) so the degenerate-cluster cap is a
        # LIVE path in the gate (mirrored in the oracle), like
        # emb_neardup's max_bucket=40
        from lens_spark.operators.similarity import (
            semdedup_pairs, train_ivf_centroids,
        )

        emb = _emb(spark, sf)
        cents = train_ivf_centroids(emb, "vec_id", "embedding",
                                    nlist=8, sample=256)
        return semdedup_pairs(
            emb, "vec_id", "embedding", cents,
            threshold=0.35, max_cluster=70,
        ).orderBy("id_a", "id_b")

    def q_semdedup_keep(spark, sf):
        # keep set = corpus minus each pair's centroid-nearer member
        from lens_spark.operators.similarity import (
            semdedup_keep, train_ivf_centroids,
        )

        emb = _emb(spark, sf)
        cents = train_ivf_centroids(emb, "vec_id", "embedding",
                                    nlist=8, sample=256)
        return (
            semdedup_keep(
                emb, "vec_id", "embedding", cents,
                threshold=0.35, max_cluster=70,
            )
            .select("vec_id")
            .orderBy("vec_id")
        )

    def q_embedding_kmeans(spark, sf):
        # iterative Lloyd's k-means on the exact integer grid
        # (semdedup.py): md5 hash-order seeds, 2 assign+update rounds,
        # integer-only output — the oracle unrolls the same iterations
        from lens_spark.operators.semdedup import embedding_kmeans

        return embedding_kmeans(
            _emb(spark, sf), "vec_id", "embedding", k=4, iters=2
        ).orderBy("vec_id")

    def q_kmeans_semdedup(spark, sf):
        # SemDeDup's triangular flag-table rule over the ITERATIVE
        # kmeans clusters (vs semdedup_pairs' one-shot IVF centroids):
        # exact DECIMAL(38) threshold test, tau=0.45 drops 11 docs at
        # sf0.01 so the rule is a live path
        from lens_spark.operators.semdedup import semdedup

        return semdedup(
            _emb(spark, sf), "vec_id", "embedding",
            k=4, iters=2, tau=0.45,
        ).orderBy("vec_id")

    def q_lang_id(spark, sf):
        return (
            _docs(spark, sf)
            .select("doc_id", lang_id(F.col("text")).alias("lang_pred"))
            .orderBy("doc_id")
        )

    def q_quality(spark, sf):
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                F.round(quality_score(F.col("text")), 6).alias("quality"),
            )
            .orderBy("doc_id")
        )

    def q_token_counts(spark, sf):
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                token_count_ws(F.col("text")).alias("n_ws_tokens"),
                token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
            )
            .orderBy("doc_id")
        )

    def q_gopher_quality(spark, sf):
        # Gopher quality rules (Rae et al. 2021 App. A.1.1 — public):
        # raw measurements + the composite keep flag, pure Catalyst
        from lens_spark.functions.text import (
            gopher_quality_flags, gopher_quality_metrics,
        )

        m = gopher_quality_metrics(F.col("text"))
        fl = gopher_quality_flags(F.col("text"))
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                m["n_words"].alias("n_words"),
                F.round(m["mean_word_len"], 6).alias("mean_word_len"),
                F.round(m["symbol_ratio"], 6).alias("symbol_ratio"),
                F.round(m["alpha_word_frac"], 6).alias("alpha_word_frac"),
                m["stop_hits"].alias("stop_hits"),
                fl["keep"].cast("int").alias("keep"),
            )
            .orderBy("doc_id")
        )

    def q_attributes_mix(spark, sf):
        # Dolma-style attribute sidecar E2E: tag (gopher metrics) ->
        # write_attributes through the REAL LensTable (merge-upsert,
        # snapshot commit) -> read back -> merge onto the corpus ->
        # apply_mix boolean rule. The oracle recomputes the same gopher
        # m-CTE and filter — the sidecar round trip must be lossless.
        import tempfile

        from lens_spark.attributes import (
            apply_mix, merge_attributes, read_attributes,
            write_attributes,
        )
        from lens_spark.functions.text import gopher_quality_metrics

        docs = _docs(spark, sf)
        m = gopher_quality_metrics(F.col("text"))
        tagged = docs.select(
            "doc_id",
            m["n_words"].alias("n_words"),
            m["stop_hits"].alias("stop_hits"),
        )
        store = tempfile.mkdtemp(prefix="lens_attrs_")
        write_attributes(
            tagged, store, "doc_id", ["n_words", "stop_hits"], "gopher"
        )
        merged = merge_attributes(
            docs, [read_attributes(spark, store)], "doc_id"
        )
        kept = apply_mix(merged, "gopher__n_words >= 60")
        return kept.select(
            "doc_id", "gopher__n_words", "gopher__stop_hits"
        ).orderBy("doc_id")

    def q_compression(spark, sf):
        # zlib compression-ratio quality signal (functions/compress.py)
        # vs the FROZEN Spark-free expected parquet
        # (scripts/freeze_compress_oracle.py); exact integers
        # (basis-point floor), -1 sentinel for empty/null text
        from lens_spark.functions.compress import compression_signals

        return (
            compression_signals(_docs(spark, sf), "doc_id", "text")
            .orderBy("doc_id")
        )

    def q_repetition(spark, sf):
        # within-doc repetition (Gopher repetition filters' core):
        # duplicate-line and duplicate-3-gram fractions
        from lens_spark.functions.text import repetition_ratios

        r = repetition_ratios(F.col("text"), ngram=3)
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                F.round(r["dup_line_frac"], 6).alias("dup_line_frac"),
                F.round(r["dup_ngram_frac"], 6).alias("dup_ngram_frac"),
            )
            .orderBy("doc_id")
        )

    def q_fingerprint(spark, sf):
        return (
            _docs(spark, sf)
            .select("doc_id", fingerprint(F.col("text")).alias("fp"))
            .orderBy("doc_id")
        )

    def q_winnow(spark, sf):
        # winnowing (rolling-hash k-gram) fingerprints, exploded to rows
        # for element-wise value hashing
        from lens_spark.functions.text import winnow_fingerprints

        d = _docs(spark, sf).filter(F.col("doc_id") < 100)
        return (
            d.select(
                "doc_id",
                F.explode(
                    winnow_fingerprints(F.col("text"), k=5, w=4)
                ).alias("fp"),
            )
            .orderBy("doc_id", "fp")
        )

    def q_events_window(spark, sf):
        return windowed_event_counts(_events(spark, sf)).orderBy(
            "window_start", "event_type"
        )

    def q_extract_full(spark, sf):
        # The RICH extract path (E4-E14: mime dispatch, PDF text/OCR
        # threshold, HTML boilerplate strip, image OCR/classify, media
        # passthrough, ordered reassembly) over the deterministic fixture
        # corpus, flattened to span rows. The oracle side is the FROZEN
        # output of the pure-Python reference-semantics oracle
        # (lens_spark/oracle.py, scripts/freeze_extract_oracle.py) — the
        # distributed pipeline must reproduce it row-for-row.
        from lens_spark.corpus import docs_to_spark, gen_docs
        from lens_spark.pipeline import extract

        docs = docs_to_spark(spark, gen_docs(200, seed=42))
        res = extract(docs)
        return (
            res.extracted.select(
                "doc_id",
                "mime_type",
                "category",
                F.array_join("tags", "|").alias("tags_joined"),
                F.explode("spans").alias("s"),
            )
            .select(
                "doc_id",
                F.col("s.order").alias("ord"),
                F.col("s.kind").alias("kind"),
                F.col("s.text").alias("text"),
                F.col("s.media_ref").alias("media_ref"),
                "mime_type",
                "category",
                "tags_joined",
            )
            .orderBy("doc_id", "ord")
        )

    def q_warc_records(spark, sf):
        # WARC container source (sources/warc.py): the distributed
        # mapInPandas parse of the deterministic fixture crawl (plain +
        # per-record-gzip files, one deliberately truncated record →
        # quarantine row) vs the FROZEN writer-derived expected table
        # (scripts/freeze_warc_oracle.py — ground truth from the
        # writer's specs and offsets, independent of the parser).
        # Payload projected as (md5, len); -1/'' sentinels for NULLs
        # (the multimodal convention).
        from lens_spark.sources.warc import gen_warc, warc_records

        files, _ = gen_warc(3, 24, 13)
        df = spark.createDataFrame(files, "path string, content binary")
        return (
            warc_records(df)
            .select(
                "warc_file", "record_offset", "record_length",
                "record_type",
                F.coalesce("record_id", F.lit("")).alias("record_id"),
                F.coalesce("target_uri", F.lit("")).alias("target_uri"),
                F.coalesce("warc_date", F.lit("")).alias("warc_date"),
                F.coalesce("content_length", F.lit(-1)).alias(
                    "content_length"),
                F.coalesce("http_status", F.lit(-1)).cast("long").alias(
                    "http_status"),
                F.coalesce("http_content_type", F.lit("")).alias(
                    "http_content_type"),
                F.coalesce(F.md5("payload"), F.lit("")).alias(
                    "payload_md5"),
                F.coalesce(F.octet_length("payload"), F.lit(-1)).cast(
                    "long").alias("payload_len"),
                F.coalesce("error", F.lit("")).alias("error"),
            )
            .orderBy("warc_file", "record_offset")
        )

    def q_pack_interleaved(spark, sf):
        # multimodal trainer packing over the CORE data model: the real
        # extract pipeline's interleaved spans -> budget-64 chunks
        # (text splittable, media atomic, order preserved) vs the
        # frozen pure-Python pack of the frozen extract oracle spans
        # (scripts/freeze_interleaved_oracle.py — two frozen layers,
        # zero Spark in the expected path)
        from lens_spark.corpus import docs_to_spark, gen_docs
        from lens_spark.operators.pack import pack_interleaved
        from lens_spark.pipeline import extract

        docs = docs_to_spark(spark, gen_docs(200, seed=42))
        res = extract(docs)
        return (
            pack_interleaved(res.extracted, max_tokens=64)
            .select(
                "doc_id", "chunk_id", "n_tokens", "n_media", "text",
                F.array_join("media_refs", "|").alias("refs_joined"),
            )
            .orderBy("doc_id", "chunk_id")
        )

    def q_image_features(spark, sf):
        # Multimodal E-path: PNG decode + feature extract over binary
        # payloads (Arrow mapInPandas), vs the FROZEN Spark-free
        # expected parquet (scripts/freeze_multimodal_oracle.py).
        # Embedding → quantized ints (floor(f64(x)*1e4)) projected as a
        # comma-joined STRING (the tags_joined pattern): the driver's
        # canonicalizer sorts raw pandas columns and cannot hash a
        # list-valued cell, so both sides emit scalars only.
        from lens_spark.corpus import gen_media, media_to_spark
        from lens_spark.operators.multimodal import image_features

        media = media_to_spark(spark, gen_media(48, seed=7))
        emb_q = transform_u(
            F.slice(F.col("embedding"), 1, 8),
            lambda x: F.floor(x.cast("double") * 10000).cast("long"),
        )
        return (
            image_features(media)
            .select(
                "media_id",
                F.coalesce("width", F.lit(-1)).alias("width"),
                F.coalesce("height", F.lit(-1)).alias("height"),
                "caption",
                F.array_join(
                    transform_u(
                        F.coalesce(emb_q, F.array().cast("array<long>")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ).alias("emb_q"),
                "error",
            )
            .orderBy("media_id")
        )

    def q_image_resize(spark, sf):
        # Multimodal resize path: binary-in/binary-out Arrow batches,
        # vs the frozen Spark-free expected parquet (resize_image_row
        # is the shared pure core; PIL path gated, stand-in rebuilds a
        # valid PNG at the target dims with the caption preserved)
        from lens_spark.corpus import gen_media, media_to_spark
        from lens_spark.operators.multimodal import resize_images

        media = media_to_spark(spark, gen_media(48, seed=7))
        return (
            resize_images(media, width=32, height=24)
            .select(
                "media_id",
                F.coalesce("width", F.lit(-1)).alias("width"),
                F.coalesce("height", F.lit(-1)).alias("height"),
                F.md5("payload").alias("out_md5"),
                F.coalesce(F.octet_length("payload"), F.lit(-1))
                .alias("out_len"),
                "error",
            )
            .orderBy("media_id")
        )

    def q_frame_sample(spark, sf):
        # Multimodal A/V path: every-2nd-frame sampling over the
        # LENSAV1 fixture containers; frames projected to (md5, length)
        from lens_spark.corpus import gen_media, media_to_spark
        from lens_spark.operators.multimodal import frame_sample

        media = media_to_spark(spark, gen_media(48, seed=7))
        return (
            frame_sample(media, every=2)
            .select(
                "media_id",
                F.coalesce("frame_no", F.lit(-1)).alias("frame_no"),
                F.md5("frame").alias("frame_md5"),
                F.coalesce(F.octet_length("frame"), F.lit(-1))
                .alias("frame_len"),
                "error",
            )
            .orderBy("media_id", "frame_no")
        )

    def q_audio_chunks(spark, sf):
        # Multimodal audio path: chunk-decode over the LENSAV1A fixture
        # containers (real decode is torchaudio/ffmpeg-gated in
        # decode_audio); chunks projected to (md5, length)
        from lens_spark.corpus import gen_media, media_to_spark
        from lens_spark.operators.multimodal import audio_chunks

        media = media_to_spark(spark, gen_media(48, seed=7))
        return (
            audio_chunks(media)
            .select(
                "media_id",
                F.coalesce("frame_no", F.lit(-1)).alias("chunk_no"),
                F.md5("frame").alias("chunk_md5"),
                F.coalesce(F.octet_length("frame"), F.lit(-1))
                .alias("chunk_len"),
                "error",
            )
            .orderBy("media_id", "chunk_no")
        )

    def q_lineage_counts(spark, sf):
        # M3/lineage analogue: per-bucket row counts with md5-derived
        # bucket (deterministic across engines, unlike partition ids)
        d = _docs(spark, sf)
        bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                    1, 4), 16, 10).cast("long") % 8
        return (
            d.groupBy(bucket.alias("bucket"))
            .agg(
                F.count("*").alias("doc_count"),
                F.sum("n_chars").alias("char_count"),
            )
            .orderBy("bucket")
        )

    def q_dedup_clusters(spark, sf):
        # transitive closure of the simhash pair graph (same pair params
        # as dedup_simhash) via alternating large-star/small-star;
        # cluster_id = component-minimum doc_id — deterministic, so the
        # DuckDB recursive-CTE closure must agree exactly
        from pyspark.sql import Window

        from lens_spark.operators.cluster import connected_components

        pairs = simhash_pairs(
            _docs(spark, sf).filter(F.col("doc_id") < 300),
            "doc_id", "text", max_hamming=8,
        )
        labels = connected_components(pairs)
        w = Window.partitionBy("cluster_id")
        return (
            labels.select(F.col("node").alias("doc_id"), "cluster_id")
            .withColumn("csize", F.count("*").over(w).cast("long"))
            .withColumn(
                "keep",
                (F.col("doc_id") == F.col("cluster_id")).cast("int"),
            )
            .orderBy("doc_id")
        )

    def q_c4_clean(spark, sf):
        # the flat corpus is single-line word soup (no newlines, no
        # periods), so both engines first derive the SAME multi-line,
        # punctuated text — literal replace turns frequent ' table '
        # boundaries into sentence breaks, and doc_id-keyed suffixes
        # plant javascript / lorem-ipsum / brace contamination so every
        # C4 rule fires on a known subset
        from lens_spark.functions.text import c4_clean

        lined = F.replace(
            F.col("text"), F.lit(" table "), F.lit(".\ntable ")
        )
        aug = F.concat(
            lined,
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\nEnable javascript today."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit("\nlorem ipsum dolor sit amet."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit("\nconfig = { }"),
            ).otherwise(F.lit("")),
        )
        c = c4_clean(aug)
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                F.md5(c["clean_text"]).alias("clean_md5"),
                c["n_kept"].cast("int").alias("n_kept"),
                c["n_dropped"].cast("int").alias("n_dropped"),
                c["has_lorem"].alias("has_lorem"),
                c["has_brace"].alias("has_brace"),
            )
            .orderBy("doc_id")
        )

    def q_pii_redact(spark, sf):
        # the synthetic corpus carries no PII, so both engines append the
        # SAME deterministic doc_id-derived contact block — every row
        # then exercises all three redaction passes with nonzero counts
        from lens_spark.functions.text import pii_redact

        aug = F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7, call +1 (555) 123-4567 x"),
            F.col("doc_id").cast("string"),
            F.lit("."),
        )
        r = pii_redact(aug)
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                F.md5(r["redacted"]).alias("red_md5"),
                r["n_email"].alias("n_email"),
                r["n_ip"].alias("n_ip"),
                r["n_phone"].alias("n_phone"),
            )
            .orderBy("doc_id")
        )

    def q_embedding_quantize(spark, sf):
        from lens_spark.operators.similarity import quantize_int8

        qz = quantize_int8(F.col("embedding"))
        return (
            _emb(spark, sf)
            .select(
                F.col("vec_id").alias("id"),
                F.floor(qz["scale"] * F.lit(10000.0))
                .cast("long")
                .alias("scale_q"),
                F.array_join(
                    transform_u(qz["q"], lambda v: v.cast("string")), ","
                ).alias("q_joined"),
            )
            .orderBy("id")
        )

    def q_pack_sequences(spark, sf):
        from lens_spark.operators.pack import pack_sequences

        d = _docs(spark, sf).select(
            "doc_id",
            "source",
            token_count_ws(F.col("text")).alias("n_tok"),
        )
        return (
            pack_sequences(d, "doc_id", "source", "n_tok", max_tokens=256)
            .select(
                F.col("group").alias("source"),
                F.col("id").alias("doc_id"),
                F.col("n_tokens").cast("int").alias("n_tok"),
                F.col("seq_id").cast("long").alias("seq_id"),
                F.col("seq_pos").cast("int").alias("seq_pos"),
            )
            .orderBy("source", "doc_id")
        )

    def q_word_counts(spark, sf):
        # corpus term frequencies, top-100: the classic shuffle-heavy
        # aggregation. explode→groupBy shuffles only (token, partial
        # count) pairs (map-side combine), and orderBy+limit compiles to
        # TakeOrderedAndProject — per-partition heaps, no full sort
        from lens_spark.functions.text import ws_tokens

        toks = _docs(spark, sf).select(
            F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok")
        )
        return (
            toks.groupBy("tok")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "tok")
            .limit(100)
        )

    def q_mixture_weights(spark, sf):
        # temperature-scaled per-language sampling weights (alpha=0.5,
        # the multilingual-pretraining exponential-smoothing rule): one
        # map-side-combinable groupBy over the corpus; the normalize
        # window runs on the tiny aggregated table (one row per lang)
        from lens_spark.operators.mixing import mixture_weights

        return mixture_weights(
            _docs(spark, sf), "lang", alpha=0.5
        ).orderBy("lang")

    def q_sample_mixture(spark, sf):
        # mixture MATERIALIZATION: deterministic hash-bucket sampling at
        # the temperature-scaled per-lang rates (expected weight_g×6000
        # tokens per group; 6000 ≈ half the sf0.01 corpus so rates are
        # properly fractional). md5-bucket rule — engines agree row-level
        from lens_spark.operators.mixing import sample_mixture

        return (
            sample_mixture(
                _docs(spark, sf), "lang", "doc_id",
                target_tokens=6000, alpha=0.5,
            )
            .select("doc_id", "lang", "rate_q")
            .orderBy("doc_id")
        )

    def q_quality_profile(spark, sf):
        # per-source corpus quality profile — the dataset-card numbers a
        # curation run reports per slice: volume (docs/tokens/chars),
        # content diversity (distinct normalized fingerprints), learned
        # quality mass (sum of quantized classifier probs — exact
        # integer sum, engine-independent). One map-side-combinable
        # groupBy over the corpus; every fragment is an already-proven
        # oracle expression.
        from lens_spark.functions.classifier import classifier_score
        from lens_spark.functions.text import normalize_text, ws_tokens

        prob_q = F.floor(
            classifier_score(F.col("text"), dim=256) * 10000
        ).cast("long")
        return (
            _docs(spark, sf)
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.size(ws_tokens(F.col("text"))))
                .cast("long").alias("tokens"),
                F.sum(F.length("text")).cast("long").alias("chars"),
                F.countDistinct(
                    F.md5(normalize_text(F.col("text")))
                ).alias("uniq_contents"),
                F.sum(prob_q).alias("clf_q_sum"),
            )
            .orderBy("source")
        )

    def q_dedup_increment(spark, sf):
        # incremental exact dedup: classify a NEW increment against the
        # STORED digest index (corpus never rescanned) — corpus = docs
        # < 400; increment = the rest + planted corpus copies (+1000)
        # and within-increment copies (+2000)
        from lens_spark.operators.dedup import (
            exact_dedup, exact_dedup_increment,
        )

        docs = _docs(spark, sf)
        index = exact_dedup(
            docs.filter(F.col("doc_id") < 400), "doc_id", "text"
        )
        new = (
            docs.filter(F.col("doc_id") >= 400)
            .select("doc_id", "text")
            .unionAll(
                docs.filter(F.col("doc_id") < 50).select(
                    (F.col("doc_id") + 1000).alias("doc_id"), "text"
                )
            )
            .unionAll(
                docs.filter(
                    (F.col("doc_id") >= 400) & (F.col("doc_id") < 450)
                ).select(
                    (F.col("doc_id") + 2000).alias("doc_id"), "text"
                )
            )
        )
        return exact_dedup_increment(
            new, index, "doc_id", "text"
        ).orderBy("id")

    def q_minhash_increment(spark, sf):
        # incremental near-dup: new docs probe the stored banded-LSH
        # index — near-copies (appended tail) of corpus docs surface as
        # (new, corpus) candidates; the corpus is never re-shingled
        from lens_spark.operators.dedup import (
            minhash_band_rows, minhash_increment,
        )

        docs = _docs(spark, sf)
        stored = minhash_band_rows(
            docs.filter(F.col("doc_id") < 200), "doc_id", "text",
            num_hashes=8, bands=4,
        )
        new = (
            docs.filter(F.col("doc_id") < 20)
            .select(
                (F.col("doc_id") + 1000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zq tail marker"))
                .alias("text"),
            )
            .unionAll(
                docs.filter(
                    (F.col("doc_id") >= 200) & (F.col("doc_id") < 250)
                ).select("doc_id", "text")
            )
        )
        return minhash_increment(
            new, stored, "doc_id", "text", num_hashes=8, bands=4
        ).orderBy("new_id", "corpus_id")

    def q_bloom_probe(spark, sf):
        # Bloom pre-filter for incremental exact dedup: corpus docs
        # < 400 build the (word_idx, bits) filter table, the increment
        # (docs >= 400 + planted corpus copies at +1000) probes it —
        # pure-Catalyst md5 bit math, so the oracle replays the EXACT
        # filter (false positives included); copies must always hit
        # (no false negatives)
        from lens_spark.operators.bloom import bloom_build, bloom_probe

        docs = _docs(spark, sf)
        bloom = bloom_build(
            docs.filter(F.col("doc_id") < 400), "text", 8192, 5
        )
        new = (
            docs.filter(F.col("doc_id") >= 400).select("doc_id", "text")
            .unionAll(
                docs.filter(F.col("doc_id") < 50).select(
                    (F.col("doc_id") + 1000).alias("doc_id"), "text"
                )
            )
        )
        return bloom_probe(
            new, bloom, "doc_id", "text", 8192, 5
        ).orderBy("id")

    def _synth_url():
        # deterministic URL synthesis from (doc_id, source) — the
        # documents table has no URL column, so BOTH engines build the
        # same string (four shapes: www+path, co.uk+port, bare org,
        # deep cdn subdomain)
        m = F.col("doc_id") % 4
        did = F.col("doc_id").cast("string")
        return (
            F.when(m == 0, F.concat(
                F.lit("https://www."), F.col("source"),
                F.lit(".example.com/p/"), did))
            .when(m == 1, F.concat(
                F.lit("http://blog."), F.col("source"),
                F.lit(".co.uk:8080/a/"), did))
            .when(m == 2, F.concat(
                F.lit("https://"), F.col("source"), F.lit(".org")))
            .otherwise(F.concat(
                F.lit("http://cdn"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".media."), F.col("source"),
                F.lit(".net/img/"), did))
        )

    def q_url_parse(spark, sf):
        # scheme/host/port/path + registered domain (public-suffix-lite
        # co.uk handling) — map-only regexp/split built-ins, port -1
        # sentinel for "none"
        from lens_spark.functions.urls import registered_domain, url_parse

        u = url_parse(_synth_url())
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                u["scheme"].alias("scheme"),
                u["host"].alias("host"),
                u["port"].alias("port"),
                u["path"].alias("path"),
                registered_domain(u["host"]).alias("domain"),
            )
            .orderBy("doc_id")
        )

    def q_domain_caps(spark, sf):
        # per-registered-domain exact-k cap (k=15): the md5-keyed
        # deterministic corpus governor over the synthesized URL column
        from lens_spark.functions.urls import domain_caps

        docs = _docs(spark, sf).withColumn("url", _synth_url())
        return (
            domain_caps(docs, "url", "doc_id", k=15)
            .select("doc_id", "domain")
            .orderBy("domain", "doc_id")
        )

    def q_lsh_tuning(spark, sf):
        # LSH banding tuner: measured precision/recall per (bands,
        # rows) on the deterministic md5-order sample — the report a
        # 100 TB dedup launch is tuned from; the oracle recomputes
        # sample, exact Jaccard, signatures, band collisions and the
        # basis-point metrics hash-exactly
        from lens_spark.operators.tuning import lsh_tuning_report

        # sample_k=350 / tau=2000: the sf0.01 corpus' dup families put
        # 9 true pairs in this sample, so recall actually varies across
        # configs (150/3500 left a 1-pair report)
        return lsh_tuning_report(
            _docs(spark, sf), "doc_id", "text",
            num_hashes=8, band_configs=(1, 2, 4, 8),
            sample_k=350, tau_bp=2000, hash_fn="md5",
        )

    def q_hll_registers(spark, sf):
        # engine-portable HyperLogLog register table (p=12) over the
        # doc_id key universe: md5 bucket + branch-free trailing-zero
        # rho (bit_count identity) — pure integer ops both engines own
        from lens_spark.operators.sketch import hll_registers

        return (
            hll_registers(_docs(spark, sf), "doc_id")
            .select("bucket", F.col("rho").cast("int").alias("rho"))
            .orderBy("bucket")
        )

    def q_cms_counts(spark, sf):
        # engine-portable Count-Min register table over the corpus'
        # 3-word shingles (per-doc distinct, the boilerplate_ngrams
        # statistic): depth 4 salted-md5 rows × 4096 buckets, exact
        # integer cells — map-only expansion + ONE map-side-combined
        # shuffle bounded at depth·4096 cells regardless of corpus size
        from lens_spark.operators.dedup import word_shingles
        from lens_spark.operators.sketch import cms_registers

        grams = (
            _docs(spark, sf)
            .select(
                F.explode(word_shingles(F.col("text"), 3)).alias("gram")
            )
            .filter(F.length("gram") > 0)
        )
        return (
            cms_registers(grams, "gram")
            .select(
                F.col("d").cast("int").alias("d"),
                F.col("bucket").cast("int").alias("bucket"),
                F.col("cnt").cast("long").alias("cnt"),
            )
            .orderBy("d", "bucket")
        )

    def q_pagerank(spark, sf):
        # integer-exact PageRank (operators/graph.py) over a
        # deterministic synthetic link graph on the 97-node id ring —
        # the oracle UNROLLS the same 3 rounds (the embedding_kmeans
        # convention); integers only, hash-parity by construction
        from lens_spark.operators.graph import pagerank

        d = _docs(spark, sf)
        e1 = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 97).alias("dst"),
        )
        e2 = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 13 + 5) % 97).alias("dst"),
        )
        return (
            pagerank(e1.unionByName(e2), "src", "dst", iters=3)
            .select("node", F.col("rank").alias("pr"))
            .orderBy("node")
        )

    def q_degree_stats(spark, sf):
        # per-node in/out degree over the same synthetic multigraph
        # (multi-edges count — degree_stats does not dedup)
        from lens_spark.operators.graph import degree_stats

        d = _docs(spark, sf)
        e1 = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 7 + 3) % 97).alias("dst"),
        )
        e2 = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 13 + 5) % 97).alias("dst"),
        )
        return (
            degree_stats(e1.unionByName(e2), "src", "dst")
            .orderBy("node")
        )

    def q_url_blocklist(spark, sf):
        # UT1-style domain blocklist with host-SUFFIX semantics
        # (subdomains blocked, substrings NOT): the suffix-explode
        # equi-join vs DuckDB's exists(host = v or host like '%.'||v)
        # — the 'xample.com' entry pins the no-substring property
        from lens_spark.functions.urls import (
            url_blocklist_filter, url_parse,
        )

        docs = _docs(spark, sf).withColumn("url", _synth_url())
        bl = spark.createDataFrame(
            [(d,) for d in _BLOCKED_DOMAINS], "domain string"
        )
        out = url_blocklist_filter(docs, "url", "doc_id", bl)
        return out.select(
            "doc_id",
            url_parse(F.col("url"))["host"].alias("host"),
        ).orderBy("doc_id")

    def q_robots_filter(spark, sf):
        # robots.txt corpus hygiene (RFC 9309): parse two fixture
        # robots bodies (group selection: lensbot-specific group beats
        # the * group on src1; * fallback blocks all of src4.org),
        # then filter the synthesized URL corpus by longest-match /
        # allow-wins-ties precedence. The oracle mirrors the resulting
        # VERDICTS (host/path cases); the parse itself is pinned by
        # tests/test_robots.py.
        from lens_spark.functions.robots import (
            robots_filter, robots_rules,
        )
        from lens_spark.functions.urls import url_parse

        # sources correlate with doc_id%4 (source srcN ⇒ doc_id%20 == N
        # ⇒ url shape N%4), so only N%4==0 sources ever produce the
        # www.*.example.com shape and only N%4==2 the bare .org shape —
        # src8 / src6 make both rule sets actually fire
        body1 = (
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: lensbot\nDisallow: /p/\nAllow: /p/1*\n"
        )
        body2 = (
            "User-agent: googlebot\nAllow: /\n\n"
            "User-agent: *\nDisallow: /\n"
        )
        robots = spark.createDataFrame(
            [
                ("https://www.src8.example.com/robots.txt",
                 body1.encode()),
                ("https://src6.org/robots.txt", body2.encode()),
            ],
            "url string, body binary",
        )
        rules = robots_rules(robots, "url", "body", agent="lensbot")
        urls = _docs(spark, sf).withColumn("url", _synth_url())
        kept = robots_filter(urls, rules, "url", "doc_id")
        return kept.select(
            "doc_id", url_parse(F.col("url"))["host"].alias("host")
        ).orderBy("doc_id")

    def q_corpus_shuffle(spark, sf):
        # deterministic trainer-side global shuffle: (shard, pos) from
        # md5(seed:doc_id) — one hash shuffle + per-shard sort,
        # executor-count independent
        from lens_spark.operators.mixing import corpus_shuffle

        return (
            corpus_shuffle(_docs(spark, sf), "doc_id", 8, seed="42")
            .select("doc_id", "shard", "pos")
            .orderBy("shard", "pos")
        )

    def q_token_budget(spark, sf):
        # quality-ranked token-budget cut (the "take the top N tokens"
        # selection rule): three bounded steps — quantized-bucket
        # groupBy, running sum over the TINY bucket table, row-level
        # window only inside the one boundary bucket — exactly equal to
        # the naive global sort+cumsum the oracle runs
        from lens_spark.functions.text import quality_score, token_count_ws
        from lens_spark.operators.mixing import token_budget_select

        d = _docs(spark, sf).select(
            "doc_id",
            F.round(quality_score(F.col("text")), 6).alias("quality"),
            token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        )
        return token_budget_select(
            d, "doc_id", "quality", "n_tokens", budget=12_000
        ).orderBy("doc_id")

    def q_quantile_bins(spark, sf):
        # exact decile binning without a global sort (quantized-grid
        # histogram + broadcast cell→bin map); the oracle runs the
        # naive rank() formulation — provably equal because ties share
        # grid cells in both
        from lens_spark.functions.text import quality_score
        from lens_spark.operators.mixing import quantile_bins

        d = _docs(spark, sf).select(
            "doc_id",
            F.round(quality_score(F.col("text")), 6).alias("quality"),
        )
        return quantile_bins(d, "quality", n_bins=10).orderBy("doc_id")

    def q_top_k_per_group(spark, sf):
        # exact per-group top-k (5 best docs per lang by quality)
        # without a per-group row sort; oracle = the naive rank window
        from lens_spark.functions.text import quality_score
        from lens_spark.operators.mixing import top_k_per_group

        d = _docs(spark, sf).select(
            "doc_id", "lang",
            F.round(quality_score(F.col("text")), 6).alias("quality"),
        )
        return top_k_per_group(
            d, "lang", "quality", k=5, id_col="doc_id"
        ).orderBy("doc_id")

    def q_boilerplate(spark, sf):
        # corpus-level template detection: cross-document 3-gram doc
        # frequency (distinct per doc), min_df 2, top 200 — map-only
        # shingle+explode, one map-side-combined groupBy,
        # TakeOrderedAndProject
        from lens_spark.operators.dedup import boilerplate_ngrams

        return boilerplate_ngrams(
            _docs(spark, sf), "doc_id", "text", k=3, min_df=2, top_k=200
        )

    def q_export_roundtrip(spark, sf):
        # trainer JSONL sink E2E: export (doc_id, lang, source, text)
        # as sharded uncompressed JSONL to a scratch dir (to_json
        # struct, JVM-side), read it back with an explicit schema, and
        # return ordered rows — serialization fidelity (incl. to_json
        # null-field dropping -> NULL on read-back) vs the plain table
        # oracle. The scratch dir is per-call (mkdtemp); the read-back
        # is lazy, so the files outlive this function deliberately.
        import tempfile

        from lens_spark.sources.export import export_jsonl

        out = tempfile.mkdtemp(prefix="lens_export_rt_")
        export_jsonl(
            _docs(spark, sf).select("doc_id", "lang", "source", "text"),
            out, rows_per_shard=64, compression=None,
        )
        return (
            spark.read.schema(
                "doc_id long, lang string, source string, text string"
            )
            .json(os.path.join(out, "data"))
            .select("doc_id", "lang", "source", "text")
            .orderBy("doc_id")
        )

    def q_wet_roundtrip(spark, sf):
        # WET sink E2E (sources/warc.py export_wet): write documents as
        # CommonCrawl-style conversion records (per-record gzip members,
        # md5 shard rule seed 42, deterministic urn:uuid record ids),
        # read the shards back through THIS repo's own WARC parser, and
        # return the parsed records — the oracle recomputes record ids /
        # lengths / text straight from the documents table, so the row
        # pins writer AND reader against ground truth neither produced.
        import tempfile

        from lens_spark.sources.warc import export_wet, read_warc

        out = tempfile.mkdtemp(prefix="lens_wet_rt_")
        docs = _docs(spark, sf).select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.concat(
                F.lit("urn:lens:doc:"), F.col("doc_id").cast("string")
            ).alias("uri"),
        )
        export_wet(
            docs, out, "doc_id", "text", uri_col="uri",
            n_shards=4, seed="42",
        )
        rec = read_warc(spark, os.path.join(out, "data"))
        return rec.select(
            F.col("record_id"),
            F.col("target_uri"),
            F.col("record_type"),
            F.col("content_length").cast("long").alias("content_length"),
            F.col("payload").cast("string").alias("text"),
        ).orderBy("record_id")

    def q_cdx_diff(spark, sf):
        # crawl-to-crawl incremental diff (sources/warc.py cdx_diff):
        # two synthetic CDX snapshots derived from the documents table
        # (the pagerank synthetic-edges convention) — old crawl misses
        # doc_id%10==0, carries a STALE extra capture for %3==0 (the
        # multi-capture latest-wins path); new crawl misses %7==0 and
        # rewrites %5==0 payloads. Statuses: added/changed/unchanged/
        # removed, latest digest per side, '' sentinels.
        from lens_spark.sources.warc import cdx_diff

        d = _docs(spark, sf).select(
            "doc_id", F.coalesce("text", F.lit("")).alias("t")
        )
        surt = F.concat(
            F.lit("com,example)/d/"), F.col("doc_id").cast("string")
        ).alias("surt")
        uri = F.concat(
            F.lit("https://example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri")
        old_base = d.filter(F.col("doc_id") % 10 != 0).select(
            surt,
            F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
            F.md5("t").alias("payload_digest"),
            uri,
        )
        old_stale = (
            d.filter((F.col("doc_id") % 10 != 0)
                     & (F.col("doc_id") % 3 == 0))
            .select(
                surt,
                F.lit("2025-12-01T00:00:00Z").alias("warc_date"),
                F.md5(F.concat(F.lit("stale:"), F.col("t"))).alias(
                    "payload_digest"),
                uri,
            )
        )
        new = d.filter(F.col("doc_id") % 7 != 0).select(
            surt,
            F.lit("2026-02-01T00:00:00Z").alias("warc_date"),
            F.md5(
                F.concat(
                    F.col("t"),
                    F.when(F.col("doc_id") % 5 == 0, F.lit("v2"))
                    .otherwise(F.lit("")),
                )
            ).alias("payload_digest"),
            uri,
        )
        return cdx_diff(
            old_base.unionByName(old_stale), new
        ).orderBy("surt")

    def q_wds_manifest(spark, sf):
        # WebDataset tar sink E2E: md5-shard documents (corpus_shuffle
        # rule, seed 42), write REAL tar shards, return the manifest's
        # per-shard doc counts. Membership is SQL-mirrorable (the same
        # md5 '42:'||doc_id rule the corpus_shuffle oracle uses); tar
        # BYTES are pinned separately by tests/test_export.py
        # (byte-identical reruns). Manifest rows come back through the
        # plan — n_shards rows, bounded — never a re-scan.
        import tempfile

        from lens_spark.sources.export import export_webdataset

        out = tempfile.mkdtemp(prefix="lens_wds_")
        man = export_webdataset(
            _docs(spark, sf), out, "doc_id", "text",
            n_shards=8, seed="42", meta_cols=["lang", "source"],
        )
        rows = [(int(s["shard"]), int(s["n_docs"])) for s in man["shards"]]
        return spark.createDataFrame(
            rows, "shard int, n_docs long"
        ).orderBy("shard")

    def q_mds_manifest(spark, sf):
        # MDS (MosaicML streaming) sink E2E: md5-shard documents
        # (corpus_shuffle rule, seed 42), write REAL .mds shards +
        # index.json, return per-shard sample counts. Same
        # SQL-mirrorable membership rule as wds_manifest; shard BYTES
        # are pinned by tests/test_export.py (byte-identical reruns,
        # exact layout offsets) and the gated real-loader test.
        import tempfile

        from lens_spark.sources.export import export_mds

        out = tempfile.mkdtemp(prefix="lens_mds_")
        man = export_mds(
            _docs(spark, sf), out, "doc_id",
            {"doc_id": "int", "text": "str", "source": "str"},
            n_shards=8, seed="42",
        )
        rows = [(int(s["shard"]), int(s["samples"]))
                for s in man["shards"]]
        return spark.createDataFrame(
            rows, "shard int, samples long"
        ).orderBy("shard")

    def q_image_phash(spark, sf):
        # perceptual hash (dHash) over binary image payloads: Arrow
        # mapInPandas, one long out per image, corrupt rows -> (-1,
        # error) — vs the FROZEN Spark-free expected parquet
        # (scripts/freeze_phash_oracle.py)
        from lens_spark.corpus import gen_phash_media, media_to_spark
        from lens_spark.operators.multimodal import image_phash

        media = media_to_spark(spark, gen_phash_media(36, seed=11))
        return (
            image_phash(media)
            .select("media_id", "phash",
                    F.coalesce("error", F.lit("")).alias("error"))
            .orderBy("media_id")
        )

    def q_phash_pairs(spark, sf):
        # image near-dup pairs at Hamming<=2: exhaustive pigeonhole
        # banding over the 64-bit dHash, join-free bucket pairing — vs
        # the frozen BRUTE-FORCE all-pairs ground truth (banding is
        # full-recall, so set equality is exact)
        from lens_spark.corpus import gen_phash_media, media_to_spark
        from lens_spark.operators.multimodal import (
            image_phash, phash_pairs,
        )

        media = media_to_spark(spark, gen_phash_media(36, seed=11))
        return (
            phash_pairs(image_phash(media), max_hamming=2)
            .orderBy("id_a", "id_b")
        )

    def q_embedding_project(spark, sf):
        # signed random projection (Achlioptas/JL) 64 → 8 dims: pure
        # Catalyst map-only (literal sign matrix, fresh HOF lambdas per
        # component), floor(x·1e4 + ½) quantization — the cheap dim
        # reduction an ANN pipeline runs before clustering/LSH
        from lens_spark.operators.similarity import project_embeddings

        return (
            project_embeddings(
                _emb(spark, sf), "vec_id", "embedding",
                dim_in=64, dim_out=8,
            )
            .orderBy("vec_id")
        )

    def q_upsample_mixture(spark, sf):
        # mixture materialization WITH upsampling (rate > 1 → multiple
        # epochs): floor(rate) unconditional copies + one md5-gated
        # fractional copy, epoch column keeps copies apart. target 5x
        # the ~12k-token sf0.01 corpus so upsampling genuinely happens
        from lens_spark.operators.mixing import upsample_mixture

        return (
            upsample_mixture(
                _docs(spark, sf), "source", "doc_id",
                target_tokens=60000, alpha=0.5,
            )
            .select("doc_id", "source", "epoch", "rate_q")
            .orderBy("doc_id", "epoch")
        )

    def q_stratified_sample(spark, sf):
        # exact-k deterministic per-group sample: k smallest
        # (md5 bucket, id) keys per source — two-phase (map-only hash
        # pre-filter, then the window sorts only the sliver)
        from lens_spark.operators.mixing import stratified_sample

        return (
            stratified_sample(_docs(spark, sf), "source", "doc_id", k=10)
            .select("doc_id", "source")
            .orderBy("source", "doc_id")
        )

    def q_bpe_learn(spark, sf):
        # full BPE training (Sennrich et al. 2016) on the compact
        # word-frequency table: the corpus is scanned once, every merge
        # round aggregates adjacent pairs over the vocab table only.
        # Oracle = frozen output of the single-process reference twin
        # (scripts/freeze_bpe_oracle.py, the extract_full pattern).
        from lens_spark.operators.bpe import learn_bpe

        merges = _memo_fit(
            ("bpe", sf),
            lambda: learn_bpe(
                _docs(spark, sf), "text", n_merges=40, min_count=2
            ),
        )
        return spark.createDataFrame(
            [
                (i, m[0], m[1], int(m[2]))
                for i, m in enumerate(merges)
            ],
            "rank long, left string, right string, freq long",
        ).orderBy("rank")

    def q_bpe_tokens(spark, sf):
        # BPE application with the table learned above: Arrow-batched
        # word-memoized segmentation; projected to (count, md5 digest)
        # per doc so the compare never ships token arrays
        from lens_spark.operators.bpe import apply_bpe, learn_bpe

        merges = _memo_fit(
            ("bpe", sf),
            lambda: learn_bpe(
                _docs(spark, sf), "text", n_merges=40, min_count=2
            ),
        )
        return (
            apply_bpe(_docs(spark, sf), merges, "text")
            .select(
                "doc_id",
                F.size("bpe_tokens").cast("long").alias("n_tok"),
                F.md5(F.array_join("bpe_tokens", "|")).alias("toks_md5"),
            )
            .orderBy("doc_id")
        )

    def q_dsir_weights(spark, sf):
        # DSIR (Xie et al. 2023): per-doc log importance weight under
        # hashed uni+bigram multinomials — target = the src1-3 slice,
        # raw = the whole corpus. Fit = one tiny groupBy per corpus +
        # bounded 512-row collect; scoring = map-only integer sum of
        # the quantized log-ratios (plan-asserted in tests/test_dsir).
        from lens_spark.functions.dsir import (
            dsir_log_ratios, dsir_log_weight,
        )

        docs = _docs(spark, sf)
        target = docs.filter(
            F.col("source").isin("src1", "src2", "src3")
        )
        lr = _memo_fit(
            ("dsir", sf), lambda: dsir_log_ratios(target, docs, dim=512)
        )
        return (
            docs.select(
                "doc_id",
                dsir_log_weight(F.col("text"), lr, 512).alias("logw_q"),
            )
            .orderBy("doc_id")
        )

    def q_dsir_sample(spark, sf):
        # DSIR resampling: Gumbel top-k (sampling without replacement
        # ∝ exp(log w)) with deterministic md5-uniform Gumbel noise —
        # map-only scoring → TakeOrderedAndProject
        from lens_spark.functions.dsir import (
            dsir_log_ratios, dsir_resample,
        )

        docs = _docs(spark, sf)
        target = docs.filter(
            F.col("source").isin("src1", "src2", "src3")
        )
        lr = _memo_fit(
            ("dsir", sf), lambda: dsir_log_ratios(target, docs, dim=512)
        )
        return dsir_resample(
            docs, lr, dim=512, k=100, seed="dsir-v1"
        )

    def q_bpe_pair_counts(spark, sf):
        # adjacent-token-pair frequencies, top-100 — one BPE merge step
        # (Sennrich et al. 2016). Pair stream built JVM-side; top-k is
        # TakeOrderedAndProject
        from lens_spark.operators.mixing import bpe_pair_counts

        return bpe_pair_counts(_docs(spark, sf), "text", top_k=100)

    def q_lm_perplexity(spark, sf):
        # CCNet-style LM quality signal (Wenzek et al. 2020): bigram LM
        # with add-k smoothing self-trained on the corpus, per-doc mean
        # logprob over quantized-integer terms (exact, order-independent
        # sums — the classifier.py determinism convention). The oracle
        # rebuilds the same model in SQL with the identical floor/round
        # expression shapes.
        from lens_spark.operators.lm import bigram_lm_scores

        return (
            bigram_lm_scores(_docs(spark, sf), "doc_id", "text", add_k=0.1)
            .select("doc_id", "n_bigrams", "sum_lp_q", "avg_logprob")
            .orderBy("doc_id")
        )

    def q_line_dedup(spark, sf):
        # corpus-level exact line dedup (the C4 §2.2 line rule /
        # RefinedWeb-Dolma exact line dedup): derived multi-line corpus
        # with a boilerplate line planted in EVERY doc (and a second in
        # every 5th) — keep_first leaves exactly one corpus-global copy
        from lens_spark.operators.dedup import dedup_lines

        aug = F.concat(
            F.replace(F.col("text"), F.lit(" table "), F.lit("\ntable ")),
            F.lit("\ncookie notice accept all cookies"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\nsubscribe to our newsletter now"),
            ).otherwise(F.lit("")),
        )
        src = _docs(spark, sf).select("doc_id", aug.alias("text"))
        return dedup_lines(src, "doc_id", "text").orderBy("doc_id")

    def q_line_dedup_doc(spark, sf):
        # INTRA-doc exact line dedup (map-only counterpart of the
        # corpus-level rule): derived multi-line corpus with the same
        # boilerplate line planted TWICE per doc — exactly one removal
        # per doc is guaranteed, plus any natural in-doc repeats
        from lens_spark.operators.dedup import dedup_lines_in_doc

        aug = F.concat(
            F.replace(F.col("text"), F.lit(" table "), F.lit("\ntable ")),
            F.lit("\nshare this article\ncomments (0)\nshare this article"),
        )
        src = _docs(spark, sf).select("doc_id", aug.alias("text"))
        return dedup_lines_in_doc(src, "doc_id", "text").orderBy("doc_id")

    def q_nfc_normalize(spark, sf):
        # Unicode NFC via the Arrow-batched pandas UDF (the documented
        # legitimate-UDF case — Catalyst has no normalizer): decomposed
        # e+U+0301 planted in every 7th doc, U+212B/o+U+0308 in every
        # 11th; DuckDB nfc_normalize (utf8proc) is the oracle
        from lens_spark.functions.normalize import unicode_normalize

        aug = F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" cafe\u0301"))
            .otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit(" \u212bngstro\u0308m"),
            ).otherwise(F.lit("")),
        )
        src = _docs(spark, sf).select("doc_id", aug.alias("t"))
        normed = src.select(
            "doc_id", "t",
            unicode_normalize(F.col("t")).alias("text_nfc"),
        )
        return normed.select(
            "doc_id",
            "text_nfc",
            (F.col("t") != F.col("text_nfc")).cast("int").alias("changed"),
        ).orderBy("doc_id")

    def q_script_profile(spark, sf):
        # writing-system detection: Cyrillic planted in every 7th doc,
        # Greek every 11th, Han every 13th (heavier than the Latin body
        # in every 91st/143rd/77th… none — counts stay small so latin
        # stays dominant except where the plant dominates by design)
        from lens_spark.functions.text import script_profile

        aug = F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" привет"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit(" λόγος"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit(" 北京大学"),
            ).otherwise(F.lit("")),
        )
        src = _docs(spark, sf).select("doc_id", aug.alias("t"))
        p = script_profile(F.col("t"))
        return src.select(
            "doc_id",
            p["n_latin"].alias("n_latin"),
            p["n_cyrillic"].alias("n_cyrillic"),
            p["n_greek"].alias("n_greek"),
            p["n_han"].alias("n_han"),
            p["dominant"].alias("dominant"),
        ).orderBy("doc_id")

    def q_encoding_flags(spark, sf):
        # ftfy-lite encoding hygiene (functions/text.py): CP1252
        # mojibake + U+FFFD detection over a corpus with artifacts
        # planted deterministically (every 7th doc a mojibake café +
        # curly quote, every 11th a replacement char)
        from lens_spark.functions.text import encoding_quality

        aug = F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" cafÃ© â€œmenu")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" bad�char")
            ).otherwise(F.lit("")),
        )
        q = encoding_quality(aug)
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                q["n_replacement"].alias("n_replacement"),
                q["n_mojibake"].alias("n_mojibake"),
                q["suspect"].alias("suspect"),
            )
            .orderBy("doc_id")
        )

    def q_lm_ppl_buckets(spark, sf):
        # CCNet head/middle/tail split (Wenzek et al. 2020 §4.4):
        # corpus-percentile bucketing on the deterministic avg_logprob
        # (exact percentile ↔ quantile_cont, the corpus_stats parity
        # precedent; cut probabilities are the same Python doubles on
        # both sides)
        from lens_spark.operators.lm import perplexity_buckets

        return perplexity_buckets(
            _docs(spark, sf), "doc_id", "text", add_k=0.1
        ).orderBy("doc_id")

    def q_hash_sample(spark, sf):
        # deterministic stratified subsampling — the reproducible way to
        # cut a web-scale corpus (hash of the stable id, not rand()):
        # 50% of English docs, 20% of everything else. Pure filter, no
        # shuffle, trivially pushable below any downstream op.
        bucket = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10,
            ).cast("long")
            % 100
        )
        rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(
            F.lit(20)
        )
        return (
            _docs(spark, sf)
            .filter(bucket < rate)
            .select("doc_id", "lang")
            .orderBy("doc_id")
        )

    def q_corpus_stats(spark, sf):
        # per-language corpus audit: counts, char volume, exact p50/p90
        # of document length (quantized per the repo's float-compare
        # convention). Exact percentile buffers each group's values —
        # fine for a bounded lang dimension; at 100 TB with high-card
        # groups switch to approx_percentile (t-digest, mergeable).
        return (
            _docs(spark, sf)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars"),
                F.floor(
                    F.percentile(F.col("n_chars"), F.lit(0.5))
                    * F.lit(10000.0)
                ).cast("long").alias("p50_q"),
                F.floor(
                    F.percentile(F.col("n_chars"), F.lit(0.9))
                    * F.lit(10000.0)
                ).cast("long").alias("p90_q"),
            )
            .orderBy("lang")
        )

    def q_events_sessions(spark, sf):
        # gap-based sessionization (session_window) — the oracle derives
        # identical sessions via gaps-and-islands (new island exactly
        # when ts > prev + gap: the boundary event MERGES, pinned by
        # tests/test_streaming.py::test_sessionized_events_gap_semantics)
        from lens_spark.streaming.stream import sessionized_events

        return sessionized_events(_events(spark, sf), gap="30 minutes")\
            .orderBy("user_id", "session_start")

    def q_asof_join(spark, sf):
        # point-in-time join (operators/temporal.py): every click/error
        # event picks up the latest PRECEDING view event's value for
        # the same user — union-window formulation, ONE shuffle, no
        # join node (plan-asserted in tests/test_temporal.py). DuckDB's
        # native ASOF LEFT JOIN is the oracle; inclusive-tie semantics
        # match by construction. (user_id, ts) is unique among views at
        # every sf (verified), so tie-breaks can't diverge.
        from lens_spark.operators.temporal import asof_join

        ev = _events(spark, sf)
        left = ev.filter(
            F.col("event_type").isin("click", "error")
        ).select("event_id", "ts", "user_id")
        right = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value"
        )
        out = asof_join(
            left, right, on="ts", by=["user_id"], right_cols=["value"]
        )
        return out.select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(
                F.unix_micros(F.col("ts_r").cast("timestamp_ltz")),
                F.lit(-1),
            ).cast("long").alias("view_ts_us"),
            F.coalesce(
                F.floor(F.col("value_r") * 100), F.lit(-1)
            ).cast("long").alias("view_value_c"),
        ).orderBy("event_id")

    def q_range_join(spark, sf):
        # bucketed interval join (operators/temporal.py range_join):
        # click/error events × the 2-hour windows opened by each
        # view event for the same user — intervals explode into coarse
        # 1-hour buckets, the join is a plain equi-join on
        # (user_id, bucket) with exact containment as residual filter
        # (plan-asserted: never BroadcastNestedLoopJoin). Oracle = the
        # raw inequality join (DuckDB can afford it at sf0.01).
        from lens_spark.operators.temporal import range_join

        ev = _events(spark, sf)
        points = ev.filter(
            F.col("event_type").isin("click", "error")
        ).select("event_id", "ts", "user_id")
        ivs = ev.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
        )
        out = range_join(
            points, ivs, on="ts", by=["user_id"],
            start_col="start", end_col="end", bucket=3600.0,
        )
        return out.select(
            "event_id", "user_id",
            F.col("iv_id_r").alias("iv_id"), "ts",
        ).orderBy("event_id", "iv_id")

    def q_zorder_key(spark, sf):
        # Morton clustering key (operators/zorder.py): interleave the
        # bits of (user_id mod 256, hour-of-ts mod 256) — the layout
        # key behind multi-dim min-max pruning. Pure shift/AND/OR, the
        # oracle recomputes every interleaved bit arithmetically.
        from lens_spark.operators.zorder import zorder_key

        ev = _events(spark, sf)
        d0 = (F.col("user_id") % 256).cast("long")
        d1 = (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp_ltz"))
                / F.lit(3_600_000_000)
            )
            % 256
        ).cast("long")
        q = ev.select("event_id", d0.alias("d0"), d1.alias("d1"))
        return q.select(
            "event_id",
            "d0",
            "d1",
            zorder_key(["d0", "d1"], bits=8).alias("zkey"),
        ).orderBy("event_id")

    def q_events_rollup(spark, sf):
        # continuous-aggregate rollup (operators/rollup.py): hourly ×
        # user cells maintained INCREMENTALLY — two ingest increments
        # (event_id parity) folded into a scratch LensTable via
        # bucket-pruned read_for_keys + re-combine + MERGE; the oracle
        # is the ONE-SHOT GROUP BY over all events, so the row proves
        # incremental == batch. Measures on integer cents
        # (floor(value*100+0.5), identical IEEE shape both engines).
        import tempfile

        from lens_spark.operators.rollup import (
            rollup_increment, rollup_maintain,
        )
        from lens_spark.sources.tables import LensTable

        ev = _events(spark, sf).select(
            "event_id", "ts", "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long").alias("vc"),
        )
        t = LensTable(tempfile.mkdtemp(prefix="lens_rollup_"))
        for part in (0, 1):
            inc = ev.filter(F.col("event_id") % 2 == part)
            rollup_maintain(
                t,
                rollup_increment(inc, "ts", 3600, ["user_id"], "vc"),
                ["user_id"],
            )
        return (
            t.read(spark)
            .select(
                "window_start", "user_id", "n",
                "sum_m", "min_m", "max_m",
            )
            .orderBy("window_start", "user_id")
        )

    def q_stream_rollup(spark, sf):
        # the SAME hourly × user rollup, fed through Structured
        # Streaming (stream_rollup: foreachBatch fold + batch-id
        # high-water mark): availableNow over a scratch copy of the
        # events (integer cents precomputed — float sums would drift
        # by combine order), then read the table — must equal the
        # one-shot GROUP BY oracle, proving stream == incremental ==
        # batch on one oracle.
        import tempfile

        from lens_spark.sources.tables import LensTable
        from lens_spark.streaming.stream import stream_rollup

        base = tempfile.mkdtemp(prefix="lens_stream_rollup_")
        src = os.path.join(base, "src")
        ev = _events(spark, sf).select(
            "event_id", "ts", "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long").alias("vc"),
        )
        ev.write.parquet(src)
        t = LensTable(os.path.join(base, "rollup"))
        q = stream_rollup(
            spark, src, t, os.path.join(base, "ckpt"),
            "event_id long, ts timestamp, user_id long, vc long",
            ts_col="ts", every_seconds=3600, by=["user_id"],
            measure="vc",
        )
        if not q.awaitTermination(300):
            # ADVICE r5 (low): an un-drained stream would return a
            # partially-folded table — fail loudly as a timeout, not
            # as a spurious oracle mismatch
            q.stop()
            raise TimeoutError(
                "stream_rollup availableNow drain exceeded 300s"
            )
        return (
            t.read(spark)
            .select(
                "window_start", "user_id", "n",
                "sum_m", "min_m", "max_m",
            )
            .orderBy("window_start", "user_id")
        )

    def q_search_postings(spark, sf):
        # inverted-index export (search.py export_postings): the flat
        # (token, doc_id, tf, df) table the README serving path bulk-
        # loads into an online index; k=5 impact-ordered cap per token
        # via the cell-decomposition top_k_per_group (equals the naive
        # window rule exactly), analyzer = the stored-token analyzer.
        from lens_spark.operators.search import export_postings

        return export_postings(_docs(spark, sf), k=5).orderBy(
            "token", F.desc("tf"), "doc_id"
        )

    def q_lexicon_filter(spark, sf):
        # C4-style lexicon screen (functions/text.py lexicon_flags):
        # whole-token hits via arrays_overlap + substring phrase hits,
        # map-only; the blocklist is caller policy — the row uses
        # corpus-present tokens/phrases so all three flags are
        # non-vacuous ('slow' ~900 docs, 'hash join' ~27 at sf0.01).
        from lens_spark.functions.text import lexicon_flags

        fl = lexicon_flags(
            F.col("text"),
            words=["slow", "zzznotaword"],
            phrases=["hash join"],
        )
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                fl["word_hit"].alias("word_hit"),
                fl["phrase_hit"].alias("phrase_hit"),
                fl["keep"].alias("keep"),
            )
            .orderBy("doc_id")
        )

    def q_decontaminate(spark, sf):
        # every 50th doc plays the evaluation set; 5-gram overlap flags
        # (operator default is 8 — the corpus vocabulary is tiny, so 5
        # keeps chance collisions possible and both engines must agree
        # on every one)
        from lens_spark.operators.decontam import contamination_flags

        d = _docs(spark, sf)
        bench = d.filter(F.col("doc_id") % 50 == 0)
        return contamination_flags(
            d, bench, "doc_id", "text", n=5
        ).orderBy("doc_id")

    def q_fuzzy_decontam(spark, sf):
        # MinHash fuzzy decontamination: every 40th doc (of the <200
        # slice, matching the minhash oracle's corpus) plays a lightly
        # paraphrased eval doc (appended tail) — exact near-copies must
        # flag with high signature agreement; threshold 0.5 of 8 hashes
        from lens_spark.operators.decontam import minhash_contamination

        corpus = (
            _docs(spark, sf)
            .filter(F.col("doc_id") < 200)
            .select("doc_id", "text")
        )
        bench = corpus.filter(F.col("doc_id") % 40 == 0).select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit(" eval suite answer key tail")
            ).alias("text"),
        )
        return minhash_contamination(
            corpus, bench, "doc_id", "text",
            num_hashes=8, bands=4, threshold=0.5,
        ).orderBy("doc_id")

    def q_duplicate_spans(spark, sf):
        # exact substring-level dedup (Lee et al. 2022 ExactSubstr):
        # merged token spans covered by a 15-token window occurring ≥2
        # times corpus-wide (sf0.01: 857 duplicated windows → spans)
        from lens_spark.operators.dedup import duplicate_spans

        return duplicate_spans(
            _docs(spark, sf), "doc_id", "text", k=15
        ).orderBy("doc_id", "span_start")

    def q_classifier_quality(spark, sf):
        # fastText-style hashed linear quality classifier: exact-integer
        # feature sum (order-independent, executor-count-independent) +
        # quantized sigmoid. Weights are md5-derived ints — the same
        # literals are embedded in the oracle SQL (minhash/centroid
        # pattern). lower() parity is safe on this corpus (no Greek
        # final sigma — analyzer v3 notes).
        from lens_spark.functions.classifier import (
            classifier_features, classifier_score,
        )

        f = classifier_features(F.col("text"), dim=256)
        p = classifier_score(F.col("text"), dim=256)
        return (
            _docs(spark, sf)
            .select(
                "doc_id",
                f["sum_w"].alias("sum_w"),
                f["n_tok"].cast("long").alias("n_tok"),
                F.floor(p * 10000).cast("long").alias("prob_q"),
            )
            .orderBy("doc_id")
        )

    def q_curate_chain(spark, sf):
        # VERDICT r4 item 2: the COMPOSED curation pipeline as one
        # driver row — per-doc stage flags from curate().annotated.
        # The per-stage rows are individually green; composition (flag
        # conjunction, keeper ranking conditioned on earlier stages,
        # near-dup clustering over survivors only) is where chain bugs
        # live — reference analogue engine/engine_test.go:17-113 E2E
        # style. md5 minhash leg for DuckDB bit-parity; doc_id < 150
        # bounds the oracle's recursive transitive closure.
        #
        # Input derivation (both engines compute the SAME corpus): the
        # flat word-soup gets the c4_clean row's sentence/contamination
        # augmentation so each stage has real attrition, plus planted
        # exact copies (+1000, every 10th doc) and near copies (+2000,
        # appended tail sentence, every 10th-offset-5 doc) so the
        # keeper ranking and the near-dup cluster leg both fire.
        from lens_spark.curate import curate

        # stopword-rich terminal tail: the raw soup has almost no Gopher
        # stop words and cleaning leaves < 50 words for short docs, so
        # without it the gopher stage annihilates (0 survivors) instead
        # of attriting — the tail lets decently-sized docs pass while
        # short ones still fail the 50-word floor
        tail = (" the end of this record is that we have it with"
                " others and more of that to be sure of the case and"
                " the rest of it all.")
        lined = F.concat(
            F.replace(
                F.col("text"), F.lit(" table "), F.lit(".\ntable ")
            ),
            F.lit(tail),
        )
        aug = F.concat(
            lined,
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\nEnable javascript today."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit("\nlorem ipsum dolor sit amet."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit("\nconfig = { }"),
            ).otherwise(F.lit("")),
        )
        src = (
            _docs(spark, sf)
            .filter(F.col("doc_id") < 150)
            .select("doc_id", aug.alias("text"))
        )
        dup = src.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
        near = src.filter(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 2000).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit("\nzq appendix tail marker sentence."),
            ).alias("text"),
        )
        res = curate(
            src.unionByName(dup).unionByName(near),
            minhash_hashes=8, minhash_bands=4, minhash_hash_fn="md5",
        )
        return (
            res.annotated.select(
                "doc_id",
                F.col("c4_keep").cast("int").alias("c4_keep"),
                F.col("gopher_keep").cast("int").alias("gopher_keep"),
                F.col("clf_keep").cast("int").alias("clf_keep"),
                F.col("exact_keeper").cast("int").alias("exact_keeper"),
                F.col("neardup_keep").cast("int").alias("neardup_keep"),
                F.col("kept").cast("int").alias("kept"),
            ).orderBy("doc_id")
        )

    def q_chunk_docs(spark, sf):
        # long-document splitting: ≤32-token chunks, 8-token overlap
        from lens_spark.operators.pack import chunk_documents

        return (
            chunk_documents(
                _docs(spark, sf), "doc_id", "text",
                max_tokens=32, overlap=8,
            )
            .withColumn("n_tokens", F.col("n_tokens").cast("long"))
            .orderBy("doc_id", "chunk_id")
        )

    def q_duplicate_spans_keepfirst(spark, sf):
        # leave-one-copy marking: each duplicated window's corpus-global
        # first occurrence (min (doc_id, pos)) stays unmarked
        from lens_spark.operators.dedup import duplicate_spans

        return duplicate_spans(
            _docs(spark, sf), "doc_id", "text", k=15, keep_first=True
        ).orderBy("doc_id", "span_start")

    def q_dedup_clean_text(spark, sf):
        # ExactSubstr deletion applied: rebuild text with every
        # duplicated 15-token span removed; md5 keeps the row narrow
        from lens_spark.operators.dedup import remove_duplicate_spans

        return (
            remove_duplicate_spans(_docs(spark, sf), "doc_id", "text", k=15)
            .select(
                "doc_id",
                F.md5(F.col("text")).alias("clean_md5"),
                "n_removed_tokens",
            )
            .orderBy("doc_id")
        )

    return {
        "mime_sniff": q_mime_sniff,
        "explode_reassemble": q_explode_reassemble,
        "text_passthrough": q_text_passthrough,
        "media_passthrough": q_media_passthrough,
        "quarantine_unsupported": q_quarantine,
        "search_required": q_search_required,
        "search_phrase": q_search_phrase,
        "search_filters": q_search_filters,
        "search_topk": q_search_topk,
        "search_topk_tfidf": q_search_topk_tfidf,
        "search_topk_bm25": q_search_topk_bm25,
        "tokenize": q_tokenize,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "duplicate_spans": q_duplicate_spans,
        "duplicate_spans_keepfirst": q_duplicate_spans_keepfirst,
        "dedup_clean_text": q_dedup_clean_text,
        "chunk_docs": q_chunk_docs,
        "classifier_quality": q_classifier_quality,
        "curate_chain": q_curate_chain,
        "c4_clean": q_c4_clean,
        "pii_redact": q_pii_redact,
        "embedding_quantize": q_embedding_quantize,
        "pack_sequences": q_pack_sequences,
        "word_counts": q_word_counts,
        "mixture_weights": q_mixture_weights,
        "sample_mixture": q_sample_mixture,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "bpe_learn": q_bpe_learn,
        "bpe_tokens": q_bpe_tokens,
        "upsample_mixture": q_upsample_mixture,
        "stratified_sample": q_stratified_sample,
        "embedding_project": q_embedding_project,
        "dedup_increment": q_dedup_increment,
        "minhash_increment": q_minhash_increment,
        "bloom_probe": q_bloom_probe,
        "url_parse": q_url_parse,
        "domain_caps": q_domain_caps,
        "url_blocklist": q_url_blocklist,
        "robots_filter": q_robots_filter,
        "pagerank": q_pagerank,
        "degree_stats": q_degree_stats,
        "hll_registers": q_hll_registers,
        "cms_counts": q_cms_counts,
        "lsh_tuning": q_lsh_tuning,
        "corpus_shuffle": q_corpus_shuffle,
        "export_roundtrip": q_export_roundtrip,
        "wet_roundtrip": q_wet_roundtrip,
        "cdx_diff": q_cdx_diff,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "zorder_key": q_zorder_key,
        "events_rollup": q_events_rollup,
        "stream_rollup": q_stream_rollup,
        "search_postings": q_search_postings,
        "lexicon_filter": q_lexicon_filter,
        "wds_manifest": q_wds_manifest,
        "mds_manifest": q_mds_manifest,
        "token_budget_select": q_token_budget,
        "quantile_bins": q_quantile_bins,
        "top_k_per_group": q_top_k_per_group,
        "boilerplate_ngrams": q_boilerplate,
        "image_phash": q_image_phash,
        "phash_pairs": q_phash_pairs,
        "quality_profile": q_quality_profile,
        "bpe_pair_counts": q_bpe_pair_counts,
        "lm_perplexity": q_lm_perplexity,
        "lm_ppl_buckets": q_lm_ppl_buckets,
        "encoding_flags": q_encoding_flags,
        "line_dedup": q_line_dedup,
        "line_dedup_doc": q_line_dedup_doc,
        "nfc_normalize": q_nfc_normalize,
        "script_profile": q_script_profile,
        "hash_sample": q_hash_sample,
        "corpus_stats": q_corpus_stats,
        "decontaminate": q_decontaminate,
        "fuzzy_decontam": q_fuzzy_decontam,
        "events_sessions": q_events_sessions,
        "ann_cosine_topk": q_ann_cosine,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "ann_ivf_topk_stored": q_ann_ivf_stored,
        "stream_first_seen": q_stream_first_seen,
        "embedding_neardup": q_emb_neardup,
        "semdedup_pairs": q_semdedup_pairs,
        "semdedup_keep": q_semdedup_keep,
        "embedding_kmeans": q_embedding_kmeans,
        "kmeans_semdedup": q_kmeans_semdedup,
        "lang_id": q_lang_id,
        "quality_score": q_quality,
        "gopher_quality": q_gopher_quality,
        "attributes_mix": q_attributes_mix,
        "compression_ratio": q_compression,
        "repetition_ratios": q_repetition,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_fingerprint,
        "doc_winnow": q_winnow,
        "events_window": q_events_window,
        "lineage_counts": q_lineage_counts,
        "extract_full": q_extract_full,
        "warc_records": q_warc_records,
        "pack_interleaved": q_pack_interleaved,
        "image_features": q_image_features,
        "image_resize": q_image_resize,
        "frame_sample": q_frame_sample,
        "audio_chunks": q_audio_chunks,
    }


# blocklist entries shared by q_url_blocklist and its oracle:
# suffix matches (www./cdnN. subdomains), exact host matches, and one
# deliberate non-match pinning the no-substring property
# sources correlate with the URL shape (srcN ⇒ doc_id%20==N ⇒ shape
# N%4), so entries must target sources whose shape actually produces
# the host: N%4==0 → www.srcN.example.com, 3 → cdnX.media.srcN.net,
# 2 → srcN.org, 1 → blog.srcN.co.uk
_BLOCKED_DOMAINS = (
    "src4.example.com",   # suffix hit via www. subdomain (shape 0)
    "media.src7.net",     # deep-subdomain hit via cdnX. (shape 3)
    "src6.org",           # exact-host hit (shape 2)
    "xample.com",         # must hit NOTHING (no substring matching)
    "blog.src1.co.uk",    # exact-host hit (shape 1)
)


def _query_vec() -> list[float]:
    """Deterministic 64-dim query vector (same literals into SQL)."""
    import hashlib

    out = []
    for d in range(64):
        h = hashlib.md5(f"q:{d}".encode()).digest()
        out.append(round((h[0] / 255.0) * 2 - 1, 6))
    return out


def _sql_query_vec() -> str:
    return "[" + ", ".join(str(x) for x in _query_vec()) + "]"


def _sql_planes(num_planes: int, dim: int) -> list[str]:
    from lens_spark.operators.similarity import hyperplane_signs

    return [
        "[" + ", ".join(str(s) for s in hyperplane_signs(p, dim)) + "]"
        for p in range(num_planes)
    ]


def oracle_sql() -> dict[str, str]:
    # --- shared SQL fragments (DuckDB dialect) ---------------------------
    norm = ("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
    ws_toks = f"list_filter(string_split({norm}, ' '), t -> len(t) > 0)"
    # Unicode separator class — mirrors search.analyze (RE2 \p ≡ Java \p
    # on L/N; three-way parity pinned by tests/test_search.py). Final
    # sigma is folded like the engine does (analyzer v3): DuckDB lower()
    # is the simple mapping, so only literal 'ς' in the input needs it.
    analyze_toks = (
        r"list_filter(string_split_regex("
        r"replace(lower(text), 'ς', 'σ'), '[^\p{L}\p{N}]+'), "
        "t -> len(t) > 0)"
    )

    # shingles over normalized ws tokens (k=3) as in word_shingles
    def shingles_sql(src_alias: str = "documents") -> str:
        return f"""
        with toks as (
          select doc_id, {ws_toks} as tk from {src_alias}
          where doc_id < 200
        ), sh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        )"""

    qv = _sql_query_vec()
    planes4 = _sql_planes(4, 64)

    def bucket_sql(vec_expr: str) -> str:
        parts = []
        for i, pl in enumerate(planes4):
            parts.append(
                f"(case when list_dot_product("
                f"{vec_expr}::DOUBLE[], {pl}::DOUBLE[]) > 0 "
                f"then {1 << i} else 0 end)"
            )
        return "(" + " + ".join(parts) + ")"

    qbucket = bucket_sql(qv)

    from lens_spark.functions.text import LANG_MARKERS

    lang_structs = []
    for code, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        hits = (f"len(list_filter({ws_toks}, "
                f"t -> list_contains([{lst}], t)))")
        lang_structs.append(
            f"struct_pack(hits := {hits}, lang := '{code}')"
        )
    # max over (hits, lang) structs — identical tie-break to Spark's
    # F.greatest over structs (lexicographically larger code wins ties).
    # DuckDB's greatest() rejects structs; sorting a struct list doesn't.
    best = "(list_reverse_sort([" + ", ".join(lang_structs) + "]))[1]"
    lang_expr = (
        f"(case when ({best}).hits > 0 then ({best}).lang else 'und' end)"
    )

    en_sw = ", ".join(
        f"'{w}'" for w in
        "the a an and or of to in is are was were be for with on at by it "
        "this".split()
    )
    punct_ratio = (
        "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
        " / greatest(length(text), 1)"
    )
    low_toks = "list_filter(string_split(lower(text), ' '), t -> len(t) > 0)"
    sw_ratio = (
        f"len(list_filter({low_toks}, t -> list_contains([{en_sw}], t)))"
        f" / greatest(len({low_toks}), 1)"
    )

    # IVF centroids: trained by the Spark-free twin of the operator's
    # trainer on the SAME parquet (driver compares at sf0.01); both
    # engines embed identical rounded literals, and every distance is a
    # sequential float64 sum in the same element order so assignment
    # ties cannot diverge
    from lens_spark.operators.similarity import ivf_centroids_from_parquet

    ivf_cents = ivf_centroids_from_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", nlist=8, sample=256
    )
    qv_list = _query_vec()
    ivf_d2 = [(sum((a - b) ** 2 for a, b in zip(qv_list, c)), i)
              for i, c in enumerate(ivf_cents)]
    ivf_probes = ", ".join(str(i) for _, i in sorted(ivf_d2)[:2])

    def _sql_vec(v: list[float]) -> str:
        return "[" + ", ".join(str(x) for x in v) + "]"

    ivf_assign_structs = ", ".join(
        "struct_pack(d2 := list_sum(list_transform(range(1, 65), "
        f"j -> (e[j] - ({_sql_vec(c)}::DOUBLE[])[j]) * "
        f"(e[j] - ({_sql_vec(c)}::DOUBLE[])[j]))), idx := {i})"
        for i, c in enumerate(ivf_cents)
    )

    # tfidf coefficients: N + per-term df computed Spark-free over the
    # same sf0.01 parquet with the same analyzer (driver compares at
    # sf0.01 — the ivf-centroid precedent), then idf/queryNorm folded
    # into per-term literals by the SAME Python code the Spark query's
    # _group_score uses, so both engines multiply identical doubles
    import math as _math

    import duckdb as _duckdb

    from lens_spark.operators.search import _lucene_idf

    tfidf_terms = ["merge", "shuffle", "vector"]
    _df_exprs = ", ".join(
        f"sum(case when list_contains(tk, '{t}') then 1 else 0 end)"
        for t in tfidf_terms
    )
    _stats = _duckdb.sql(f"""
        with t as (
          select {analyze_toks} as tk
          from read_parquet('/root/testdata/sf0.01/documents.parquet')
        )
        select count(*), {_df_exprs} from t
    """).fetchone()
    _n_docs = int(_stats[0])
    _idf = {
        t: _lucene_idf(int(_stats[i + 1] or 0), _n_docs)
        for i, t in enumerate(tfidf_terms)
    }
    _qnorm = 1.0 / _math.sqrt(sum(v ** 2 for v in _idf.values()) or 1.0)
    tfidf_comp = " + ".join(
        f"sqrt(len(list_filter(tk, x -> x = '{t}'))::double)"
        f" * {_idf[t] ** 2 * _qnorm!r}"
        for t in tfidf_terms
    )

    # bm25 coefficients: same Spark-free stats pass plus avgdl; idf via
    # the SAME Python function the operator uses, and the length term
    # folded to the single literal b/avgdl exactly as _bm25_group_score
    # builds it (identical operation order — the r4 classifier lesson)
    from lens_spark.operators.search import _bm25_idf

    _bm_stats = _duckdb.sql(f"""
        with t as (
          select {analyze_toks} as tk
          from read_parquet('/root/testdata/sf0.01/documents.parquet')
        )
        select count(*), sum(len(tk)), {_df_exprs} from t
    """).fetchone()
    _bm_n = int(_bm_stats[0])
    _bm_avgdl = float(_bm_stats[1] or 0) / max(_bm_n, 1)
    _bm_idf = {
        t: _bm25_idf(int(_bm_stats[i + 2] or 0), _bm_n)
        for i, t in enumerate(tfidf_terms)
    }
    _k1, _b = 1.2, 0.75
    bm25_comp = " + ".join(
        f"{_bm_idf[t]!r} * "
        f"(len(list_filter(tk, x -> x = '{t}'))::double * {_k1 + 1.0!r}) / "
        f"(len(list_filter(tk, x -> x = '{t}'))::double + {_k1!r} * "
        f"({1.0 - _b!r} + {_b / _bm_avgdl!r} * len(tk)::double))"
        for t in tfidf_terms
    )

    # simhash band layout: generated from the SAME helper the Spark
    # operator uses (simhash_bands), max_hamming=8 → 9 bands over 60 bits
    from lens_spark.operators.dedup import simhash_bands

    bands_vals = ", ".join(
        f"({i}, {off}, {(1 << w) - 1})"
        for i, (off, w) in enumerate(simhash_bands(8))
    )

    # the SAME mojibake alternation the Spark expression compiles —
    # plain literals, valid in both Java regex and RE2
    from lens_spark.functions.text import MOJIBAKE_RE as moji_re

    # bigram-LM model + per-doc quantized mean logprob (shared by the
    # lm_perplexity and lm_ppl_buckets rows): floor(ln(P)*1e6 + 0.5) —
    # the operator's quantization with identical IEEE operation order
    lm_scored_cte = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) as tk
          from documents
        ), uni as (
          select tok as w1, count(*) as c1
          from (select unnest(tk) as tok from t) group by 1
        ), v as (
          select count(*)::double as v from uni
        ), big0 as (
          select doc_id, tk[i] as w1, tk[i] || ' ' || tk[i + 1] as pair
          from t, unnest(range(1, len(tk))) as u(i)
        ), bc as (
          select pair, count(*) as cb from big0 group by pair
        ), lp as (
          select big0.doc_id,
                 floor(ln((coalesce(bc.cb, 0)::double + 0.1)
                          / (coalesce(uni.c1, 0)::double + 0.1 * v.v))
                       * 1000000 + 0.5)::bigint as lp_q
          from big0 left join bc using(pair)
                    left join uni using(w1), v
        ), agg as (
          select doc_id, count(*) as n_bigrams, sum(lp_q) as sum_lp_q
          from lp group by doc_id
        ), scored as (
          select t.doc_id,
                 coalesce(agg.n_bigrams, 0) as n_bigrams,
                 agg.sum_lp_q,
                 case when coalesce(agg.n_bigrams, 0) > 0
                      then round((agg.sum_lp_q::double / 1000000.0)
                                 / agg.n_bigrams::double, 6)
                 end as avg_logprob
          from t left join agg using(doc_id)
        )
    """

    out = {
        "mime_sniff": """
            select doc_id,
                   'text/plain; charset=utf-8' as mime_type,
                   'text/plain' as parsed,
                   'document' as category
            from documents order by doc_id
        """,
        "explode_reassemble": """
            with spans as (
              select doc_id, text,
                     unnest(range(1, 2 + (doc_id % 3)::int)) as ord
              from documents
            )
            select doc_id,
                   case when (doc_id + ord) % 4 = 0 then 'media'
                        else 'text' end as kind,
                   case when (doc_id + ord) % 4 != 0
                        then substr(text, (1 + 7*(ord-1))::int, 7)
                        end as text,
                   case when (doc_id + ord) % 4 = 0
                        then concat('ref-', doc_id, '-', ord) end
                     as media_ref,
                   ord::int as ord
            from spans
            order by doc_id, ord
        """,
        "text_passthrough": """
            select doc_id, text as content, 'document' as category
            from documents order by doc_id
        """,
        "media_passthrough": """
            select doc_id, NULL::varchar as text,
                   concat('ref-', doc_id) as media_ref
            from documents where doc_id % 5 = 0 order by doc_id
        """,
        "quarantine_unsupported": """
            select doc_id,
                   'unsupported content type for indexing' as error
            from documents where source in ('src7', 'src8')
            order by doc_id
        """,
        "search_required": f"""
            select * from (
              select doc_id,
                     len(list_filter({analyze_toks},
                         t -> t in ('merge', 'shuffle', 'vector'))) as hits
              from documents
            ) where hits > 0
            order by doc_id
        """,
        "search_phrase": f"""
            with t as (select doc_id, {analyze_toks} as tk from documents)
            select doc_id from t
            where len(list_filter(range(1, greatest(len(tk)-1,1)+1),
                      i -> tk[i] = 'the' and tk[i+1] = 'fast')) > 0
            order by doc_id
        """,
        "search_filters": """
            select doc_id, lang, source from documents
            where lang in ('en','de') and source in ('src1','src2','src3')
              and doc_id < 400
            order by doc_id
        """,
        "search_topk": f"""
            with t as (select doc_id, {analyze_toks} as tk from documents)
            select doc_id,
                   round(len(list_filter(tk, x -> x = 'spark'))
                         / greatest(len(tk), 1), 6)::double as score
            from t
            order by score desc, doc_id asc limit 100
        """,
        "search_topk_tfidf": f"""
            with t as (select doc_id, {analyze_toks} as tk from documents)
            select * from (
              select doc_id,
                     round(({tfidf_comp})
                           * (1.0 / sqrt(greatest(len(tk), 1)::double)),
                           6)::double as score
              from t
            ) where score > 0
            order by score desc, doc_id asc limit 100
        """,
        "search_topk_bm25": f"""
            with t as (select doc_id, {analyze_toks} as tk from documents)
            select * from (
              select doc_id, round({bm25_comp}, 6)::double as score
              from t
            ) where score > 0
            order by score desc, doc_id asc limit 100
        """,
        # mixture materialization: same weight CTE as mixture_weights,
        # rate_q = floor(min(1, w*6000/size)*1e6), md5-bucket keep rule
        "sample_mixture": r"""
            with g as (
              select lang,
                     count(*) as n_docs,
                     sum(len(list_filter(
                         string_split_regex(text, '\s+'),
                         t -> len(t) > 0)))::bigint as group_size
              from documents group by lang
            ), r as (
              select lang,
                     floor(least(1.0,
                         round(power(group_size::double, 0.5)
                           / sum(power(group_size::double, 0.5)) over (),
                           6) * 6000.0 / group_size::double)
                       * 1000000.0)::bigint as rate_q
              from g
            )
            select d.doc_id, d.lang, r.rate_q
            from documents d join r using(lang)
            where ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))
                    ::bigint % 1000000 < r.rate_q
            order by d.doc_id
        """,
        "mixture_weights": r"""
            with g as (
              select lang,
                     count(*) as n_docs,
                     sum(len(list_filter(
                         string_split_regex(text, '\s+'),
                         t -> len(t) > 0)))::bigint as group_size
              from documents group by lang
            )
            select lang, n_docs, group_size,
                   round(power(group_size::double, 0.5)
                         / sum(power(group_size::double, 0.5)) over (),
                         6)::double as weight
            from g order by lang
        """,
        "bpe_pair_counts": r"""
            with t as (
              select list_filter(string_split_regex(text, '\s+'),
                                 x -> len(x) > 0) as tk
              from documents
            ), p as (
              select tk[i] || ' ' || tk[i + 1] as pair
              from t, unnest(range(1, len(tk))) as u(i)
            )
            select pair, count(*) as pair_count
            from p group by pair
            order by pair_count desc, pair asc limit 100
        """,
        "encoding_flags": f"""
            with a as (
              select doc_id,
                     text
                     || case when doc_id % 7 = 0
                             then ' cafÃ© â€œmenu' else '' end
                     || case when doc_id % 11 = 0
                             then ' bad�char' else '' end as t
              from documents
            )
            select doc_id,
                   len(regexp_extract_all(t, '�'))::int as n_replacement,
                   len(regexp_extract_all(t, '{moji_re}'))::int
                     as n_mojibake,
                   (len(regexp_extract_all(t, '�')) > 0
                    or len(regexp_extract_all(t, '{moji_re}')) > 0)
                     as suspect
            from a order by doc_id
        """,
        "line_dedup": r"""
            with src as (
              select doc_id,
                     replace(text, ' table ', chr(10) || 'table ')
                     || chr(10) || 'cookie notice accept all cookies'
                     || case when doc_id % 5 = 0
                             then chr(10) || 'subscribe to our newsletter now'
                             else '' end as text
              from documents
            ), lines as (
              select doc_id, i - 1 as pos, ln[i] as line
              from (select doc_id, string_split(text, chr(10)) as ln
                    from src),
                   unnest(range(1, len(ln) + 1)) as u(i)
            ), stats as (
              select line, count(*) as cnt,
                     min(struct_pack(i := doc_id, p := pos)) as frst
              from lines group by line
            ), marked as (
              select l.doc_id, l.pos, l.line,
                     case when len(l.line) >= 1 and s.cnt >= 2
                               and not (s.frst.i = l.doc_id
                                        and s.frst.p = l.pos)
                          then 1 else 0 end as rm
              from lines l join stats s using(line)
            ), reb as (
              select doc_id,
                     string_agg(case when rm = 0 then line end,
                                chr(10) order by pos) as clean,
                     sum(rm)::bigint as n_removed_lines
              from marked group by doc_id
            )
            select s.doc_id,
                   coalesce(r.clean, '') as text,
                   coalesce(r.n_removed_lines, 0) as n_removed_lines
            from src s left join reb r using(doc_id)
            order by doc_id
        """,
        # intra-doc line dedup: keep line i iff the FIRST occurrence of
        # its value is at i (list_position is 1-based in DuckDB, matching
        # Spark's array_position == i+1 on the 0-based filter index)
        # script detection: RE2 \p{Script} vs JVM \p{IsScript} (both
        # UAX #24); dominant = max count, ties to the earlier script in
        # SCRIPTS order, 'none' when no scripted char
        "script_profile": r"""
            with t as (
              select doc_id,
                     text
                     || case when doc_id % 7 = 0
                             then ' привет' else '' end
                     || case when doc_id % 11 = 0
                             then ' λόγος' else '' end
                     || case when doc_id % 13 = 0
                             then ' 北京大学' else '' end as t
              from documents
            ), c as (
              select doc_id,
                     len(regexp_extract_all(t, '[\p{Latin}]'))
                       as n_latin,
                     len(regexp_extract_all(t, '[\p{Cyrillic}]'))
                       as n_cyrillic,
                     len(regexp_extract_all(t, '[\p{Greek}]'))
                       as n_greek,
                     len(regexp_extract_all(t, '[\p{Han}]')) as n_han,
                     len(regexp_extract_all(t, '[\p{Arabic}]'))
                       as n_arabic,
                     len(regexp_extract_all(t, '[\p{Hebrew}]'))
                       as n_hebrew,
                     len(regexp_extract_all(t, '[\p{Devanagari}]'))
                       as n_devanagari,
                     len(regexp_extract_all(t, '[\p{Hangul}]'))
                       as n_hangul,
                     len(regexp_extract_all(t, '[\p{Hiragana}]'))
                       as n_hiragana,
                     len(regexp_extract_all(t, '[\p{Katakana}]'))
                       as n_katakana
              from t
            ), d as (
              select *,
                     greatest(n_latin, n_cyrillic, n_greek, n_han,
                              n_arabic, n_hebrew, n_devanagari,
                              n_hangul, n_hiragana, n_katakana) as m
              from c
            )
            select doc_id, n_latin, n_cyrillic, n_greek, n_han,
                   case when m = 0 then 'none'
                        when n_latin = m then 'latin'
                        when n_cyrillic = m then 'cyrillic'
                        when n_greek = m then 'greek'
                        when n_han = m then 'han'
                        when n_arabic = m then 'arabic'
                        when n_hebrew = m then 'hebrew'
                        when n_devanagari = m then 'devanagari'
                        when n_hangul = m then 'hangul'
                        when n_hiragana = m then 'hiragana'
                        else 'katakana' end as dominant
            from d order by doc_id
        """,
        # Unicode NFC: DuckDB nfc_normalize (utf8proc) vs the Arrow-
        # batched unicodedata UDF — both UAX #15; planted artifacts are
        # built from the same codepoints (chr(769)=U+0301 combining
        # acute, chr(8491)=U+212B angstrom sign, chr(776)=U+0308)
        "nfc_normalize": r"""
            with t as (
              select doc_id,
                     text
                     || case when doc_id % 7 = 0
                             then ' cafe' || chr(769) else '' end
                     || case when doc_id % 11 = 0
                             then ' ' || chr(8491) || 'ngstro'
                                  || chr(776) || 'm'
                             else '' end as t
              from documents
            )
            select doc_id, nfc_normalize(t) as text_nfc,
                   (t != nfc_normalize(t))::int as changed
            from t order by doc_id
        """,
        "line_dedup_doc": r"""
            with t as (
              select doc_id,
                     string_split(
                       replace(text, ' table ', chr(10) || 'table ')
                       || chr(10) || 'share this article'
                       || chr(10) || 'comments (0)'
                       || chr(10) || 'share this article',
                       chr(10)) as ls
              from documents
            ), k as (
              select doc_id, ls,
                     list_filter(ls,
                       (x, i) -> list_position(ls, x) = i) as kept
              from t
            )
            select doc_id,
                   array_to_string(kept, chr(10)) as text,
                   (len(ls) - len(kept))::bigint as n_removed_lines
            from k order by doc_id
        """,
        "lm_perplexity": lm_scored_cte + """
            select doc_id, n_bigrams, sum_lp_q, avg_logprob
            from scored order by doc_id
        """,
        "lm_ppl_buckets": lm_scored_cte + f"""
            , cutz as (
              select quantile_cont(avg_logprob, {1.0 - 2.0 / 3.0!r}) as lo,
                     quantile_cont(avg_logprob, {1.0 - 1.0 / 3.0!r}) as hi
              from scored
            )
            select s.doc_id, s.n_bigrams, s.avg_logprob,
                   case when s.avg_logprob is null then 'unscored'
                        when s.avg_logprob > c.hi then 'head'
                        when s.avg_logprob > c.lo then 'middle'
                        else 'tail' end as bucket
            from scored s, cutz c order by s.doc_id
        """,
        "tokenize": """
            with t as (
              select doc_id,
                list_filter(string_split(lower(text), ' '),
                            x -> len(x) > 1) as tk
              from documents where doc_id < 50
            ), g as (
              select doc_id, tk, unnest(range(1, len(tk) + 1)) as i from t
            )
            select doc_id, (i - 1)::int as pos, tk[i] as token
            from g order by doc_id, pos
        """,
        "dedup_exact": f"""
            select md5({norm}) as fingerprint,
                   min(doc_id) as rep_id,
                   count(*) as dup_count
            from documents group by 1 order by fingerprint
        """,
        "dedup_minhash_lsh": shingles_sql() + f"""
        , sigs as (
          select doc_id,
            [list_min(list_transform(shingles, s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from sh
        ), bands as (
          select doc_id, b as band_no,
                 md5(array_to_string(sig[2*b+1:2*b+2], '|')) as bucket
          from sigs, unnest([0,1,2,3]) as t(b)
        ), sized as (
          select * from bands
          where (band_no, bucket) in (
            select (band_no, bucket) from bands
            group by band_no, bucket having count(*) <= 200)
        )
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from sized a join sized b
          on a.band_no = b.band_no and a.bucket = b.bucket
         and a.doc_id < b.doc_id
        order by id_a, id_b
        """,
        "dedup_ngram_jaccard": shingles_sql() + """
        , ex0 as (
          select distinct doc_id, unnest(shingles) as shingle from sh
        ), ex as (
          -- hot-shingle document-frequency cap (mirror of max_df=150)
          select doc_id, shingle from ex0
          qualify count(*) over (partition by shingle) <= 150
        ), sizes as (
          select doc_id, count(*) as n from ex group by doc_id
        ), inter as (
          select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
          from ex a join ex b on a.shingle = b.shingle
           and a.doc_id < b.doc_id
          group by 1, 2
        )
        select id_a, id_b,
               round(inter / (na.n + nb.n - inter), 6)::double as jaccard
        from inter
        join sizes na on na.doc_id = id_a
        join sizes nb on nb.doc_id = id_b
        where inter / (na.n + nb.n - inter) >= 0.35
        order by id_a, id_b
        """,
        "dedup_simhash": r"""
            with toks as (
              select doc_id,
                     unnest(list_filter(string_split(
                       trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                       ' '), t -> len(t) > 0)) as t
              from documents where doc_id < 300
            ), h as (
              select doc_id, ('0x' || substr(md5(t), 1, 15))::bigint as h
              from toks
            ), n as (
              select doc_id, count(*) as n from h group by 1
            ), bits as (
              select h.doc_id, b.b,
                     case when sum((h.h >> b.b) & 1) * 2 > any_value(n.n)
                          then (1::bigint << b.b) else 0 end as bit
              from h join n using (doc_id),
                   (select unnest(range(0, 60)) as b) b
              group by h.doc_id, b.b
            ), sim as (
              select doc_id, sum(bit)::bigint as sh from bits group by doc_id
            ), banded0 as (
              select doc_id, sh, b_no as band_no,
                     (sh >> b_off) & b_mask as key
              from sim, (values __BANDS__) bn(b_no, b_off, b_mask)
            ), banded as (
              -- hot-band-key cap (mirror of max_bucket=200)
              select * from banded0
              qualify count(*) over (partition by band_no, key) <= 200
            )
            select distinct a.doc_id as id_a, b.doc_id as id_b,
                   bit_count(xor(a.sh, b.sh))::int as hamming
            from banded a join banded b
              on a.band_no = b.band_no and a.key = b.key
             and a.doc_id < b.doc_id
            where bit_count(xor(a.sh, b.sh)) <= 8
            order by id_a, id_b
        """,
        "ann_cosine_topk": f"""
            select vec_id as id,
                   round(list_dot_product(embedding::DOUBLE[], {qv}::DOUBLE[])
                     / greatest(sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[]))
                        * sqrt(list_dot_product({qv}::DOUBLE[],
                                                {qv}::DOUBLE[])), 1e-12),
                     6)::double as score
            from embeddings
            order by score desc, id asc limit 25
        """,
        "ann_lsh_topk": f"""
            with b as (
              select vec_id as id, embedding,
                     {bucket_sql('embedding')} as bucket
              from embeddings
            )
            select id,
                   round(list_dot_product(embedding::DOUBLE[], {qv}::DOUBLE[])
                     / greatest(sqrt(list_dot_product(embedding::DOUBLE[],
                                                      embedding::DOUBLE[]))
                        * sqrt(list_dot_product({qv}::DOUBLE[],
                                                {qv}::DOUBLE[])), 1e-12),
                     6)::double as score
            from b where bucket = {qbucket}
            order by score desc, id asc limit 25
        """,
        "ann_ivf_topk": f"""
            with c as (
              select vec_id as id, embedding::DOUBLE[] as e
              from embeddings
            ), a as (
              select id, e,
                     (list_sort([{ivf_assign_structs}]))[1].idx as list_id
              from c
            )
            select id,
                   round(list_dot_product(e, {qv}::DOUBLE[])
                     / greatest(sqrt(list_dot_product(e, e))
                        * sqrt(list_dot_product({qv}::DOUBLE[],
                                                {qv}::DOUBLE[])), 1e-12),
                     6)::double as score
            from a where list_id in ({ivf_probes})
            order by score desc, id asc limit 25
        """,
        "embedding_neardup": f"""
            with b as (
              select vec_id as id, embedding::DOUBLE[] as vec,
                     {bucket_sql('embedding')} as bucket
              from embeddings
            ), s as (
              -- degenerate-bucket cap (mirror of max_bucket=40)
              select * from b
              qualify count(*) over (partition by bucket) between 2 and 40
            )
            select a.id as id_a, b2.id as id_b,
                   round(list_dot_product(a.vec, b2.vec)
                     / greatest(sqrt(list_dot_product(a.vec, a.vec))
                        * sqrt(list_dot_product(b2.vec, b2.vec)), 1e-12),
                     6)::double as cos
            from s a join s b2 on a.bucket = b2.bucket and a.id < b2.id
            where list_dot_product(a.vec, b2.vec)
                     / greatest(sqrt(list_dot_product(a.vec, a.vec))
                        * sqrt(list_dot_product(b2.vec, b2.vec)), 1e-12)
                  >= 0.40
            order by id_a, id_b
        """,
        # SemDeDup: same centroid literals as ann_ivf (list_sort of
        # (d2, idx) structs = Spark's F.least), rank = row_number over
        # (d2, id) within cluster, upper-triangular pairs at cos ≥ 0.35
        # computed on the ROUNDED value exactly like the Spark filter;
        # cap mirrored as cn between 2 and 70
        "semdedup_pairs": f"""
            with c as (
              select vec_id as id, embedding::DOUBLE[] as e
              from embeddings
            ), a as (
              select id, e,
                     (list_sort([{ivf_assign_structs}]))[1] as asg
              from c
            ), s as (
              select id, e, asg.idx as list_id,
                     row_number() over (partition by asg.idx
                                        order by asg.d2, id) as rk
              from a
              qualify count(*) over (partition by asg.idx)
                      between 2 and 70
            )
            select id_a, id_b, cos from (
              select x.id as id_a, y.id as id_b,
                     round(list_dot_product(x.e, y.e)
                       / greatest(sqrt(list_dot_product(x.e, x.e))
                          * sqrt(list_dot_product(y.e, y.e)), 1e-12),
                       6)::double as cos
              from s x join s y
                on x.list_id = y.list_id and x.rk < y.rk
            ) where cos >= 0.35
            order by id_a, id_b
        """,
        "lang_id": f"""
            select doc_id, {lang_expr} as lang_pred
            from documents order by doc_id
        """,
        "quality_score": f"""
            select doc_id,
                   round(0.4 * (least(length(text), 2000) / 2000.0)
                       + 0.3 * (1 - {punct_ratio})
                       + 0.3 * least({sw_ratio} * 4, 1.0), 6)::double
                     as quality
            from documents order by doc_id
        """,
        "gopher_quality": r"""
            with t as (
              select doc_id, text,
                     list_filter(string_split_regex(text, '\s+'),
                                 w -> len(w) > 0) as ws,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 w -> len(w) > 0) as lws,
                     list_filter(string_split(text, chr(10)),
                                 ln -> len(trim(ln)) > 0) as lines
              from documents
            ), m as (
              select doc_id,
                     len(ws) as n_words,
                     greatest(len(ws), 1)::double as nw,
                     list_sum(list_transform(ws, w -> len(w)))::double
                       / greatest(len(ws), 1) as mean_word_len,
                     ((length(text) - length(replace(text, '#', '')))
                      + len(regexp_extract_all(text, '\.\.\.|…')))
                       / greatest(len(ws), 1)::double as symbol_ratio,
                     len(list_filter(ws,
                         w -> regexp_matches(w, '[A-Za-z]')))
                       / greatest(len(ws), 1)::double as alpha_word_frac,
                     len(list_filter(lines, ln ->
                         regexp_matches(trim(ln), '^([-*•])')))
                       / greatest(len(lines), 1)::double as bullet_frac,
                     len(list_filter(lines, ln ->
                         regexp_matches(trim(ln), '(\.\.\.|…)$')))
                       / greatest(len(lines), 1)::double as ell_frac,
                     (list_contains(lws, 'the')::int
                      + list_contains(lws, 'be')::int
                      + list_contains(lws, 'to')::int
                      + list_contains(lws, 'of')::int
                      + list_contains(lws, 'and')::int
                      + list_contains(lws, 'that')::int
                      + list_contains(lws, 'have')::int
                      + list_contains(lws, 'with')::int) as stop_hits
              from t
            )
            select doc_id, n_words,
                   round(mean_word_len, 6)::double as mean_word_len,
                   round(symbol_ratio, 6)::double as symbol_ratio,
                   round(alpha_word_frac, 6)::double as alpha_word_frac,
                   stop_hits,
                   (n_words between 50 and 100000
                    and mean_word_len between 3.0 and 10.0
                    and symbol_ratio <= 0.1
                    and bullet_frac <= 0.9
                    and ell_frac <= 0.3
                    and alpha_word_frac >= 0.8
                    and stop_hits >= 2)::int as keep
            from m order by doc_id
        """,
        "repetition_ratios": r"""
            with t as (
              select doc_id,
                     list_transform(
                       list_filter(string_split(text, chr(10)),
                                   ln -> len(trim(ln)) > 0),
                       ln -> trim(ln)) as lt,
                     list_filter(string_split_regex(text, '\s+'),
                                 w -> len(w) > 0) as ws
              from documents
            ), g as (
              select doc_id, lt,
                     case when len(ws) >= 3 then
                       [array_to_string(ws[i:i+2], ' ')
                        for i in range(1, greatest(len(ws)-2, 1)+1)]
                     else [array_to_string(ws, ' ')] end as grams
              from t
            )
            select doc_id,
                   round((len(lt) - len(list_distinct(lt)))
                         / greatest(len(lt), 1)::double, 6)::double
                     as dup_line_frac,
                   round((len(grams) - len(list_distinct(grams)))
                         / greatest(len(grams), 1)::double, 6)::double
                     as dup_ngram_frac
            from g order by doc_id
        """,
        "token_counts": r"""
            select doc_id,
                   len(list_filter(string_split_regex(text, '\s+'),
                       t -> len(t) > 0))::int as n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::int
                     as n_bpe_tokens
            from documents order by doc_id
        """,
        "doc_fingerprint": f"""
            select doc_id, md5({norm}) as fp
            from documents order by doc_id
        """,
        "doc_winnow": f"""
            with t as (
              select doc_id, {norm} as nt from documents where doc_id < 100
            ), g as (
              select doc_id,
                case when length(nt) >= 5 then
                  [('0x' || substr(md5(substr(nt, i, 5)), 1, 15))::bigint
                   for i in range(1, greatest(length(nt) - 4, 1) + 1)]
                else [('0x' || substr(md5(nt), 1, 15))::bigint] end as h
              from t
            ), sel as (
              select doc_id,
                case when len(h) >= 4 then
                  [list_min(h[j:j+3])
                   for j in range(1, greatest(len(h) - 3, 1) + 1)]
                else [list_min(h)] end as s
              from g
            )
            select doc_id, unnest(list_sort(list_distinct(s))) as fp
            from sel order by doc_id, fp
        """,
        "events_window": """
            select time_bucket(interval '1 hour', ts) as window_start,
                   event_type,
                   count(*) as n_events,
                   round(sum(value), 4) as value_sum
            from events
            group by 1, 2
            order by window_start, event_type
        """,
        "lineage_counts": """
            select (('0x' || substr(md5(doc_id::varchar), 1, 4))::int
                      % 8)::bigint as bucket,
                   count(*) as doc_count,
                   sum(n_chars)::bigint as char_count
            from documents group by 1 order by bucket
        """,
    }
    out["dedup_simhash"] = out["dedup_simhash"].replace("__BANDS__",
                                                        bands_vals)
    # rich extract path vs the frozen pure-Python oracle output
    # (scripts/freeze_extract_oracle.py; column order mirrors the Spark
    # side, values are what reference semantics demand)
    fixture = "/root/repo/tests/fixtures/extract_full_expected.parquet"
    out["extract_full"] = f"""
        select doc_id, ord, kind, text, media_ref,
               mime_type, category, tags_joined
        from read_parquet('{fixture}')
        order by doc_id, ord
    """
    # multimodal operators vs frozen Spark-free expected parquet
    # (scripts/freeze_multimodal_oracle.py — the extract_full pattern)
    fixdir = "/root/repo/tests/fixtures"
    out["pack_interleaved"] = f"""
        select doc_id, chunk_id, n_tokens, n_media, text, refs_joined
        from read_parquet('{fixdir}/interleaved_pack_expected.parquet')
        order by doc_id, chunk_id
    """
    out["compression_ratio"] = f"""
        select doc_id, raw_len, comp_len, ratio_q
        from read_parquet('{fixdir}/compress_expected.parquet')
        order by doc_id
    """
    out["warc_records"] = f"""
        select warc_file, record_offset, record_length, record_type,
               record_id, target_uri, warc_date, content_length,
               http_status, http_content_type, payload_md5,
               payload_len, error
        from read_parquet('{fixdir}/warc_records_expected.parquet')
        order by warc_file, record_offset
    """
    out["image_features"] = f"""
        select media_id, width, height, caption,
               coalesce(array_to_string(emb_q, ','), '') as emb_q, error
        from read_parquet('{fixdir}/image_features_expected.parquet')
        order by media_id
    """
    out["image_phash"] = f"""
        select media_id, phash, coalesce(error, '') as error
        from read_parquet('{fixdir}/phash_expected.parquet')
        order by media_id
    """
    out["phash_pairs"] = f"""
        select id_a, id_b, hamming
        from read_parquet('{fixdir}/phash_pairs_expected.parquet')
        order by id_a, id_b
    """
    out["frame_sample"] = f"""
        select media_id, frame_no, frame_md5, frame_len, error
        from read_parquet('{fixdir}/frame_sample_expected.parquet')
        order by media_id, frame_no
    """
    out["image_resize"] = f"""
        select media_id, width, height, out_md5, out_len, error
        from read_parquet('{fixdir}/image_resize_expected.parquet')
        order by media_id
    """
    out["audio_chunks"] = f"""
        select media_id, chunk_no, chunk_md5, chunk_len, error
        from read_parquet('{fixdir}/audio_chunks_expected.parquet')
        order by media_id, chunk_no
    """
    # stored-IVF read path: scan the SAME frozen hive-partitioned index
    # the Spark query reads, restricted to the same nprobe lists
    # (`ivf_probes` is computed once above from the shared centroid
    # literals), same cosine + rounding as the other ann rows
    out["ann_ivf_topk_stored"] = f"""
        select id,
               round(list_dot_product(vec::DOUBLE[], {qv}::DOUBLE[])
                 / greatest(sqrt(list_dot_product(vec::DOUBLE[],
                                                  vec::DOUBLE[]))
                    * sqrt(list_dot_product({qv}::DOUBLE[],
                                            {qv}::DOUBLE[])), 1e-12),
                 6)::double as score
        from read_parquet('{fixdir}/ivf_index/*/*.parquet',
                          hive_partitioning = true)
        where list_id::int in ({ivf_probes})
        order by score desc, id asc limit 25
    """
    # streaming first-seen dedup: the fixture batches are pure arithmetic
    # (see q_stream_first_seen), so the oracle regenerates them with
    # range() and takes each key's arg-min by ord — equal to first-seen
    # because later-batch duplicates carry strictly larger ord
    out["stream_first_seen"] = """
        with rows_all as (
          select i as key, 2 * i as ord, 'a' as val from range(300) t(i)
          union all
          select i, 2 * i + 1, 'b' from range(50) t(i)
          union all
          select i, 1000 + i, 'c' from range(100) t(i)
          union all
          select i, 1000 + i, 'n' from range(300, 350) t(i)
        )
        select key, min(ord) as ord, arg_min(val, ord) as val
        from rows_all group by key order by key
    """
    # connected components over the simhash pair graph: the pair CTE is
    # the dedup_simhash SQL verbatim (bands already substituted), closed
    # transitively with a recursive reachability CTE; cluster_id =
    # min(reachable) — the same graph property the alternating-star
    # algorithm converges to, computed a completely different way
    # SemDeDup keep set: corpus minus the pair drop set (distinct id_b)
    out["semdedup_keep"] = f"""
        select vec_id from embeddings
        where vec_id not in (
          select id_b from ({out["semdedup_pairs"]}) p
        )
        order by vec_id
    """

    # ---- iterative Lloyd's kmeans on the exact integer grid (operators/
    # semdedup.py): the oracle UNROLLS the same 2 assign+update rounds.
    # Distances via the dot identity qq - 2qc + cc on DOUBLE lists —
    # every value is an integer < 2^53, so the doubles are exact and the
    # argmin matches Spark's BIGINT fold bit-for-bit. Centroid update =
    # round-half-up of the exact rational mean, floor((2S+N)/(2N)): 2S+N
    # is an exact double and a non-integer quotient is ≥ 1/(2N) from any
    # integer, so floor is safe (Spark computes the same value in Python
    # ints driver-side).
    def _km_dist(q, c):
        return (
            f"(list_dot_product({q}::DOUBLE[], {q}::DOUBLE[])"
            f" - 2*list_dot_product({q}::DOUBLE[], {c}::DOUBLE[])"
            f" + list_dot_product({c}::DOUBLE[], {c}::DOUBLE[]))"
        )

    def _km_assign(name, cents):
        return f"""{name} as (
          select id, q, c from (
            select p.id, p.q, s.cidx as c,
              row_number() over (partition by p.id order by
                {_km_dist('p.q', 's.q')} asc, s.cidx asc) as rn
            from q p cross join {cents} s) t where rn = 1
        )"""

    def _km_update(name, asg, prev, dim=64):
        return f"""{name}_s as (
          select c, i, sum(q[i])::BIGINT as s, count(*)::BIGINT as n
          from {asg} cross join generate_series(1, {dim}) g(i)
          group by c, i
        ), {name} as (
          select sd.cidx, coalesce(u.cent, sd.q) as q
          from {prev} sd left join (
             select c, list(cast(floor((2.0*s + n)/(2.0*n)) as bigint)
                            order by i) as cent
             from {name}_s group by c) u on u.c = sd.cidx
        )"""

    def _km_ctes(k=4, iters=2, scale=1_000_000):
        parts = [
            f"""q as (
              select vec_id as id,
                     [cast(floor(x*{scale} + 0.5) as bigint)
                      for x in embedding::DOUBLE[]] as q
              from embeddings where embedding is not null
            )""",
            f"""c0 as (
              select row_number() over (
                       order by md5(id::varchar) asc, id asc) - 1 as cidx,
                     q
              from q
              order by md5(id::varchar) asc, id asc limit {k}
            )""",
        ]
        cur = "c0"
        for t in range(iters):
            parts.append(_km_assign(f"a{t}", cur))
            parts.append(_km_update(f"c{t + 1}", f"a{t}", cur))
            cur = f"c{t + 1}"
        parts.append(_km_assign("afin", cur))
        return "with " + ",\n".join(parts)

    out["embedding_kmeans"] = (
        _km_ctes()
        + "\nselect id as vec_id, c::INT as cluster from afin"
        + " order by vec_id"
    )
    # triangular SemDeDup rule over the kmeans clusters: exact HUGEINT
    # threshold test (tau_q=4500 i.e. tau=0.45), mirror of the Spark
    # side's DECIMAL(38) comparison — dots are integer-valued doubles
    # < 2^53, cast to HUGEINT before multiplying so nothing rounds
    out["kmeans_semdedup"] = (
        _km_ctes()
        + """,
        flags as (
          select x.id, x.c,
            max(case when y.id is not null
              and list_dot_product(x.q::DOUBLE[], y.q::DOUBLE[]) > 0
              and 20250000::HUGEINT
                  * list_dot_product(x.q::DOUBLE[], x.q::DOUBLE[])::HUGEINT
                  * list_dot_product(y.q::DOUBLE[], y.q::DOUBLE[])::HUGEINT
                <= 100000000::HUGEINT
                  * list_dot_product(x.q::DOUBLE[], y.q::DOUBLE[])::HUGEINT
                  * list_dot_product(x.q::DOUBLE[], y.q::DOUBLE[])::HUGEINT
              then 1 else 0 end) as dropped
          from afin x left join afin y on y.c = x.c and y.id < x.id
          group by x.id, x.c
        )
        select id as vec_id, c::INT as cluster,
               (1 - coalesce(dropped, 0))::INT as kept
        from flags order by vec_id"""
    )
    out["dedup_clusters"] = f"""
        with recursive pairs as ({out["dedup_simhash"]}),
        edges as (
          select id_a as u, id_b as v from pairs
          union
          select id_b, id_a from pairs
        ),
        nodes as (select distinct u from edges),
        reach as (
          select u, u as x from nodes
          union
          select r.u, e.v as x from reach r join edges e on r.x = e.u
        ),
        lab as (
          select u as doc_id, min(x) as cluster_id from reach group by u
        )
        select doc_id, cluster_id,
               (count(*) over (partition by cluster_id))::bigint as csize,
               (case when doc_id = cluster_id then 1 else 0 end)::int
                 as keep
        from lab order by doc_id
    """
    # C4 line rules (same predicate text as functions/text.py::c4_clean)
    # over the same derived multi-line text as the Spark side
    out["c4_clean"] = r"""
        with aug as (
          select doc_id,
                 replace(text, ' table ', '.' || chr(10) || 'table ')
                 || case when doc_id % 7 = 0
                         then chr(10) || 'Enable javascript today.'
                         else '' end
                 || case when doc_id % 11 = 0
                         then chr(10) || 'lorem ipsum dolor sit amet.'
                         else '' end
                 || case when doc_id % 13 = 0
                         then chr(10) || 'config = { }'
                         else '' end as text
          from documents
        ), L as (
          select doc_id, text,
                 string_split(text, chr(10)) as lines
          from aug
        ), K as (
          select doc_id, text, lines,
                 list_filter(lines, l ->
                   (right(trim(l), 1) in ('.', '!', '?', '"', ''''))
                   and len(list_filter(
                         string_split_regex(trim(l), '\s+'),
                         t -> len(t) > 0)) >= 3
                   and not contains(lower(trim(l)), 'javascript')
                 ) as kept
          from L
        )
        select doc_id,
               md5(coalesce(array_to_string(
                     list_transform(kept, l -> trim(l)), chr(10)),
                   '')) as clean_md5,
               len(kept)::int as n_kept,
               (len(lines) - len(kept))::int as n_dropped,
               contains(lower(text), 'lorem ipsum')::int as has_lorem,
               contains(text, '{')::int as has_brace
        from K order by doc_id
    """
    # PII redaction: same deterministic augmentation + the same three
    # Java/RE2-portable patterns applied in the same order
    from lens_spark.functions.text import (
        PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE,
    )

    out["pii_redact"] = f"""
        with aug as (
          select doc_id,
                 text || ' Contact user' || doc_id::varchar
                      || '@example.com or 10.0.'
                      || (doc_id % 256)::varchar
                      || '.7, call +1 (555) 123-4567 x'
                      || doc_id::varchar || '.' as t
          from documents
        ), p1 as (
          select doc_id,
                 len(regexp_extract_all(t, '{PII_EMAIL_RE}')) as n_email,
                 regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g') as t1
          from aug
        ), p2 as (
          select doc_id, n_email,
                 len(regexp_extract_all(t1, '{PII_IPV4_RE}')) as n_ip,
                 regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') as t2
          from p1
        ), p3 as (
          select doc_id, n_email, n_ip,
                 len(regexp_extract_all(t2, '{PII_PHONE_RE}')) as n_phone,
                 regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') as t3
          from p2
        )
        select doc_id, md5(t3) as red_md5,
               n_email::int as n_email, n_ip::int as n_ip,
               n_phone::int as n_phone
        from p3 order by doc_id
    """
    # int8 quantization: identical float→double cast, 127/max|x| scale,
    # floor(x·scale + 0.5) code — both engines in IEEE doubles
    out["embedding_quantize"] = """
        with d as (
          select vec_id as id, embedding::DOUBLE[] as e from embeddings
        ), s as (
          select id, e,
                 list_max(list_transform(e, x -> abs(x))) as m
          from d
        ), sc as (
          select id, e,
                 case when m > 0 then 127.0 / m else 0.0 end as scale
          from s
        )
        select id,
               floor(scale * 10000.0)::bigint as scale_q,
               array_to_string(
                 list_transform(
                   e, x -> (floor(x * scale + 0.5)::int)::varchar),
                 ',') as q_joined
        from sc order by id
    """
    # next-fit packing: the sequential recurrence as a recursive CTE
    # stepping row_number order within each source group — acc/seq carry
    # exactly the applyInPandas loop's state transition
    out["pack_sequences"] = r"""
        with recursive d as (
          select source, doc_id,
                 len(list_filter(string_split_regex(text, '\s+'),
                     t -> len(t) > 0))::int as n_tok,
                 row_number() over (partition by source
                                    order by doc_id) as rn
          from documents
        ), pk as (
          select source, rn, doc_id, n_tok,
                 n_tok as acc, 0::bigint as seq
          from d where rn = 1
          union all
          select d.source, d.rn, d.doc_id, d.n_tok,
                 case when pk.acc > 0 and pk.acc + d.n_tok > 256
                      then d.n_tok else pk.acc + d.n_tok end,
                 case when pk.acc > 0 and pk.acc + d.n_tok > 256
                      then pk.seq + 1 else pk.seq end
          from pk join d
            on d.source = pk.source and d.rn = pk.rn + 1
        )
        select source, doc_id, n_tok, seq as seq_id,
               (row_number() over (partition by source, seq
                                   order by doc_id) - 1)::int as seq_pos
        from pk order by source, doc_id
    """
    out["events_sessions"] = """
        with o as (
          select user_id, event_id, ts, value,
                 lag(ts) over (partition by user_id order by ts, event_id)
                   as prev
          from events
        ), marked as (
          select *,
                 (case when prev is null
                         or ts > prev + interval 30 minute
                       then 1 else 0 end) as new_s
          from o
        ), sess as (
          select *,
                 sum(new_s) over (partition by user_id
                                  order by ts, event_id
                                  rows unbounded preceding) as sid
          from marked
        )
        select min(ts) as session_start,
               max(ts) + interval 30 minute as session_end,
               user_id,
               count(*) as n_events,
               round(sum(value), 4) as value_sum
        from sess
        group by user_id, sid
        order by user_id, session_start
    """
    # 5-gram shingles (word_shingles k=5 over the same normalized
    # tokens), benchmark = doc_id % 50, distinct-gram overlap counts
    # MinHash fuzzy decontamination: corpus/bench signatures built with
    # the dedup_minhash_lsh md5 construction (mins per seed, per-band
    # md5 of its own 2 mins), candidates via band equality, verified by
    # component-agreement count; best match = max agree, lowest bench id
    out["fuzzy_decontam"] = f"""
        with ctoks as (
          select doc_id, {ws_toks} as tk from documents
          where doc_id < 200
        ), bsrc as (
          select doc_id,
                 text || ' eval suite answer key tail' as text
          from documents where doc_id < 200 and doc_id % 40 = 0
        ), btoks as (
          select doc_id, {ws_toks} as tk from bsrc
        ), csh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from ctoks
        ), bsh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from btoks
        ), csig as (
          select doc_id,
            [list_min(list_transform(shingles,
                s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from csh
        ), bsig as (
          select doc_id,
            [list_min(list_transform(shingles,
                s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from bsh
        ), cbands as (
          select doc_id, sig, b as band_no,
                 md5(array_to_string(sig[2*b+1:2*b+2], '|')) as bucket
          from csig, unnest([0,1,2,3]) as t(b)
        ), bbands as (
          select doc_id, sig, b as band_no,
                 md5(array_to_string(sig[2*b+1:2*b+2], '|')) as bucket
          from bsig, unnest([0,1,2,3]) as t(b)
        ), scored as (
          select distinct c.doc_id, b.doc_id as bench_id,
                 list_sum(list_transform(range(1, 9),
                   i -> case when c.sig[i] = b.sig[i]
                             then 1 else 0 end))::int as n_agree
          from cbands c join bbands b
            on c.band_no = b.band_no and c.bucket = b.bucket
        ), best as (
          select doc_id, n_agree, bench_id from scored
          qualify row_number() over (partition by doc_id
                    order by n_agree desc, bench_id) = 1
        )
        select d.doc_id,
               coalesce(b.n_agree, 0)::int as n_agree,
               coalesce(b.bench_id, -1)::bigint as fuzzy_match_id,
               (coalesce(b.n_agree, 0) >= 4)::int as fuzzy_contaminated
        from (select doc_id from documents where doc_id < 200) d
        left join best b using(doc_id)
        order by d.doc_id
    """
    out["decontaminate"] = f"""
        with tk as (
          select doc_id, {ws_toks} as tk from documents
        ), g as (
          select doc_id,
            case when len(tk) >= 5 then
              list_distinct([array_to_string(tk[i:i+4], ' ')
                             for i in range(1,
                               greatest(len(tk) - 4, 1) + 1)])
            else [array_to_string(tk, ' ')] end as grams
          from tk
        ), ex as (
          select doc_id, unnest(grams) as gram from g
        ), bench as (
          select distinct gram from ex where doc_id % 50 = 0
        ), hits as (
          select e.doc_id, count(*)::bigint as n_hits
          from ex e join bench using (gram) group by e.doc_id
        )
        select d.doc_id,
               coalesce(h.n_hits, 0)::bigint as n_hits,
               (coalesce(h.n_hits, 0) > 0)::int as contaminated
        from documents d left join hits h using (doc_id)
        order by d.doc_id
    """
    out["word_counts"] = r"""
        with toks as (
          select unnest(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   t -> len(t) > 0)) as tok
          from documents
        )
        select tok, count(*) as n from toks
        group by tok order by n desc, tok limit 100
    """
    # same md5-prefix bucket arithmetic as the lineage_counts row
    out["hash_sample"] = """
        select doc_id, lang from documents
        where (('0x' || substr(md5(doc_id::varchar), 1, 4))::int % 100)
              < (case when lang = 'en' then 50 else 20 end)
        order by doc_id
    """
    # quantile_cont == Spark's exact `percentile` (both linear
    # interpolation at rank (n-1)·p); quantized floor(x·1e4) both sides
    out["corpus_stats"] = """
        select lang,
               count(*) as n_docs,
               sum(n_chars)::bigint as chars,
               floor(quantile_cont(n_chars, 0.5) * 10000.0)::bigint
                 as p50_q,
               floor(quantile_cont(n_chars, 0.9) * 10000.0)::bigint
                 as p90_q
        from documents group by lang order by lang
    """
    # exact substring spans: k-token sliding windows, corpus-global
    # occurrence count ON THE WINDOW TEXT (the Spark side shuffles
    # xxhash64 of the same joined text — engine-internal, so no hash
    # parity needed), then per-doc gaps-and-islands merge at gap > k
    out["duplicate_spans"] = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        w as (
          select doc_id, i as pos,
                 array_to_string(toks[i:i+14], ' ') as win
          from t, unnest(generate_series(1, len(toks) - 14)) as u(i)
          where len(toks) >= 15
        ),
        occ as (
          select doc_id, pos from w
          where win in (select win from w
                        group by win having count(*) >= 2)
        ),
        brk as (
          select doc_id, pos,
                 case when pos - lag(pos) over
                        (partition by doc_id order by pos) <= 15
                      then 0 else 1 end as newgrp
          from occ
        ),
        grp as (
          select doc_id, pos,
                 sum(newgrp) over
                   (partition by doc_id order by pos) as g
          from brk
        )
        select doc_id,
               min(pos) as span_start,
               max(pos) + 15 as span_end,
               count(*) as n_windows
        from grp group by doc_id, g
        order by doc_id, span_start
    """
    # keep_first variant: row_number over (doc_id, pos) per window text
    # excludes each window's corpus-global first occurrence
    out["duplicate_spans_keepfirst"] = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        w as (
          select doc_id, i as pos,
                 array_to_string(toks[i:i+14], ' ') as win
          from t, unnest(generate_series(1, len(toks) - 14)) as u(i)
          where len(toks) >= 15
        ),
        occ as (
          select doc_id, pos from (
            select doc_id, pos,
                   count(*) over (partition by win) as c,
                   row_number() over
                     (partition by win order by doc_id, pos) as rn
            from w
          ) where c >= 2 and rn > 1
        ),
        brk as (
          select doc_id, pos,
                 case when pos - lag(pos) over
                        (partition by doc_id order by pos) <= 15
                      then 0 else 1 end as newgrp
          from occ
        ),
        grp as (
          select doc_id, pos,
                 sum(newgrp) over
                   (partition by doc_id order by pos) as g
          from brk
        )
        select doc_id,
               min(pos) as span_start,
               max(pos) + 15 as span_end,
               count(*) as n_windows
        from grp group by doc_id, g
        order by doc_id, span_start
    """
    # ExactSubstr deletion applied: token rows anti-joined against the
    # span coverage, text rebuilt with an ordered string_agg
    out["dedup_clean_text"] = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        w as (
          select doc_id, i as pos,
                 array_to_string(toks[i:i+14], ' ') as win
          from t, unnest(generate_series(1, len(toks) - 14)) as u(i)
          where len(toks) >= 15
        ),
        occ as (
          select doc_id, pos from w
          where win in (select win from w
                        group by win having count(*) >= 2)
        ),
        brk as (
          select doc_id, pos,
                 case when pos - lag(pos) over
                        (partition by doc_id order by pos) <= 15
                      then 0 else 1 end as newgrp
          from occ
        ),
        grp as (
          select doc_id, pos,
                 sum(newgrp) over
                   (partition by doc_id order by pos) as g
          from brk
        ),
        spans as (
          select doc_id, min(pos) as s, max(pos) + 15 as e
          from grp group by doc_id, g
        ),
        cov as (
          select doc_id, c.i as i
          from spans, unnest(generate_series(s, e - 1)) as c(i)
        ),
        tokrows as (
          select t.doc_id, u.i as i, toks[u.i] as tok
          from t, unnest(generate_series(1, len(toks))) as u(i)
        ),
        clean as (
          select tr.doc_id,
                 string_agg(tr.tok, ' ' order by tr.i) as ct,
                 count(*) as nkept
          from tokrows tr
          left join cov on tr.doc_id = cov.doc_id and tr.i = cov.i
          where cov.i is null
          group by tr.doc_id
        )
        select d.doc_id,
               md5(coalesce(c.ct, '')) as clean_md5,
               (coalesce(len(t.toks), 0) - coalesce(c.nkept, 0))::bigint
                 as n_removed_tokens
        from documents d
        left join t on d.doc_id = t.doc_id
        left join clean c on d.doc_id = c.doc_id
        order by d.doc_id
    """
    # chunking: chunk count 1 + ceil((n-32)/24) (clamped at 1), slices
    # clamp at the list end on both engines
    out["chunk_docs"] = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        nc as (
          select doc_id, toks,
                 case when len(toks) <= 32 then 1
                      else ((len(toks) - 33) // 24) + 2 end as n_chunks
          from t where len(toks) >= 1
        )
        select doc_id,
               j as chunk_id,
               len(toks[j*24 + 1 : j*24 + 32]) as n_tokens,
               array_to_string(toks[j*24 + 1 : j*24 + 32], ' ')
                 as chunk_text
        from nc, unnest(generate_series(0, n_chunks - 1)) as u(j)
        order by doc_id, chunk_id
    """
    # hashed linear classifier: integer weight sum is exact on both
    # engines (order-free); the final sigmoid is floating point, so the
    # oracle uses the IDENTICAL IEEE operation order as the Spark side
    # (sigmoid first, then *10000, then floor — ADVICE r4: the algebraic
    # rewrite floor(10000/(1+e^-l)) can differ by 1 ulp at a
    # quantization boundary)
    from lens_spark.functions.classifier import linear_weights

    _w = "[" + ", ".join(str(x) for x in linear_weights(256)) + "]"
    # per-source quality profile: every fragment reuses an
    # already-green oracle expression (ws tokens, normalize/md5,
    # classifier sigmoid with the identical IEEE op order)
    out["quality_profile"] = f"""
        with w as (select {_w} as arr),
        t as (
          select doc_id, source, text,
                 list_filter(string_split_regex(
                   replace(lower(text), 'ς', 'σ'), '\\s+'),
                             x -> len(x) > 0) as ntoks,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        tok as (select doc_id, unnest(ntoks) as tk from t),
        s as (
          select doc_id,
                 sum(w.arr[
                   (('0x' || substr(md5(tk), 1, 8))::bigint % 256) + 1
                 ])::bigint as sum_w,
                 count(*)::bigint as n_tok
          from tok, w group by doc_id
        ),
        p as (
          select t.doc_id, t.source, len(t.toks) as n_tok_ws,
                 length(t.text) as n_chars,
                 md5(trim(regexp_replace(lower(t.text), '\\s+', ' ',
                                         'g'))) as fp,
                 floor((1.0 / (1.0 + exp(-(
                   coalesce(s.sum_w, 0)
                   / (1000.0 * greatest(coalesce(s.n_tok, 0), 1))
                 )))) * 10000.0)::bigint as prob_q
          from t left join s on s.doc_id = t.doc_id
        )
        select source,
               count(*) as n_docs,
               sum(n_tok_ws)::bigint as tokens,
               sum(n_chars)::bigint as chars,
               count(distinct fp) as uniq_contents,
               sum(prob_q)::bigint as clf_q_sum
        from p group by source order by source
    """
    # incremental exact dedup: the stored-index probe replicated —
    # same normalize/md5 rule as dedup_exact, same left-join semantics
    out["dedup_increment"] = r"""
        with ex as (
          select md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   as fingerprint,
                 min(doc_id) as rep_id
          from documents where doc_id < 400 group by 1
        ), new as (
          select doc_id as id, text from documents where doc_id >= 400
          union all
          select doc_id + 1000, text from documents where doc_id < 50
          union all
          select doc_id + 2000, text from documents
          where doc_id >= 400 and doc_id < 450
        ), nd as (
          select id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   as fingerprint
          from new
        ), f as (
          select id, fingerprint,
                 min(id) over (partition by fingerprint) as first_id
          from nd
        )
        select f.id, f.fingerprint,
               case when ex.rep_id is not null then 'corpus_dup'
                    when f.id != f.first_id then 'increment_dup'
                    else 'unique' end as status,
               case when ex.rep_id is not null then ex.rep_id
                    when f.id != f.first_id then f.first_id
                    else -1 end as dup_of
        from f left join ex using(fingerprint)
        order by f.id
    """
    # Bloom pre-filter probe: the oracle replays the EXACT bit math —
    # k=5 positions per digest via md5(fingerprint:j) folded to 60 bits
    # mod m=8192 — as distinct-position set membership (bit-identical
    # to the (word_idx, bits) word-table check, false positives
    # included)
    out["bloom_probe"] = r"""
        with js as (select j from range(0, 5) t(j)),
        cfp as (
          select md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   as f
          from documents where doc_id < 400
        ), cpos as (
          select distinct
                 ('0x' || substr(md5(f || ':' || j), 1, 15))::bigint
                   % 8192 as pos
          from cfp cross join js
        ), newd as (
          select doc_id as id, text from documents where doc_id >= 400
          union all
          select doc_id + 1000, text from documents where doc_id < 50
        ), nf as (
          select id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   as fingerprint
          from newd
        ), np as (
          select id, fingerprint,
                 ('0x' || substr(md5(fingerprint || ':' || j), 1, 15))
                   ::bigint % 8192 as pos
          from nf cross join js
        )
        select np.id, np.fingerprint,
               min(case when cpos.pos is not null then 1 else 0 end)
                 ::int as bloom_hit
        from np left join cpos using(pos)
        group by np.id, np.fingerprint
        order by np.id
    """
    # deterministic global shuffle: shard = top-32 md5 bits mod 8,
    # pos = row_number within shard over (md5 key, doc_id)
    out["corpus_shuffle"] = r"""
        with k as (
          select doc_id,
                 md5('42:' || cast(doc_id as varchar)) as key
          from documents
        ), s as (
          select doc_id, key,
                 (('0x' || substr(key, 1, 8))::bigint % 8)::int as shard
          from k
        )
        select doc_id, shard,
               (row_number() over (partition by shard
                                   order by key, doc_id))::int as pos
        from s order by shard, pos
    """
    # quality-ranked token-budget cut: naive global cumsum (the Spark
    # side's bucket decomposition is provably equal; quality doubles are
    # the proven-identical rounded expression, ties broken by doc_id)
    out["token_budget_select"] = f"""
        with t as (
          select doc_id,
                 round(0.4 * (least(length(text), 2000) / 2000.0)
                     + 0.3 * (1 - {punct_ratio})
                     + 0.3 * least({sw_ratio} * 4, 1.0), 6)::double
                   as quality,
                 len(list_filter(string_split_regex(text, '\\s+'),
                     t -> len(t) > 0))::bigint as n_tokens
          from documents
        ), c as (
          select doc_id, quality, n_tokens,
                 coalesce(sum(n_tokens) over (
                   order by quality desc, doc_id asc
                   rows between unbounded preceding and 1 preceding),
                   0) as cum0
          from t
        )
        select doc_id, quality, n_tokens from c
        where cum0 < 12000 order by doc_id
    """
    # exact decile binning: the NAIVE rank() formulation over the
    # quantized grid cell — equal to the Spark side's histogram
    # decomposition because ties share cells in both; rank0·10/N is an
    # exact double below 2^53 so floor cannot flip
    out["quantile_bins"] = f"""
        with t as (
          select doc_id,
                 round(0.4 * (least(length(text), 2000) / 2000.0)
                     + 0.3 * (1 - {punct_ratio})
                     + 0.3 * least({sw_ratio} * 4, 1.0), 6)::double
                   as quality
          from documents
        ), q as (
          select doc_id, quality,
                 cast(floor(quality*1000000 + 0.5) as bigint) as cell
          from t
        ), r as (
          select doc_id, quality,
                 rank() over (order by cell asc) - 1 as rank0,
                 count(*) over () as n
          from q
        )
        select doc_id, quality,
               cast(floor(rank0 * 10.0 / n) as int) as qbin
        from r order by doc_id
    """
    # per-group top-k: naive rank window over the QUANTIZED cell (the
    # Spark side's cell decomposition ties on cells, so rank must too:
    # within a cell the order is exact score desc / doc_id asc — on the
    # grid the exact score IS the cell, making the two orders equal)
    out["top_k_per_group"] = f"""
        with t as (
          select doc_id, lang,
                 round(0.4 * (least(length(text), 2000) / 2000.0)
                     + 0.3 * (1 - {punct_ratio})
                     + 0.3 * least({sw_ratio} * 4, 1.0), 6)::double
                   as quality
          from documents
        ), r as (
          select doc_id, lang, quality,
                 row_number() over (
                   partition by lang
                   order by cast(floor(quality*1000000 + 0.5) as bigint)
                            desc, doc_id asc) as rn
          from t
        )
        select doc_id, lang, quality from r
        where rn <= 5 order by doc_id
    """
    # cross-document 3-gram doc frequency (distinct per doc), min_df 2,
    # top 200 by (doc_freq desc, ngram asc) — same shingle rule as the
    # dedup_ngram_jaccard mirror
    out["boilerplate_ngrams"] = f"""
        with toks as (
          select doc_id, {ws_toks} as tk from documents
        ), sh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, greatest(len(tk)-2, 1)+1)])
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        ), g as (select unnest(shingles) as ngram from sh)
        select ngram, count(*)::bigint as doc_freq
        from g where len(ngram) > 0
        group by ngram having count(*) >= 2
        order by doc_freq desc, ngram asc
        limit 200
    """
    # JSONL sink round-trip: the Spark side physically writes + re-reads
    # shards; the oracle is the identity projection (fidelity check)
    out["export_roundtrip"] = """
        select doc_id, lang, source, text
        from documents order by doc_id
    """
    # WET sink round-trip: the Spark side writes real per-record-gzip
    # WET shards and re-parses them; the oracle recomputes the record
    # ids (urn:uuid from md5('wet:42:'||id), wet_record_id) and byte
    # lengths straight from the documents table
    out["wet_roundtrip"] = r"""
        with h as (
          select doc_id, coalesce(text, '') as text,
                 md5('wet:42:' || cast(doc_id as varchar)) as h
          from documents
        )
        select '<urn:uuid:' || substr(h, 1, 8) || '-' || substr(h, 9, 4)
               || '-' || substr(h, 13, 4) || '-' || substr(h, 17, 4)
               || '-' || substr(h, 21, 12) || '>' as record_id,
               'urn:lens:doc:' || cast(doc_id as varchar) as target_uri,
               'conversion' as record_type,
               strlen(text)::bigint as content_length,
               text
        from h order by record_id
    """
    # CDX snapshot diff: latest capture per side (row_number mirrors
    # Spark's max(struct(date, digest, uri))), full outer join, status
    out["cdx_diff"] = r"""
        with d as (
          select doc_id, coalesce(text, '') as t,
                 'com,example)/d/' || cast(doc_id as varchar) as surt,
                 'https://example.com/d/' || cast(doc_id as varchar)
                   as target_uri
          from documents
        ), old_all as (
          select surt, '2026-01-01T00:00:00Z' as d8, md5(t) as g,
                 target_uri as u
          from d where doc_id % 10 <> 0
          union all
          select surt, '2025-12-01T00:00:00Z', md5('stale:' || t),
                 target_uri
          from d where doc_id % 10 <> 0 and doc_id % 3 = 0
        ), old_latest as (
          select surt, g as old_digest, u as old_uri from (
            select *, row_number() over (
              partition by surt order by d8 desc, g desc, u desc
            ) as rn from old_all
          ) where rn = 1
        ), new_latest as (
          select surt,
                 md5(t || case when doc_id % 5 = 0 then 'v2' else ''
                     end) as new_digest,
                 target_uri as new_uri
          from d where doc_id % 7 <> 0
        )
        select coalesce(o.surt, n.surt) as surt,
               case when o.surt is null then 'added'
                    when n.surt is null then 'removed'
                    when o.old_digest = n.new_digest then 'unchanged'
                    else 'changed' end as status,
               coalesce(o.old_digest, '') as old_digest,
               coalesce(n.new_digest, '') as new_digest,
               coalesce(n.new_uri, o.old_uri) as target_uri
        from old_latest o full outer join new_latest n
          on (o.surt = n.surt)
        order by surt
    """
    # as-of join: DuckDB's NATIVE ASOF LEFT JOIN is the oracle for the
    # union-window formulation (identical inclusive-tie semantics);
    # floor(value*100) uses the same IEEE expression shape both sides
    out["asof_join"] = """
        with l as (
          select event_id, ts, user_id from events
          where event_type in ('click', 'error')
        ), r as (
          select user_id, ts, value from events
          where event_type = 'view'
        )
        select l.event_id, l.user_id, l.ts,
               coalesce(epoch_us(r.ts), -1)::bigint as view_ts_us,
               coalesce(floor(r.value * 100), -1)::bigint
                 as view_value_c
        from l asof left join r
          on l.user_id = r.user_id and l.ts >= r.ts
        order by l.event_id
    """
    # bucketed interval join: the oracle is the RAW inequality join —
    # any formulation, same rows
    out["range_join"] = """
        with p as (
          select event_id, ts, user_id from events
          where event_type in ('click', 'error')
        ), iv as (
          select user_id, event_id as iv_id, ts as s,
                 ts + interval 2 hour as e
          from events where event_type = 'view'
        )
        select p.event_id, p.user_id, iv.iv_id, p.ts
        from p join iv
          on p.user_id = iv.user_id and p.ts >= iv.s and p.ts <= iv.e
        order by p.event_id, iv.iv_id
    """
    # Morton key: every interleaved bit recomputed arithmetically
    _z_terms = " + ".join(
        f"(((d{d} >> {i}) & 1) << {i * 2 + d})"
        for i in range(8)
        for d in (0, 1)
    )
    out["zorder_key"] = f"""
        with q as (
          select event_id,
                 (user_id % 256)::bigint as d0,
                 ((epoch_us(ts) // 3600000000) % 256)::bigint as d1
          from events
        )
        select event_id, d0, d1, ({_z_terms})::bigint as zkey
        from q order by event_id
    """
    # continuous rollup: incremental maintenance must equal the
    # one-shot GROUP BY
    out["events_rollup"] = """
        with e as (
          select user_id,
                 floor(value * 100 + 0.5)::bigint as vc,
                 ((epoch_us(ts) // 3600000000) * 3600)::bigint
                   as window_start
          from events
        )
        select window_start, user_id,
               count(*)::bigint as n, sum(vc)::bigint as sum_m,
               min(vc)::bigint as min_m, max(vc)::bigint as max_m
        from e group by window_start, user_id
        order by window_start, user_id
    """
    # stream-fed rollup: same one-shot oracle — stream == batch
    out["stream_rollup"] = out["events_rollup"]
    # postings export: tf per (token, doc), df per token, k=5 cap ==
    # the naive row_number window rule (top_k_per_group's contract)
    out["search_postings"] = f"""
        with t as (
          select doc_id, {analyze_toks} as tk from documents
        ), g as (
          select doc_id, unnest(tk) as token from t
        ), tf as (
          select token, doc_id, count(*)::bigint as tf
          from g group by token, doc_id
        ), d as (
          select token, count(*)::bigint as df from tf group by token
        ), r as (
          select tf.*, row_number() over (
            partition by token order by tf desc, doc_id asc
          ) as rn from tf
        )
        select r.token, r.doc_id, r.tf, d.df
        from r join d using (token)
        where r.rn <= 5
        order by r.token, r.tf desc, r.doc_id
    """
    # lexicon screen: whole-token hits + substring phrase hits
    out["lexicon_filter"] = r"""
        with t as (
          select doc_id, lower(coalesce(text, '')) as low
          from documents
        ), f as (
          select doc_id,
                 (list_has_any(
                    list_filter(string_split_regex(low, '\s+'),
                                w -> len(w) > 0),
                    ['slow', 'zzznotaword']))::int as word_hit,
                 contains(low, 'hash join')::int as phrase_hit
          from t
        )
        select doc_id, word_hit, phrase_hit,
               (1 - greatest(word_hit, phrase_hit))::int as keep
        from f order by doc_id
    """
    # WebDataset manifest: per-shard doc counts under the corpus_shuffle
    # md5 rule, seed 42, 8 shards (tar bytes pinned by pytest)
    out["wds_manifest"] = r"""
        select (('0x' || substr(md5('42:' || cast(doc_id as varchar)),
                                1, 8))::bigint % 8)::int as shard,
               count(*)::bigint as n_docs
        from documents group by shard order by shard
    """
    out["mds_manifest"] = r"""
        select (('0x' || substr(md5('42:' || cast(doc_id as varchar)),
                                1, 8))::bigint % 8)::int as shard,
               count(*)::bigint as samples
        from documents group by shard order by shard
    """
    # attribute-sidecar round trip: same n_words/stop_hits measures as
    # the gopher_quality oracle's m-CTE, filtered by the mix rule
    out["attributes_mix"] = r"""
        with t as (
          select doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             w -> len(w) > 0) as ws,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             w -> len(w) > 0) as lws
          from documents
        ), m as (
          select doc_id,
                 len(ws) as gopher__n_words,
                 (list_contains(lws, 'the')::int
                  + list_contains(lws, 'be')::int
                  + list_contains(lws, 'to')::int
                  + list_contains(lws, 'of')::int
                  + list_contains(lws, 'and')::int
                  + list_contains(lws, 'that')::int
                  + list_contains(lws, 'have')::int
                  + list_contains(lws, 'with')::int) as gopher__stop_hits
          from t
        )
        select doc_id, gopher__n_words, gopher__stop_hits
        from m
        where gopher__n_words >= 60
        order by doc_id
    """
    # URL synthesis + parse + registered domain: the same four URL
    # shapes built from (doc_id, source), the same RE2 regexp, the same
    # public-suffix-lite label rules (generic SLD under 2-letter cc →
    # 3 labels)
    _url_case = r"""
          case doc_id % 4
            when 0 then 'https://www.' || source || '.example.com/p/'
                        || cast(doc_id as varchar)
            when 1 then 'http://blog.' || source || '.co.uk:8080/a/'
                        || cast(doc_id as varchar)
            when 2 then 'https://' || source || '.org'
            else 'http://cdn' || cast(doc_id % 7 as varchar)
                 || '.media.' || source || '.net/img/'
                 || cast(doc_id as varchar)
          end
    """
    _url_regex = r"^([a-z][a-z0-9+.-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)"
    _domain_case = r"""
          case when len(ls) < 2 then host
               when len(ls) >= 3
                    and ls[len(ls)-1] in ('co','com','net','org',
                                          'gov','ac','edu','mil')
                    and len(ls[len(ls)]) = 2
                 then array_to_string(ls[len(ls)-2:len(ls)], '.')
               else array_to_string(ls[len(ls)-1:len(ls)], '.') end
    """
    out["url_parse"] = f"""
        with u as (
          select doc_id, lower(trim({_url_case})) as url from documents
        ), p as (
          select doc_id,
                 regexp_extract(url, '{_url_regex}', 1) as scheme,
                 regexp_extract(url, '{_url_regex}', 2) as host,
                 regexp_extract(url, '{_url_regex}', 3) as port_s,
                 regexp_extract(url, '{_url_regex}', 4) as path
          from u
        ), d as (
          select doc_id, scheme, host,
                 case when port_s = '' then -1
                      else port_s::int end as port,
                 path, string_split(host, '.') as ls
          from p
        )
        select doc_id, scheme, host, port::int as port, path,
               {_domain_case} as domain
        from d order by doc_id
    """
    # per-domain exact-k cap: row_number over (md5 bucket, doc_id)
    # within registered domain — the stratified_sample key rule
    _bl_values = ", ".join(f"('{d}')" for d in _BLOCKED_DOMAINS)
    out["url_blocklist"] = f"""
        with u as (
          select doc_id, lower(trim({_url_case})) as url from documents
        ), p as (
          select doc_id, regexp_extract(url, '{_url_regex}', 2) as host
          from u
        ), b(v) as (values {_bl_values})
        select doc_id, host
        from p
        where not exists (
          select 1 from b
          where p.host = b.v or p.host like '%.' || b.v
        )
        order by doc_id
    """
    # ---- LSH banding tuner: full recompute (sample -> exact jaccard
    # -> md5 signatures -> per-config band collisions -> bp metrics)
    _tcfgs = (1, 2, 4, 8)
    _tn = 8
    _cand_exprs = []
    for _b in _tcfgs:
        _r = _tn // _b
        _terms = " or ".join(
            f"sa[{_i * _r + 1}:{(_i + 1) * _r}] = "
            f"sb[{_i * _r + 1}:{(_i + 1) * _r}]"
            for _i in range(_b)
        )
        _cand_exprs.append(f"({_terms})::int as c{_b}")
    _agg_exprs = ", ".join(
        f"sum(c{_b})::bigint as cand_{_b}, "
        f"sum(c{_b} * dup)::bigint as caught_{_b}"
        for _b in _tcfgs
    )
    _cfg_selects = " union all ".join(
        f"""select {_b}::int as bands, 8::int as num_hashes,
               {_tn // _b}::int as rows_per_band,
               n_pairs, cand_{_b} as candidates, dups,
               caught_{_b} as caught,
               (caught_{_b} * 10000 // greatest(cand_{_b}, 1))::bigint
                 as precision_bp,
               (caught_{_b} * 10000 // greatest(dups, 1))::bigint
                 as recall_bp
        from agg"""
        for _b in _tcfgs
    )
    out["lsh_tuning"] = f"""
        with toks as (
          select doc_id, {ws_toks} as tk from documents
        ), sh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        ), samp as (
          select doc_id, shingles from sh
          order by md5(cast(doc_id as varchar)), doc_id
          limit 350
        ), sigs as (
          select doc_id, shingles,
            [list_min(list_transform(shingles,
                                     s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from samp
        ), pr as (
          select
            case when len(list_distinct(a.shingles || b.shingles)) = 0
                 then 10000
                 else (len(list_intersect(a.shingles, b.shingles))
                       * 10000)
                      // len(list_distinct(a.shingles || b.shingles))
            end as jac,
            a.sig as sa, b.sig as sb
          from sigs a join sigs b on a.doc_id < b.doc_id
        ), fl as (
          select (jac >= 2000)::int as dup,
                 {", ".join(_cand_exprs)}
          from pr
        ), agg as (
          select count(*)::bigint as n_pairs,
                 sum(dup)::bigint as dups, {_agg_exprs}
          from fl
        )
        {_cfg_selects}
        order by bands
    """
    out["hll_registers"] = """
        with h as (
          select md5(cast(doc_id as varchar)) as h from documents
        ), b as (
          select ('0x' || substr(h, 1, 3))::int as bucket,
                 ('0x' || substr(h, 4, 13))::bigint as w
          from h
        )
        select bucket,
               max(case when w = 0 then 53
                        else bit_count((w & -w) - 1) + 1
                   end)::int as rho
        from b group by bucket order by bucket
    """
    # Count-Min registers over per-doc-distinct 3-word shingles: the
    # boilerplate_ngrams sh-CTE feeds the salted-md5 bucket rule the
    # corpus_shuffle rows already pin (d || ':' || key, first 3 hex)
    out["cms_counts"] = f"""
        with toks as (
          select doc_id, {ws_toks} as tk from documents
        ), sh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, greatest(len(tk)-2, 1)+1)])
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        ), g as (select unnest(shingles) as gram from sh),
        e as (
          select d,
                 ('0x' || substr(md5(cast(d as varchar) || ':' || gram),
                                 1, 3))::int as bucket
          from g cross join (select unnest([0, 1, 2, 3]) as d)
          where len(gram) > 0
        )
        select d::int as d, bucket, count(*)::bigint as cnt
        from e group by d, bucket order by d, bucket
    """
    # ---- integer-exact PageRank: unroll 3 rounds (kmeans convention).
    # DuckDB '//' is integer division on BIGINT, matching Spark's
    # F.floor(a/b) on non-negative values.
    _pr_base = """
        e as (
          select distinct src, dst from (
            select doc_id % 97 as src, (doc_id*7+3) % 97 as dst
            from documents
            union all
            select doc_id % 97, (doc_id*13+5) % 97 from documents
          )
        ),
        nodes as (
          select distinct node from (
            select src as node from e union select dst from e
          )
        ),
        cnt as (select count(*)::bigint as n from nodes),
        deg as (
          select nodes.node, coalesce(o.d, 0)::bigint as deg
          from nodes left join (
            select src as node, count(*)::bigint as d from e group by 1
          ) o using (node)
        ),
        r0 as (
          select node,
                 (select 1000000000::bigint // n from cnt)::bigint as pr
          from nodes
        )
    """
    _pr_rounds = ""
    for _i in (1, 2, 3):
        _p = _i - 1
        _pr_rounds += f""",
        d{_i} as (
          select coalesce(sum(r.pr), 0)::bigint as s
          from r{_p} r join deg using (node) where deg.deg = 0
        ),
        c{_i} as (
          select e.dst as node, sum(r.pr // deg.deg)::bigint as m
          from e
          join r{_p} r on e.src = r.node
          join deg on deg.node = e.src
          where deg.deg > 0
          group by e.dst
        ),
        r{_i} as (
          select n.node,
                 (((select 15::bigint * 1000000000 // n from cnt)
                   + 85::bigint * (coalesce(c.m, 0)
                           + (select s from d{_i})
                             // (select n from cnt)))
                  // 100)::bigint as pr
          from nodes n left join c{_i} c using (node)
        )"""
    out["pagerank"] = (
        "with " + _pr_base + _pr_rounds
        + " select node, pr from r3 order by node"
    )
    out["degree_stats"] = """
        with e as (
            select doc_id % 97 as src, (doc_id*7+3) % 97 as dst
            from documents
            union all
            select doc_id % 97, (doc_id*13+5) % 97 from documents
        ),
        o as (select src as node, count(*)::bigint as d
              from e group by 1),
        i as (select dst as node, count(*)::bigint as d
              from e group by 1)
        select coalesce(o.node, i.node) as node,
               coalesce(o.d, 0)::bigint as out_degree,
               coalesce(i.d, 0)::bigint as in_degree
        from o full outer join i on o.node = i.node
        order by node
    """
    out["robots_filter"] = f"""
        with u as (
          select doc_id, lower(trim({_url_case})) as url from documents
        ), p as (
          select doc_id,
                 regexp_extract(url, '{_url_regex}', 2) as host,
                 case when regexp_extract(url, '{_url_regex}', 4) = ''
                      then '/'
                      else regexp_extract(url, '{_url_regex}', 4)
                 end as path
          from u
        )
        select doc_id, host
        from p
        where not (
          (host = 'www.src8.example.com' and path like '/p/%'
             and not regexp_matches(path, '^/p/1.*'))
          or host = 'src6.org'
        )
        order by doc_id
    """
    out["domain_caps"] = f"""
        with u as (
          select doc_id, lower(trim({_url_case})) as url from documents
        ), d as (
          select doc_id,
                 string_split(
                   regexp_extract(url, '{_url_regex}', 2), '.') as ls,
                 regexp_extract(url, '{_url_regex}', 2) as host
          from u
        ), dom as (
          select doc_id, {_domain_case} as domain from d
        ), rn as (
          select doc_id, domain,
                 row_number() over (
                   partition by domain
                   order by ('0x' || substr(md5(cast(doc_id as varchar)),
                                            1, 8))::bigint % 1000000,
                            doc_id) as rn
          from dom
        )
        select doc_id, domain from rn where rn <= 15
        order by domain, doc_id
    """
    # incremental minhash: stored band rows (docs < 200) probed by the
    # increment's band rows — the dedup_minhash_lsh band machinery on
    # both sides, increment-side hot-bucket cap only
    out["minhash_increment"] = r"""
        with corpus as (
          select doc_id, text from documents where doc_id < 200
        ), newd as (
          select doc_id + 1000 as doc_id, text || ' zq tail marker'
                   as text
          from documents where doc_id < 20
          union all
          select doc_id, text from documents
          where doc_id >= 200 and doc_id < 250
        ), all_docs as (
          select 0 as side, doc_id, text from corpus
          union all
          select 1 as side, doc_id, text from newd
        ), toks as (
          select side, doc_id,
                 list_filter(string_split(trim(regexp_replace(
                   lower(text), '\s+', ' ', 'g')), ' '),
                   t -> len(t) > 0) as tk
          from all_docs
        ), sh as (
          select side, doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        ), sigs as (
          select side, doc_id,
            [list_min(list_transform(shingles,
                s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from sh
        ), bands as (
          select side, doc_id, b as band_no,
                 md5(array_to_string(sig[2*b+1:2*b+2], '|')) as bucket
          from sigs, unnest([0,1,2,3]) as t(b)
        ), nb as (
          select doc_id, band_no, bucket from bands where side = 1
        ), nb_ok as (
          select * from nb where (band_no, bucket) in (
            select (band_no, bucket) from nb
            group by band_no, bucket having count(*) <= 200)
        )
        select distinct nb_ok.doc_id as new_id,
               b.doc_id as corpus_id
        from nb_ok join bands b
          on b.side = 0 and b.band_no = nb_ok.band_no
         and b.bucket = nb_ok.bucket
        order by new_id, corpus_id
    """
    # signed random projection: identical ±1 literals both sides (the
    # centroid/_query_vec pattern), list_dot_product's accumulation
    # order matches the Spark fold (proven by the green ann_cosine row)
    from lens_spark.operators.similarity import projection_signs

    _signs = projection_signs(64, 8)
    _proj_terms = ", ".join(
        "floor(list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(f"{float(s):.1f}" for s in row)
        + "]) * 10000.0 + 0.5)::bigint"
        for row in _signs
    )
    out["embedding_project"] = f"""
        select vec_id, [{_proj_terms}] as proj_q
        from embeddings order by vec_id
    """
    # upsampling mixture: the sample_mixture weight CTE uncapped, with
    # generate_series copy expansion — the identical IEEE op order as
    # the Spark side (round(w,6) * target / gs * 1e6, then floor)
    out["upsample_mixture"] = r"""
        with g as (
          select source,
                 sum(len(list_filter(
                     string_split_regex(text, '\s+'),
                     t -> len(t) > 0)))::bigint as group_size
          from documents group by source
        ), r as (
          select source,
                 floor((round(power(group_size::double, 0.5)
                    / sum(power(group_size::double, 0.5)) over (), 6)
                    * 60000.0 / group_size::double)
                   * 1000000.0)::bigint as rate_q
          from g
        ), n as (
          select d.doc_id, d.source, r.rate_q,
                 (r.rate_q // 1000000)
                 + case when ('0x' || substr(md5(cast(d.doc_id as
                       varchar)), 1, 8))::bigint % 1000000
                       < r.rate_q % 1000000 then 1 else 0 end as copies
          from documents d join r using(source)
        )
        select doc_id, source, unnest(generate_series(0, copies - 1))
                 as epoch, rate_q
        from n where copies >= 1
        order by doc_id, epoch
    """
    # exact-k per-group sample: k smallest (md5 bucket, id) per source
    out["stratified_sample"] = r"""
        with b as (
          select doc_id, source,
                 ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))
                   ::bigint % 1000000 as bkt
          from documents
        ), rn as (
          select doc_id, source,
                 row_number() over (partition by source
                                    order by bkt, doc_id) as rn
          from b
        )
        select doc_id, source from rn where rn <= 10
        order by source, doc_id
    """
    # full BPE train/apply vs the frozen single-process reference
    # (scripts/freeze_bpe_oracle.py — the extract_full pattern; the
    # merge loop's argmax-then-rewrite rounds are not expressible as
    # one SQL query, so the reference twin is the spec)
    out["bpe_learn"] = """
        select rank, "left", "right", freq
        from read_parquet(
          '/root/repo/tests/fixtures/bpe_merges_expected.parquet')
        order by rank
    """
    out["bpe_tokens"] = """
        select doc_id, n_tok, toks_md5
        from read_parquet(
          '/root/repo/tests/fixtures/bpe_tokens_expected.parquet')
        order by doc_id
    """
    # DSIR: hashed uni+bigram multinomial fits (target = src1-3, raw =
    # all docs, add-1 smoothing), per-bucket log-ratio quantized with
    # ONE ln over an exactly-representable integer rational (glibc libm
    # both sides — the Spark side computes it driver-side in Python),
    # per-doc weight = exact integer sum over n-gram occurrences
    _dsir_w = r"""
        with t as (
          select doc_id, source,
                 list_filter(string_split_regex(
                   replace(lower(text), 'ς', 'σ'), '\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        g as (
          select doc_id, source,
                 unnest(toks || list_transform(
                   list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                   s -> s[1] || ' ' || s[2])) as gram
          from t
        ),
        b as (
          select doc_id, source,
                 ('0x' || substr(md5(gram), 1, 8))::bigint % 512 as bkt
          from g
        ),
        tc as (select bkt, count(*) as c from b
               where source in ('src1','src2','src3') group by bkt),
        qc as (select bkt, count(*) as c from b group by bkt),
        tot as (
          select (select count(*) from b
                  where source in ('src1','src2','src3')) as tt,
                 (select count(*) from b) as qt
        ),
        lr as (
          select gs.bkt,
                 floor(1000000.0 * ln(
                   ((coalesce(tc.c, 0) + 1) * (tot.qt + 512))::double
                   / ((coalesce(qc.c, 0) + 1) * (tot.tt + 512))::double
                 ) + 0.5)::bigint as lrq
          from (select unnest(generate_series(0, 511)) as bkt) gs
          cross join tot
          left join tc on tc.bkt = gs.bkt
          left join qc on qc.bkt = gs.bkt
        ),
        w as (
          select b.doc_id, sum(lr.lrq)::bigint as logw_q
          from b join lr on lr.bkt = b.bkt
          group by b.doc_id
        ),
        wq as (
          select t.doc_id, coalesce(w.logw_q, 0) as logw_q
          from t left join w on w.doc_id = t.doc_id
        )
    """
    out["dsir_weights"] = (
        _dsir_w + "select doc_id, logw_q from wq order by doc_id"
    )
    # Gumbel top-k: key = logw_q + 100·floor(10000·(−ln(−ln(u))) + ½),
    # u = md5-uniform of ('dsir-v1', doc_id) — identical op order as
    # functions/dsir.gumbel_key
    out["dsir_sample"] = _dsir_w + r"""
        select doc_id, logw_q,
               (logw_q + 100 * floor(10000.0 * (-ln(-ln(
                  (('0x' || substr(md5('dsir-v1:' ||
                      cast(doc_id as varchar)), 1, 8))::bigint + 1)
                  / 4294967297.0
               ))) + 0.5)::bigint) as key_q
        from wq
        order by key_q desc, doc_id asc limit 100
    """
    out["classifier_quality"] = f"""
        with w as (select {_w} as arr),
        t as (
          select doc_id,
                 list_filter(string_split_regex(
                   replace(lower(text), 'ς', 'σ'), '\\s+'),
                             x -> len(x) > 0) as toks
          from documents
        ),
        tok as (select doc_id, unnest(toks) as tk from t),
        s as (
          select doc_id,
                 sum(w.arr[
                   (('0x' || substr(md5(tk), 1, 8))::bigint % 256) + 1
                 ])::bigint as sum_w,
                 count(*)::bigint as n_tok
          from tok, w group by doc_id
        )
        select t.doc_id,
               coalesce(s.sum_w, 0) as sum_w,
               coalesce(s.n_tok, 0) as n_tok,
               floor((1.0 / (1.0 + exp(-(
                 coalesce(s.sum_w, 0)
                 / (1000.0 * greatest(coalesce(s.n_tok, 0), 1))
               )))) * 10000.0)::bigint as prob_q
        from t left join s on t.doc_id = s.doc_id
        order by t.doc_id
    """
    # the COMPOSED curate() chain: c4 line cleaning → gopher (on the
    # cleaned text) → pii redaction → exact-keeper ranking (survivors
    # outrank dropped copies, then min doc_id) → minhash-LSH pairs over
    # surviving redacted text → recursive-CTE transitive closure →
    # neardup/kept conjunction. Each fragment is the already-green
    # per-stage oracle re-targeted at the upstream stage's output.
    out["curate_chain"] = f"""
        with recursive aug as (
          select doc_id,
                 replace(text, ' table ', '.' || chr(10) || 'table ')
                 || ' the end of this record is that we have it with'
                 || ' others and more of that to be sure of the case'
                 || ' and the rest of it all.'
                 || case when doc_id % 7 = 0
                         then chr(10) || 'Enable javascript today.'
                         else '' end
                 || case when doc_id % 11 = 0
                         then chr(10) || 'lorem ipsum dolor sit amet.'
                         else '' end
                 || case when doc_id % 13 = 0
                         then chr(10) || 'config = {{ }}'
                         else '' end as text
          from documents where doc_id < 150
        ), base as (
          select doc_id, text from aug
          union all
          select doc_id + 1000, text from aug where doc_id % 10 = 0
          union all
          select doc_id + 2000,
                 text || chr(10) || 'zq appendix tail marker sentence.'
          from aug where doc_id % 10 = 5
        ), K as (
          select doc_id, text,
                 list_filter(string_split(text, chr(10)), l ->
                   (right(trim(l), 1) in ('.', '!', '?', '"', ''''))
                   and len(list_filter(
                         string_split_regex(trim(l), '\\s+'),
                         t -> len(t) > 0)) >= 3
                   and not contains(lower(trim(l)), 'javascript')
                 ) as kept_lines
          from base
        ), c4 as (
          select doc_id,
                 coalesce(array_to_string(
                   list_transform(kept_lines, l -> trim(l)), chr(10)),
                   '') as clean_text,
                 (len(kept_lines) > 0
                  and not contains(lower(text), 'lorem ipsum')
                  and not contains(text, '{{'))::int as c4_keep
          from K
        ), g0 as (
          select doc_id,
                 clean_text,
                 list_filter(string_split_regex(clean_text, '\\s+'),
                             w -> len(w) > 0) as ws,
                 list_filter(string_split_regex(lower(clean_text),
                                                '\\s+'),
                             w -> len(w) > 0) as lws,
                 list_filter(string_split(clean_text, chr(10)),
                             ln -> len(trim(ln)) > 0) as glines
          from c4
        ), gm as (
          select doc_id,
                 len(ws) as n_words,
                 coalesce(list_sum(list_transform(ws, w -> len(w))), 0)
                   ::double / greatest(len(ws), 1) as mean_word_len,
                 ((length(clean_text)
                   - length(replace(clean_text, '#', '')))
                  + len(regexp_extract_all(clean_text, '\\.\\.\\.|…')))
                   / greatest(len(ws), 1)::double as symbol_ratio,
                 len(list_filter(ws,
                     w -> regexp_matches(w, '[A-Za-z]')))
                   / greatest(len(ws), 1)::double as alpha_word_frac,
                 len(list_filter(glines, ln ->
                     regexp_matches(trim(ln), '^([-*•])')))
                   / greatest(len(glines), 1)::double as bullet_frac,
                 len(list_filter(glines, ln ->
                     regexp_matches(trim(ln), '(\\.\\.\\.|…)$')))
                   / greatest(len(glines), 1)::double as ell_frac,
                 (list_contains(lws, 'the')::int
                  + list_contains(lws, 'be')::int
                  + list_contains(lws, 'to')::int
                  + list_contains(lws, 'of')::int
                  + list_contains(lws, 'and')::int
                  + list_contains(lws, 'that')::int
                  + list_contains(lws, 'have')::int
                  + list_contains(lws, 'with')::int) as stop_hits
          from g0
        ), gf as (
          select doc_id,
                 coalesce((n_words between 50 and 100000
                   and mean_word_len between 3.0 and 10.0
                   and symbol_ratio <= 0.1
                   and bullet_frac <= 0.9
                   and ell_frac <= 0.3
                   and alpha_word_frac >= 0.8
                   and stop_hits >= 2)::int, 0) as gopher_keep
          from gm
        ), pii as (
          select doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(clean_text,
                       '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{PII_IPV4_RE}', '<IP>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g') as redacted
          from c4
        ), flags as (
          select c4.doc_id, c4.c4_keep, gf.gopher_keep, pii.redacted
          from c4
          join gf on gf.doc_id = c4.doc_id
          join pii on pii.doc_id = c4.doc_id
        ), ek as (
          select *,
                 (row_number() over (
                    partition by md5(redacted)
                    order by (case when c4_keep = 1 and gopher_keep = 1
                              then 0 else 1 end), doc_id
                  ) = 1)::int as exact_keeper
          from flags
        ), toks as (
          select doc_id,
                 list_filter(string_split(trim(regexp_replace(
                   lower(redacted), '\\s+', ' ', 'g')), ' '),
                   t -> len(t) > 0) as tk
          from ek
          where c4_keep = 1 and gopher_keep = 1 and exact_keeper = 1
        ), sh as (
          select doc_id,
            case when len(tk) >= 3 then
              list_sort(list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, greatest(len(tk)-2, 1)+1)]))
            else [array_to_string(tk, ' ')] end as shingles
          from toks
        ), sigs as (
          select doc_id,
            [list_min(list_transform(shingles,
                                     s -> md5(concat(h, ':', s))))
             for h in ['0','1','2','3','4','5','6','7']] as sig
          from sh
        ), bands as (
          select doc_id, b as band_no,
                 md5(array_to_string(sig[2*b+1:2*b+2], '|')) as bucket
          from sigs, unnest([0,1,2,3]) as t(b)
        ), sized as (
          select * from bands
          where (band_no, bucket) in (
            select (band_no, bucket) from bands
            group by band_no, bucket having count(*) <= 200)
        ), prs as (
          select distinct a.doc_id as u, b.doc_id as v
          from sized a join sized b
            on a.band_no = b.band_no and a.bucket = b.bucket
           and a.doc_id < b.doc_id
        ), edges as (
          select u, v from prs union select v, u from prs
        ), reach as (
          select u, u as x from (select distinct u from edges)
          union
          select r.u, e.v as x from reach r join edges e on r.x = e.u
        ), lab as (
          select u as doc_id, min(x) as cluster_id from reach group by u
        )
        select ek.doc_id,
               ek.c4_keep,
               ek.gopher_keep,
               1::int as clf_keep,
               ek.exact_keeper,
               (case when lab.cluster_id is null
                      or lab.cluster_id = ek.doc_id
                then 1 else 0 end)::int as neardup_keep,
               (ek.c4_keep = 1 and ek.gopher_keep = 1
                and ek.exact_keeper = 1
                and (lab.cluster_id is null
                     or lab.cluster_id = ek.doc_id))::int as kept
        from ek left join lab on lab.doc_id = ek.doc_id
        order by ek.doc_id
    """
    return out
