"""End-to-end training-data curation over a documents table.

Chains the individually-verified operators into the standard pre-training
data flow (C4 §2.2 / Gopher App. A / RefinedWeb-style):

    c4 line cleaning → gopher quality rules [→ classifier quality]
    [→ lexicon screen (lexicon_words=/lexicon_phrases=, the C4
    LDNOOBW-style stage)]
    [→ LM perplexity filter (lm_ppl_max=, the CCNet stage)]
    [→ test-set decontamination (benchmark=)]
    [→ fuzzy MinHash decontamination (fuzzy_benchmark=)] → pii redaction
    → exact dedup → minhash-LSH near-dup clustering (keep cluster min)
    [→ SemDeDup semantic dedup (semantic_tau= + embeddings=)]
    → language id + quality annotation
    [→ ExactSubstr substring deletion (exactsubstr_k)]
    [→ chunk_documents / pack_sequences downstream]

Design rule: **annotate, don't drop.** Every stage adds columns
(``c4``, ``gopher_keep``, ``clf_keep``, ``lm_keep``, ``decontam_keep``,
``fuzzy_keep``, ``pii``, ``exact_keeper``, ``neardup_keep``)
and the final ``kept`` flag conjoins them; ``curated`` is the filtered
view. This keeps the whole chain ONE logical plan (Catalyst sees through
it: single scan, the dedup shuffles are the only wide stages), makes
every drop observable (``curation_report`` aggregates the flags in one
extra pass instead of one action per stage), and lets a caller audit
*why* any document died — the no-silent-drops convention, at pipeline
granularity.

Scale shape: c4/gopher/pii/lang/quality are map-only Catalyst; exact
dedup shuffles once on the md5 digest; the near-dup leg is the bucketed
join-free minhash + O(log²) star-contraction clustering, and its label
side (pair-participating docs only) broadcasts back. Nothing here is
O(n²) and nothing collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from lens_spark.functions.text import (
    c4_clean,
    gopher_quality_flags,
    lang_id,
    pii_redact,
    quality_score,
)
from lens_spark.operators.cluster import connected_components
from lens_spark.operators.dedup import minhash_lsh_pairs


@dataclass
class CurateResult:
    annotated: DataFrame  # every input doc + per-stage flags
    curated: DataFrame    # kept docs with redacted text + annotations


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    c4_min_words: int = 3,
    minhash_hashes: int = 16,
    minhash_bands: int = 4,
    minhash_hash_fn: str = "xxhash64",
    exactsubstr_k: int | None = None,
    classifier_min: float | None = None,
    classifier_dim: int = 256,
    classifier_weights: list[int] | None = None,
    lexicon_words: list[str] | None = None,
    lexicon_phrases: list[str] | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_max_gram_df: int | None = None,
    fuzzy_benchmark: DataFrame | None = None,
    fuzzy_threshold: float = 0.5,
    fuzzy_hashes: int = 8,
    fuzzy_bands: int = 4,
    fuzzy_hash_fn: str = "xxhash64",
    lm_ppl_max: float | None = None,
    lm_train: DataFrame | None = None,
    lm_add_k: float = 0.1,
    lm_min_count: int = 1,
    embeddings: DataFrame | None = None,
    semantic_tau: float | None = None,
    semantic_vec_col: str = "embedding",
    semantic_k: int = 64,
    semantic_iters: int = 2,
    semantic_max_cluster: int = 2000,
) -> CurateResult:
    """See module docstring. ``exactsubstr_k`` (off by default) appends
    the substring-level stage: every duplicated ≥ k-token window among
    the KEPT documents is deleted from all but its first occurrence
    (``remove_duplicate_spans(keep_first=True)`` — Lee et al. 2022
    ExactSubstr), after doc-level dedup has already removed whole-doc
    copies. The curated output then carries ``n_removed_tokens``; the
    kept/annotated flags are unchanged (this stage edits text, it never
    drops documents). The curated plan is pinned with a lazy
    ``localCheckpoint`` first so the span-detection side and the rebuild
    side share ONE evaluation of the upstream chain (the jaccard /
    connected-components sharing pattern, with the same non-reliable-
    storage trade documented there).

    ``classifier_min`` (off by default) inserts the model-based quality
    stage after the Gopher rules: ``clf_keep`` = sigmoid score of the
    hashed linear classifier (functions/classifier.py) over the cleaned
    text ≥ threshold. Pass ``classifier_weights`` (a trained,
    WEIGHT_SCALE-quantized vector — see ``load_fasttext_weights``) for a
    real model; the default md5-derived stand-in keeps the execution
    shape. Map-only Catalyst — adds no shuffle to the chain.

    ``lexicon_words`` / ``lexicon_phrases`` (off by default) insert the
    C4 lexicon screen after the Gopher rules: ``lex_keep`` = 0 when the
    cleaned text contains a blocklist token (whole-token match) or
    phrase (substring) — functions/text.py lexicon_flags; the list is
    caller policy (C4 uses the public LDNOOBW list). Map-only, adds no
    shuffle.

    ``benchmark`` (off by default) inserts test-set decontamination
    after the quality stages: ``decontam_keep`` = 0 for any doc whose
    CLEANED text shares a ``decontam_n``-gram with the benchmark frame
    (which must carry the same ``id_col``/``text_col`` columns — GPT-3
    App. C hygiene; operators/decontam.py). The hit table is small
    (contamination is rare) so its join-back is AQE-broadcast; the
    gram-mining side re-derives the cleaned text from the input scan —
    at 100 TB, checkpoint the cleaned projection first if the second
    scan matters. ``decontam_max_gram_df`` caps eval-set boilerplate
    grams (metered; see contamination_hits).

    ``fuzzy_benchmark`` (off by default) inserts MINHASH fuzzy
    decontamination after the exact stage: ``fuzzy_keep`` = 0 for any
    doc whose cleaned text's MinHash signature agrees with some
    benchmark doc's on ≥ ``fuzzy_threshold`` of ``fuzzy_hashes``
    components (operators/decontam.minhash_contamination_hits — catches
    lightly paraphrased eval copies that slip exact n-gram overlap).
    The benchmark band table broadcasts (genuinely tiny); the
    flagged-docs join-back is AQE-decided like the exact stage's.
    ``fuzzy_hash_fn`` defaults to xxhash64 for production speed; pass
    "md5" for cross-engine oracle parity.

    ``lm_ppl_max`` (off by default) inserts the CCNet perplexity stage
    (Wenzek et al. 2020) after the classifier: ``lm_keep`` = bigram-LM
    perplexity of the cleaned text ≤ threshold. The model trains on
    ``lm_train`` if given (CCNet's setup: a clean reference corpus —
    lower perplexity = more reference-like) else on the input corpus
    itself. Unscorable docs (< 2 tokens / null text) get lm_keep = 0 —
    explicitly dropped at this stage, not silently lost. Cost when
    enabled: the two vocab-sized count aggregations plus a per-doc
    score join-back (shuffle on ``id_col``) — the one optional stage
    that is not map-only, documented accordingly; like decontam, it
    re-derives cleaned text from the input scan.

    ``semantic_tau`` + ``embeddings`` (off by default) append the
    SemDeDup stage (Abbas et al. 2023; operators/semdedup.py) after
    minhash near-dup clustering: ``semantic_keep`` = 0 for any
    so-far-surviving doc whose embedding is ε-close (cos ≥ tau) to a
    smaller-id survivor in the same k-means cluster. ``embeddings``
    must carry ``id_col`` plus ``semantic_vec_col``; docs WITHOUT an
    embedding row are semantic_keep = 1 (unjudgeable, never silently
    dropped — the no-silent-drops convention). Runs on SURVIVORS only
    (the minhash-stage precedent: pairs among dropped docs are wasted
    work); cost when enabled = the iterative k-means scans over the
    survivor embedding set + the capped within-cluster O(c²) pass —
    size ``semantic_k`` so clusters stay under
    ``semantic_max_cluster``."""
    # Stage flags are COALESCED to 0: c4_clean(NULL) yields NULL flags,
    # and a NULL flag would put a null-text doc in NO report bucket
    # (neither dropped_* nor kept — sums skip NULLs), silently violating
    # the no-silent-drops invariant (ADVICE r4). NULL text = dropped at
    # the first stage, counted in dropped_c4.
    base = docs.withColumn("c4", c4_clean(F.col(text_col), c4_min_words))
    base = base.withColumn(
        "c4_keep",
        F.coalesce(
            (
                (F.col("c4.n_kept") > 0)
                & (F.col("c4.has_lorem") == 0)
                & (F.col("c4.has_brace") == 0)
            ).cast("int"),
            F.lit(0),
        ),
    )
    base = base.withColumn(
        "gopher_keep",
        F.coalesce(
            gopher_quality_flags(F.col("c4.clean_text"))["keep"]
            .cast("int"),
            F.lit(0),
        ),
    )
    if classifier_min is not None:
        from lens_spark.functions.classifier import classifier_score

        base = base.withColumn(
            "clf_keep",
            F.coalesce(
                (
                    classifier_score(
                        F.col("c4.clean_text"), dim=classifier_dim,
                        weights=classifier_weights,
                    ) >= classifier_min
                ).cast("int"),
                F.lit(0),
            ),
        )
    else:
        base = base.withColumn("clf_keep", F.lit(1))
    if lexicon_words or lexicon_phrases:
        from lens_spark.functions.text import lexicon_flags

        base = base.withColumn(
            "lex_keep",
            F.coalesce(
                lexicon_flags(
                    F.col("c4.clean_text"),
                    words=lexicon_words,
                    phrases=lexicon_phrases,
                )["keep"].cast("int"),
                F.lit(0),
            ),
        )
    else:
        base = base.withColumn("lex_keep", F.lit(1))
    if lm_ppl_max is not None:
        from lens_spark.operators.lm import bigram_lm_scores

        scores = bigram_lm_scores(
            base.select(
                F.col(id_col), F.col("c4.clean_text").alias(text_col)
            ),
            id_col,
            text_col,
            add_k=lm_add_k,
            train=(
                lm_train.select(F.col(text_col))
                if lm_train is not None else None
            ),
            min_count=lm_min_count,
        ).select(id_col, "perplexity")
        base = (
            base.join(scores, on=id_col, how="left")
            .withColumn(
                "lm_keep",
                F.coalesce(
                    (F.col("perplexity") <= lm_ppl_max).cast("int"),
                    F.lit(0),
                ),
            )
            .drop("perplexity")
        )
    else:
        base = base.withColumn("lm_keep", F.lit(1))
    if benchmark is not None:
        from lens_spark.operators.decontam import contamination_hits

        hits = contamination_hits(
            base.select(
                F.col(id_col),
                F.col("c4.clean_text").alias(text_col),
            ),
            benchmark,
            id_col,
            text_col,
            n=decontam_n,
            max_gram_df=decontam_max_gram_df,
        )
        # hit table = contaminated docs only (small); AQE broadcasts it
        base = (
            base.join(hits, on=id_col, how="left")
            .withColumn(
                "decontam_keep",
                F.when(F.col("n_hits").isNull(), 1).otherwise(0),
            )
            .drop("n_hits")
        )
    else:
        base = base.withColumn("decontam_keep", F.lit(1))
    if fuzzy_benchmark is not None:
        from lens_spark.operators.decontam import (
            minhash_contamination_hits,
        )

        fhits = minhash_contamination_hits(
            base.select(
                F.col(id_col),
                F.col("c4.clean_text").alias(text_col),
            ),
            fuzzy_benchmark,
            id_col,
            text_col,
            num_hashes=fuzzy_hashes,
            bands=fuzzy_bands,
            threshold=fuzzy_threshold,
            hash_fn=fuzzy_hash_fn,
        ).select(id_col, F.col("n_agree").alias("__fz_agree"))
        # flagged-docs-only table (small when contamination is rare);
        # join-back AQE-decided, same rule as the exact decontam stage
        base = (
            base.join(fhits, on=id_col, how="left")
            .withColumn(
                "fuzzy_keep",
                F.when(F.col("__fz_agree").isNull(), 1).otherwise(0),
            )
            .drop("__fz_agree")
        )
    else:
        base = base.withColumn("fuzzy_keep", F.lit(1))
    base = base.withColumn("pii", pii_redact(F.col("c4.clean_text")))

    # exact dedup: rank within identical redacted-text digests. Docs
    # surviving the earlier stages outrank dropped ones (then smallest
    # id) — otherwise a c4/gopher-dropped copy could win the keeper
    # slot and its surviving twin would die as "exact dup", losing the
    # content entirely. One shuffle on the 16-byte digest.
    digest = F.md5(F.col("pii.redacted"))
    early_surv = (
        (F.col("c4_keep") == 1)
        & (F.col("gopher_keep") == 1)
        & (F.col("clf_keep") == 1)
        & (F.col("lex_keep") == 1)
        & (F.col("lm_keep") == 1)
        & (F.col("decontam_keep") == 1)
        & (F.col("fuzzy_keep") == 1)
    )
    w = Window.partitionBy(digest).orderBy(
        F.when(early_surv, 0).otherwise(1), F.col(id_col)
    )
    base = base.withColumn(
        "exact_keeper", (F.row_number().over(w) == 1).cast("int")
    )

    # near-dup clustering over the redacted text of surviving docs only
    # (pairs among already-dropped docs are wasted work)
    survivors = base.filter(
        (F.col("c4_keep") == 1)
        & (F.col("gopher_keep") == 1)
        & (F.col("clf_keep") == 1)
        & (F.col("lex_keep") == 1)
        & (F.col("lm_keep") == 1)
        & (F.col("decontam_keep") == 1)
        & (F.col("fuzzy_keep") == 1)
        & (F.col("exact_keeper") == 1)
    )
    pairs = minhash_lsh_pairs(
        survivors.select(
            F.col(id_col), F.col("pii.redacted").alias("__text")
        ),
        id_col,
        "__text",
        num_hashes=minhash_hashes,
        bands=minhash_bands,
        # xxhash64 for production speed; the chain-level driver oracle
        # passes "md5" so DuckDB computes bit-identical buckets
        hash_fn=minhash_hash_fn,
    )
    labels = connected_components(pairs).withColumnRenamed(
        "node", id_col
    )
    # label join-back: NO forced broadcast — on a near-dup-heavy corpus
    # (this pipeline's target case) the pair-participating doc set can
    # exceed the broadcast limit; AQE picks broadcast from runtime size
    # when it fits, same as dedup_keep in cluster.py (ADVICE r4)
    annotated = base.join(labels, on=id_col, how="left")
    annotated = annotated.withColumn(
        "neardup_keep",
        (
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col(id_col))
        ).cast("int"),
    )
    if semantic_tau is not None and embeddings is not None:
        from lens_spark.operators.semdedup import semdedup

        surv_ids = annotated.filter(
            early_surv
            & (F.col("exact_keeper") == 1)
            & (F.col("neardup_keep") == 1)
        ).select(id_col)
        sem_flags = semdedup(
            embeddings.join(surv_ids, on=id_col, how="inner"),
            id_col,
            semantic_vec_col,
            k=semantic_k,
            iters=semantic_iters,
            tau=semantic_tau,
            max_cluster=semantic_max_cluster,
        ).select(id_col, F.col("kept").alias("__sem_kept"))
        annotated = (
            annotated.join(sem_flags, on=id_col, how="left")
            .withColumn(
                "semantic_keep",
                F.coalesce(F.col("__sem_kept"), F.lit(1)).cast("int"),
            )
            .drop("__sem_kept")
        )
    else:
        annotated = annotated.withColumn("semantic_keep", F.lit(1))
    annotated = annotated.withColumn(
        "kept",
        (
            (F.col("c4_keep") == 1)
            & (F.col("gopher_keep") == 1)
            & (F.col("clf_keep") == 1)
            & (F.col("lex_keep") == 1)
            & (F.col("lm_keep") == 1)
            & (F.col("decontam_keep") == 1)
            & (F.col("fuzzy_keep") == 1)
            & (F.col("exact_keeper") == 1)
            & (F.col("neardup_keep") == 1)
            & (F.col("semantic_keep") == 1)
        ).cast("int"),
    )
    curated = (
        annotated.filter(F.col("kept") == 1)
        .withColumn("lang", lang_id(F.col("pii.redacted")))
        .withColumn("quality", quality_score(F.col("pii.redacted")))
        .select(
            id_col,
            F.col("pii.redacted").alias(text_col),
            "lang",
            "quality",
            F.col("pii.n_email").alias("n_email"),
            F.col("pii.n_ip").alias("n_ip"),
            F.col("pii.n_phone").alias("n_phone"),
        )
    )
    if exactsubstr_k is not None:
        from lens_spark.operators.dedup import remove_duplicate_spans

        curated = remove_duplicate_spans(
            curated.localCheckpoint(eager=False),
            id_col,
            text_col,
            k=exactsubstr_k,
            keep_first=True,
        )
    return CurateResult(annotated=annotated, curated=curated)


def curation_report(annotated: DataFrame) -> dict:
    """Stage-attrition accounting in ONE aggregation pass.

    Flags are conjunctive in pipeline order, so each stage's "killed
    here" count conditions on surviving all earlier stages."""
    c4 = F.col("c4_keep") == 1
    go = F.col("gopher_keep") == 1
    # tolerate annotated frames from before a stage existed / with the
    # stage off (off == all 1s)
    cl = (F.col("clf_keep") == 1) if "clf_keep" in annotated.columns \
        else F.lit(True)
    lx = (F.col("lex_keep") == 1) if "lex_keep" in annotated.columns \
        else F.lit(True)
    lm = (F.col("lm_keep") == 1) if "lm_keep" in annotated.columns \
        else F.lit(True)
    dc = (F.col("decontam_keep") == 1) \
        if "decontam_keep" in annotated.columns else F.lit(True)
    fz = (F.col("fuzzy_keep") == 1) \
        if "fuzzy_keep" in annotated.columns else F.lit(True)
    se = (F.col("semantic_keep") == 1) \
        if "semantic_keep" in annotated.columns else F.lit(True)
    ex = F.col("exact_keeper") == 1
    row = annotated.agg(
        F.count("*").alias("input_docs"),
        F.sum((~c4).cast("long")).alias("dropped_c4"),
        F.sum((c4 & ~go).cast("long")).alias("dropped_gopher"),
        F.sum((c4 & go & ~cl).cast("long")).alias("dropped_classifier"),
        F.sum((c4 & go & cl & ~lx).cast("long")).alias(
            "dropped_lexicon"
        ),
        F.sum((c4 & go & cl & lx & ~lm).cast("long")).alias(
            "dropped_lm"
        ),
        F.sum((c4 & go & cl & lx & lm & ~dc).cast("long")).alias(
            "dropped_decontam"
        ),
        F.sum((c4 & go & cl & lx & lm & dc & ~fz).cast("long")).alias(
            "dropped_fuzzy_decontam"
        ),
        F.sum(
            (c4 & go & cl & lx & lm & dc & fz & ~ex).cast("long")
        ).alias("dropped_exact_dup"),
        F.sum(
            (c4 & go & cl & lx & lm & dc & fz
             & ex & (F.col("neardup_keep") == 0))
            .cast("long")
        ).alias("dropped_near_dup"),
        F.sum(
            (c4 & go & cl & lx & lm & dc & fz
             & ex & (F.col("neardup_keep") == 1) & ~se)
            .cast("long")
        ).alias("dropped_semantic"),
        F.sum(F.col("kept").cast("long")).alias("kept_docs"),
        # redaction volumes count what actually reached the curated
        # output — sums over dropped docs would overstate the scrub
        F.sum(F.col("pii.n_email") * F.col("kept")).alias(
            "emails_redacted"
        ),
        F.sum(F.col("pii.n_ip") * F.col("kept")).alias("ips_redacted"),
        F.sum(F.col("pii.n_phone") * F.col("kept")).alias(
            "phones_redacted"
        ),
    ).first()
    return {k: (0 if row[k] is None else int(row[k]))
            for k in row.asDict()}
