"""Corpus n-gram language-model scoring (perplexity-proxy quality filter).

The CCNet / Gopher curation pattern: train a cheap LM on a trusted
corpus, score every candidate document by cross-entropy under it, and
filter the tail. Full KenLM is out of scope for a pure-Spark engine;
an add-one-smoothed word-bigram LM captures the same fluency signal
with exact, engine-portable arithmetic:

    P(w2 | w1) = (c(w1 w2) + 1) / (ctx(w1) + V)
    xent(doc)  = -mean over the doc's bigram occurrences of ln P

where c(.) counts bigram occurrences in the training corpus, ctx(w1)
counts occurrences of w1 as a bigram prefix, and V is the training
vocabulary size. Unseen bigrams and contexts fall back to the smoothed
floor 1 / V — the scorer works cross-corpus (train on curated, score
raw), which is the real pipeline shape.

Scale shape: training is two map-side-combinable hash aggregates over
one bigram explode (model size = vocabulary-squared upper bound,
MB-scale in practice — broadcast); scoring is one explode + broadcast
join + per-doc aggregate. Per-occurrence log terms are quantized to
decimal(18,9) before the per-doc sum so the mean is order-independent
(the same discipline as similarity.embedding_centroids); ln() itself
may differ by 1 ulp between JVM and C libm (same caveat documented at
tfidf.pmi_bigrams), which the 9-decimal quantization absorbs except at
exact half-way boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import tokenize, word_ngrams
from econdatapipeline_spark.sources.tables import fan_out


def _bigram_occurrences(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, g) — one row per adjacent word pair WITH multiplicity.
    Documents shorter than two tokens emit nothing (word_ngrams'
    whole-text collapse carries no space and is filtered out)."""
    return (
        fan_out(df)
        .select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("g"),
        )
        .filter(F.col("g").contains(" "))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the model -> (bigram counts, context counts, vocab size).

    Returns three DataFrames: (g, c2), (w1, c1), and a 1-row (vocab)
    aggregate — kept relational (no collect) so the model composes into
    scoring plans as broadcast joins.
    """
    bg = _bigram_occurrences(df, text_col, id_col)
    c2 = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.select(
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1")
    ).groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("vocab"))
    )
    return c2, c1, vocab


def lm_score(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM cross-entropy -> (id, n_bigrams, xent, ppl).

    ``model`` defaults to one trained on ``df`` itself (the standalone
    profile); pass ``train_bigram_lm(trusted_corpus)`` for the
    cross-corpus filter. Documents with fewer than two tokens score
    null xent/ppl with n_bigrams = 0.

    Broadcast policy: bigram *types* grow roughly with corpus tokens,
    so a self-trained model is NOT broadcast-hinted — AQE size-decides
    at runtime (and still picks broadcast when the model is small).
    The cross-corpus path (an explicitly passed ``model``, trained on a
    small trusted corpus per CCNet) keeps the hint. The 1-row vocab
    relation always broadcasts.
    """
    hint = F.broadcast if model is not None else (lambda d: d)
    if model is None:
        model = train_bigram_lm(df, text_col, id_col)
    c2, c1, vocab = model
    bg = _bigram_occurrences(df, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    )
    scored = (
        bg.join(hint(c2), "g", "left")
        .join(hint(c1), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vocab")).cast(
                    "double"
                )
            )
            .cast("decimal(18,9)")
            .alias("term"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            -(F.sum("term").cast("double")) / F.count(F.lit(1)), 6
        ).alias("xent"),
    )
    base = df.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("xent"),
        F.round(F.exp(F.col("xent")), 6).alias("ppl"),
    )


def dsir_log_ratio(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") -> (id, n_bigrams,
    log_ratio): per-document log importance weight

        log w(x) = log p_target(x) - log p_raw(x)
                 = sum over bigram occurrences of ln P_t(g) - ln P_r(g)

    under two add-one-smoothed bigram LMs — p_target fit on the trusted
    ``target`` corpus, p_raw fit on ``df`` itself. The weight is the
    SUM over the document's features exactly as published (so longer
    documents can carry larger magnitudes); callers wanting a
    length-free signal can divide by n_bigrams. Documents with fewer
    than two tokens get log_ratio = 0 (no evidence either way).

    Both models' per-occurrence log terms are decimal(18,9)-quantized
    before summation, so log_ratio is an exact decimal difference —
    summation-order-free, hash-certifiable, and safely usable as a
    deterministic ORDER BY key (dsir_select).

    Scale shape: ONE bigram explode of the raw corpus scored against
    both models in the same projection — the second model adds two
    joins, not a second scan. The target model broadcasts (trusted
    corpus = small); the raw model is corpus-sized, so its joins are
    left to AQE.
    """
    c2t, c1t, vt = train_bigram_lm(target, text_col, id_col)
    c2r, c1r, vr = train_bigram_lm(df, text_col, id_col)
    bg = _bigram_occurrences(df, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    )
    def term(c2col, c1col, vcol):
        return (
            F.log(
                (F.coalesce(F.col(c2col), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col(c1col), F.lit(0)) + F.col(vcol)).cast(
                    "double"
                )
            )
            .cast("decimal(18,9)")
        )
    scored = (
        bg.join(F.broadcast(c2t.withColumnRenamed("c2", "c2_t")), "g", "left")
        .join(
            F.broadcast(c1t.withColumnRenamed("c1", "c1_t")), "w1", "left"
        )
        .crossJoin(F.broadcast(vt.withColumnRenamed("vocab", "v_t")))
        # The RAW model is trained on ``df`` itself: bigram types grow
        # with corpus tokens, so no broadcast hint — AQE size-decides.
        # The target model stays hinted (trusted corpus = small).
        .join(c2r.withColumnRenamed("c2", "c2_r"), "g", "left")
        .join(c1r.withColumnRenamed("c1", "c1_r"), "w1", "left")
        .crossJoin(F.broadcast(vr.withColumnRenamed("vocab", "v_r")))
        .select(
            F.col(id_col),
            term("c2_t", "c1_t", "v_t").alias("t_t"),
            term("c2_r", "c1_r", "v_r").alias("t_r"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("t_t") - F.sum("t_r")).alias("log_ratio"),
    )
    base = df.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
            "n_bigrams"
        ),
        F.coalesce(
            F.col("log_ratio"), F.lit(0).cast("decimal(28,9)")
        ).alias("log_ratio"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-k DSIR selection: the k documents of ``df``
    whose importance weight under the trusted ``target`` corpus is
    largest -> (id, n_bigrams, log_ratio double).

    Selection orders by the EXACT decimal log_ratio (ties by id
    ascending), so the kept set is identical on every engine and
    cluster layout; the paper's Gumbel-resampling variant replaces the
    argmax with noisy keys — deliberately not used here because IEEE
    double Gumbel noise is not portably reproducible across engines.
    Plan: TakeOrderedAndProject (per-partition top-k + driver merge of
    k-sized heads), never a global sort.
    """
    w = dsir_log_ratio(df, target, text_col, id_col)
    return (
        w.orderBy(F.col("log_ratio").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("log_ratio").cast("double"), 6).alias("log_ratio"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    group_col: str = "lang",
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020): per
    ``group_col`` (language), rank documents by LM cross-entropy and
    split into ``n_buckets`` equal-count tiles -> one row per
    (group, bucket): n_docs, min/max/mean xent. Bucket 1 = head
    (most fluent), bucket n = tail; downstream mixtures keep the head
    and subsample the tail.

    ``model`` defaults to self-trained; pass train_bigram_lm(trusted)
    for the published shape (score raw crawl under a Wikipedia LM).
    Documents with undefined xent (< 2 tokens) are excluded — they
    carry no perplexity evidence.

    Determinism: ntile runs over the total order (xent, id) — xent is
    the decimal-quantized rounded score from lm_score, so tile
    boundaries are engine-portable; mean aggregates decimal(18,6)
    casts, not raw doubles, to stay summation-order-free.

    Scale: the ntile window shuffles once by group (languages are
    few but document counts are huge; the window sorts within each
    group — at extreme scale swap to quantile_rollup bins for the
    boundary estimate, same discipline as stats.quantile_rollup).
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    scored = lm_score(df, model, text_col, id_col).join(
        df.select(F.col(id_col), F.col(group_col)), id_col
    )
    ok = scored.filter(F.col("xent").isNotNull())
    w = Window.partitionBy(group_col).orderBy(
        F.col("xent").asc(), F.col(id_col).asc()
    )
    tiled = ok.withColumn("bucket", F.ntile(n_buckets).over(w))
    return tiled.groupBy(group_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("xent").alias("min_xent"),
        F.max("xent").alias("max_xent"),
        F.round(
            F.sum(F.col("xent").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_xent"),
    )


def loo_source_influence(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_mod: int = 10,
) -> DataFrame:
    """Per-source data valuation by leave-one-out LM ablation ->
    (source, n_probe_bigrams, xent_full, xent_loo, influence).

    The "which sources are worth their bytes" question (the
    influence/datamodels idea reduced to its cheapest useful form):
    hold out a probe set (every ``probe_mod``-th document), and for
    EVERY source s compare the probe's cross-entropy under the full
    training LM vs the LM trained without s. influence(s) =
    xent_loo(s) - xent_full: positive means removing s makes the
    probe less predictable — s carries distribution the probe needs;
    near zero means s is redundant with the rest.

    The trick that makes |sources| ablations affordable: add-one
    bigram LMs are COUNT TABLES, and count tables subtract. Train
    once, grouped by source —

        c2_loo(s) = c2_total - c2_s        (bigram counts)
        c1_loo(s) = c1_total - c1_s        (context counts)
        V_loo(s)  = #{w : total(w) > c_s(w)}  (surviving vocab)

    — so the s-th ablated model is pure algebra on the grouped
    aggregates, never a retrain. Probe scoring joins each probe
    bigram occurrence against the per-source deltas: cost is
    O(probe bigrams x sources). Only the SOURCES relation (one row
    per source, by construction tiny) is broadcast; the count tables
    (c2/c1 totals and per-source) are token-TYPE-sized — they grow
    ~O(corpus tokens) and must shuffle-join by their gram key, never
    be forced into executor memory (the lm_score rule: AQE still
    broadcasts them when the corpus is actually small). All log terms
    are decimal(18,9)-quantized (the lm.py discipline) so the whole
    influence table is engine-portable.

    Probe documents are excluded from ALL training (full and LOO) —
    scoring your own training text measures memorization, not
    transfer.

    Sign caveat: when a source exclusively owns a large vocabulary
    slice, ablating it also shrinks the add-one smoothing floor
    (1 / (ctx + V_loo) grows as V_loo falls), which can push xent_loo
    BELOW xent_full even though counts were lost — the standard
    smoothed-LM artifact. Influence ranks are meaningful when sources
    share vocabulary broadly (the real-corpus case); a strongly
    negative influence on a vocabulary-exclusive source is the
    smoothing floor talking, not evidence the source hurts.
    """
    if probe_mod < 2:
        raise ValueError(f"probe_mod must be >= 2, got {probe_mod}")
    probe = df.filter(F.col(id_col) % probe_mod == 0)
    train = df.filter(F.col(id_col) % probe_mod != 0)

    # ONE tokenize+explode pass for the bigram tables: src rides the
    # explode (no id-join back to train), the (g, src) aggregate is
    # pinned once, and every other count table is COUNT ALGEBRA on it —
    # c2_tot / c1_src / c1_tot are exact long sums over the per-source
    # counts, so values are identical to independent re-aggregations
    # while the corpus is scanned once instead of four times. Same for
    # the unigram tables: one tokenize pass, wc_t = sum over src.
    bg_t = (
        fan_out(train)
        .select(
            F.col(source_col).alias("src"),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("g"),
        )
        .filter(F.col("g").contains(" "))
    )
    c2_src = (
        bg_t.groupBy("g", "src")
        .agg(F.count(F.lit(1)).alias("c2_s"))
        .localCheckpoint(eager=True)
    )
    c2_tot = c2_src.groupBy("g").agg(F.sum("c2_s").alias("c2_t"))
    w1 = F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    c1_src = (
        c2_src.select(w1.alias("w1"), "src", "c2_s")
        .groupBy("w1", "src")
        .agg(F.sum("c2_s").alias("c1_s"))
    )
    c1_tot = c1_src.groupBy("w1").agg(F.sum("c1_s").alias("c1_t"))
    wc_s = (
        fan_out(train)
        .select(
            F.col(source_col).alias("src"),
            F.explode(tokenize(F.col(text_col))).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("w", "src")
        .agg(F.count(F.lit(1)).alias("wc_s"))
        .localCheckpoint(eager=True)
    )
    wc_t = wc_s.groupBy("w").agg(F.sum("wc_s").alias("wc_t"))
    vocab_full = wc_t.agg(F.count(F.lit(1)).alias("v_full"))
    # V_loo(s): distinct words whose count does not collapse to zero
    # when s is removed — one join of the per-source counts against
    # the totals, grouped by source.
    vocab_loo = (
        wc_s.join(wc_t, "w")
        .groupBy("src")
        .agg(
            F.sum(F.when(F.col("wc_t") > F.col("wc_s"), 0).otherwise(1)).alias(
                "lost"
            )
        )
        .crossJoin(F.broadcast(vocab_full))
        .select("src", (F.col("v_full") - F.col("lost")).alias("v_loo"))
    )
    sources = train.select(
        F.col(source_col).alias("src")
    ).distinct().join(vocab_loo, "src", "left").crossJoin(
        F.broadcast(vocab_full)
    ).select(
        "src", F.coalesce(F.col("v_loo"), F.col("v_full")).alias("v_loo"),
        "v_full",
    ).localCheckpoint(eager=True)

    bg_p = _bigram_occurrences(probe, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    )
    # totals join BEFORE the x|sources| fan-out: c2_t/c1_t are keyed by
    # g/w1 alone, so left-joining them on the probe-sized relation and
    # THEN cross-joining sources produces identical rows while the two
    # total joins process |sources|x fewer rows (guide: prune before
    # the exploding join, not after).
    scored = (
        bg_p.join(c2_tot, "g", "left")
        .join(c1_tot, "w1", "left")
        .crossJoin(F.broadcast(sources))
        .join(c2_src, ["g", "src"], "left")
        .join(c1_src, ["w1", "src"], "left")
        .select(
            "src",
            F.log(
                (F.coalesce(F.col("c2_t"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1_t"), F.lit(0)) + F.col("v_full")).cast(
                    "double"
                )
            )
            .cast("decimal(18,9)")
            .alias("t_full"),
            F.log(
                (
                    F.coalesce(F.col("c2_t"), F.lit(0))
                    - F.coalesce(F.col("c2_s"), F.lit(0))
                    + F.lit(1.0)
                )
                / (
                    F.coalesce(F.col("c1_t"), F.lit(0))
                    - F.coalesce(F.col("c1_s"), F.lit(0))
                    + F.col("v_loo")
                ).cast("double")
            )
            .cast("decimal(18,9)")
            .alias("t_loo"),
        )
    )
    return scored.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_bigrams"),
        F.round(
            -(F.sum("t_full").cast("double")) / F.count(F.lit(1)), 6
        ).alias("xent_full"),
        F.round(
            -(F.sum("t_loo").cast("double")) / F.count(F.lit(1)), 6
        ).alias("xent_loo"),
        F.round(
            (
                -(F.sum("t_loo").cast("double")) / F.count(F.lit(1))
            )
            - (
                -(F.sum("t_full").cast("double")) / F.count(F.lit(1))
            ),
            6,
        ).alias("influence"),
    ).withColumnRenamed("src", source_col)


def oov_rate(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Out-of-vocabulary rate per scored document against a vocabulary
    fit on ``train`` -> (id, n_tokens, n_oov, oov_rate).

    The tokenizer-coverage audit every corpus swap needs: before
    pointing a fixed-vocab model (or a KenLM filter, or dsir's bigram
    profile) at a new crawl, measure how much of it the vocabulary has
    never seen. ``min_count`` prunes hapax noise from the vocabulary
    (the standard <unk> threshold).

    Scale shape: the vocabulary is a token-TYPE-sized relation built by
    one map-side-combinable hash aggregate; scoring is one explode +
    hash join on the token key + per-doc aggregate. The join is NOT
    force-broadcast — token types grow ~O(corpus tokens) in web text
    (the lm_score round-4 lesson), so AQE size-decides; at any scale
    the join keys by token, never by document, so hot documents cannot
    skew it (hot *tokens* are exactly what the vocabulary join wants
    co-located).

    oov_rate = n_oov / n_tokens is a ratio of exact int64 counts,
    rounded to 6 — engine-portable with no float-sum caveats.
    """
    tr = (
        fan_out(train)
        .select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    vocab = (
        tr.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("token")
    )
    sc = (
        fan_out(score)
        .select(
            F.col(id_col),
            F.explode(tokenize(F.col(text_col))).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    marked = sc.join(
        vocab.withColumn("__in_vocab", F.lit(1)), "token", "left"
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_rate"),
    )


def chao1_vocab(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Chao1 vocabulary-richness estimate + Good-Turing coverage ->
    one row (group?, n_tokens, vocab, f1, f2, chao1, coverage) —
    one global row, or one per ``group_col`` (per-SOURCE coverage is
    the curation question: which crawl slice is under-sampled?).

    The "how much vocabulary HAVEN'T we seen" readout for a corpus
    sample (Chao 1984; Good 1953) — the principled answer to "is this
    crawl slice big enough to fix the tokenizer vocabulary?":

        chao1    = V + F1*(F1-1) / (2*(F2+1))   (bias-corrected form,
                                                 defined when F2 = 0)
        coverage = 1 - F1/N                     (Good-Turing: the
                                                 probability mass of
                                                 UNSEEN types)

    where V = distinct tokens, F1/F2 = singleton/doubleton type counts,
    N = total occurrences. A coverage of 0.98 says 2% of future token
    mass will be types never seen in this sample.

    Relational shape: one explode + one groupBy(token) collapse to the
    type relation, then ONE hash aggregate over it — nothing scales
    past the type count, and every input to the two formulas is an
    exact integer (the ratios are deterministic doubles, rounded 6).
    """
    gcols = [group_col] if group_col else []
    types = (
        df.select(*gcols, F.explode(tokenize(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy(*gcols, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f1 = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
    f2 = F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
    return types.groupBy(*gcols).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        f1.alias("f1"),
        f2.alias("f2"),
    ).select(
        *gcols,
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        F.round(
            F.col("vocab").cast("double")
            + F.col("f1").cast("double")
            * (F.col("f1").cast("double") - 1.0)
            / (2.0 * (F.col("f2").cast("double") + 1.0)),
            6,
        ).alias("chao1"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.lit(1.0)
                - F.col("f1").cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("coverage"),
    )
