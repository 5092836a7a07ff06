"""TF-IDF term weighting over a document corpus.

The classic corpus-analysis operator the reference's world never needed
(SURVEY §2.4: zero aggregations) but any text pipeline at scale does:
per-(doc, term) weights for keyword extraction, near-dup triage, and
quality filters.

Shuffle shape: one explode -> groupBy (doc_id, token) for TF, one
groupBy token for DF (map-side partials carry one row per distinct
token per partition), and the corpus size N joins in as a broadcast
1-row aggregate — no window over the full corpus, no driver-side
count() baked into the plan as a literal (the plan stays valid when the
input grows). The per-doc top-k uses a row_number window partitioned by
doc_id, which shuffles one row per (doc, distinct term) — already the
smallest thing that can rank terms.

IDF uses the smoothed form ln((N + 1) / (df + 1)) + 1 (scikit-learn's
smooth_idf) so unseen/ubiquitous terms stay finite and positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import tokenize


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, token, tf, df, n_docs, tfidf) for every term occurrence
    set. The corpus size rides along as a column so downstream caps
    (e.g. tfidf_cosine_pairs' document-frequency ratio) never re-scan
    the corpus for an aggregate this pass already computed."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    n = df.select(F.countDistinct(id_col).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "token",
            "tf",
            "df",
            "n_docs",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def top_terms_per_doc(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Deterministic rank: tfidf desc, token asc (ties broken
    lexicographically so reruns and the oracle agree row-for-row).
    """
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        tfidf_terms(df, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "tfidf")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query by Okapi BM25.

    score(d) = sum over query terms t of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * |d|/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) (the standard
    non-negative Okapi form).

    Plan shape: the token explode is filtered to the query terms
    *before* any aggregation — at 100 TB the scan emits only matching
    postings (the predicate pushes into the explode's generator stage),
    so the TF aggregation shuffles rows proportional to query-term
    frequency, not corpus size. Corpus stats (N, avgdl) and per-term
    document frequencies ride along as broadcast aggregates. Output is
    a TakeOrdered top-k, never a global sort.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("dl"),
        F.explode(tokenize(F.col(text_col))).alias("token"),
    )
    matches = toks.filter(F.col("token").isin(terms))
    tf = matches.groupBy(id_col, "token").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = matches.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    stats = df.select(
        F.countDistinct(id_col).alias("n_docs"),
        F.avg(F.size(tokenize(F.col(text_col)))).alias("avgdl"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / norm
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"), F.count("*").alias("n_terms_hit"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    min_pmi: float = 0.1,
) -> DataFrame:
    """Corpus collocations: pointwise mutual information of adjacent
    word pairs -> (w1, w2, c_xy, pmi).

    PMI(x,y) = ln( (c_xy / N_bigram) / ((c_x / N_token) * (c_y / N_token)) )
    computed from exact corpus counts: one explode of word bigrams and
    one of tokens, each a map-side-combinable groupBy; the two corpus
    totals join in as broadcast 1-row aggregates and the unigram table
    broadcasts (a vocabulary is MBs even for a 100 TB corpus).

    Membership is threshold-based (count >= min_count AND rounded
    pmi >= min_pmi), never top-k: a rank cut on an unrounded float is
    where two engines disagree by one ulp and return different row
    sets. Thresholding the floor-rounded value shrinks (but cannot
    fully eliminate) that risk: ln() itself may differ by 1 ulp
    between JVM Math.log and C libm, which could still flip the
    rounding at an exact boundary.
    """
    from econdatapipeline_spark.functions.text import word_ngrams
    from econdatapipeline_spark.sources.tables import fan_out

    txt = F.col(text_col)
    toks = (
        fan_out(df)
        .select(F.explode(tokenize(txt)).alias("w"))
        .filter(F.col("w") != "")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    n_uni = uni.agg(F.sum("c_w").alias("n_uni"))
    bigrams = (
        fan_out(df)
        .select(F.explode(word_ngrams(txt, 2)).alias("g"))
        .filter(F.col("g").contains(" "))
    )
    bc_all = bigrams.groupBy("g").agg(F.count(F.lit(1)).alias("c_xy"))
    n_big = bc_all.agg(F.sum("c_xy").alias("n_big"))
    j = (
        bc_all.filter(F.col("c_xy") >= min_count)
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
            "c_xy",
        )
        .join(F.broadcast(uni.selectExpr("w AS w1", "c_w AS c_x")), "w1")
        .join(F.broadcast(uni.selectExpr("w AS w2", "c_w AS c_y")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
    )
    pmi = F.log(
        (F.col("c_xy").cast("double") * F.col("n_uni").cast("double") * F.col("n_uni").cast("double"))
        / (F.col("n_big").cast("double") * F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    pmi6 = F.floor(pmi * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    return j.select("w1", "w2", "c_xy", pmi6.alias("pmi")).filter(
        F.col("pmi") >= min_pmi
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    max_doc_ratio: float | None = None,
) -> DataFrame:
    """Document-pair cosine similarity over TF-IDF term vectors
    -> (id_a, id_b, cosine) for pairs sharing at least one term.

    The weighted-set sibling of ngram_jaccard_pairs: a posting-list
    self-join keyed on xxhash64(token) computes the sparse dot product
    (sum of weight products per pair) — candidate pairs come from
    shared terms, never an all-pairs cross join. Norms are one
    map-side-combinable aggregate per document.

    Determinism across engines: TF-IDF weights are pre-rounded to 6
    decimals, and both the dot product and the squared norms accumulate
    through exact decimal(28,12) sums, so the final double division is
    a pure function of identical inputs in any engine.

    ``max_doc_freq`` / ``max_doc_ratio`` are the scale guard this pair
    join REQUIRES in practice: a term in c documents contributes c^2
    join rows, so one stopword in most of an n-doc corpus alone costs
    ~n^2/2 rows — quadratic blowup from candidate generation that the
    post-join threshold cannot undo. Capping document frequency
    (absolute, or as a fraction of corpus size — the form that means
    the same thing at every scale) drops those terms from candidates
    AND the dot product. The dropped terms are exactly the ones TF-IDF
    weights near zero (idf -> 1 as df -> N), so high-cosine pairs are
    barely perturbed; the cap is part of the operator's spec and an
    oracle replays it exactly.
    """
    terms = tfidf_terms(df, text_col, id_col)
    if max_doc_ratio is not None:
        terms = terms.filter(F.col("df") <= F.col("n_docs") * max_doc_ratio)
    w = terms.select(
        F.col(id_col), F.xxhash64("token").alias("tok"), F.col("tfidf").alias("w")
    )
    # Materialize the posting table once: it feeds the norm aggregate
    # and BOTH sides of the pair join, and each reference would replan
    # the full tokenize -> TF -> DF -> IDF pipeline (and Spark's
    # concurrent broadcast jobs would race to execute it).
    # localCheckpoint (not persist): persist leaves the whole pipeline
    # inside each of the three references and Catalyst re-optimizes it
    # per reference — measured ~40% wall-time from driver planning.
    # The plan shape of the truncated upstream is covered by the
    # standalone tfidf_topterms query, which keeps full lineage.
    w = w.localCheckpoint(eager=True)
    if max_doc_freq is not None:
        hot = (
            w.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("tok")
        )
        w = w.join(F.broadcast(hot), "tok", "left_anti")
    dsum12 = lambda c: F.sum(c.cast("decimal(28,12)")).cast("double")  # noqa: E731
    norms = w.groupBy(id_col).agg(
        F.sqrt(dsum12(F.col("w") * F.col("w"))).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(dsum12(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("n_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("n_b"))
    cos = F.round(F.col("dot") / (F.col("n_a") * F.col("n_b")), 6)
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve -> one row
    (n_types, n_tokens, slope, intercept, r2).

    The standard corpus-health diagnostic (natural language shows
    ln(freq) ~ intercept + slope * ln(rank) with slope near -1;
    machine-generated or template-heavy corpora bend the curve):
    count token frequencies, rank by (freq desc, token asc), then OLS
    over (ln rank, ln freq) in closed form from five sufficient sums.

    Determinism discipline: both logs are quantized to decimal(18,9)
    BEFORE the products, so Σx, Σy, Σxy, Σx², Σy² are exact decimal
    sums (summation-order-free, engine-portable); slope/intercept/R²
    are then pure double arithmetic on exact components — the
    grouped_ols recipe extended to non-integral x.

    Scale shape: one token explode + hash-agg collapses the corpus to
    its vocabulary; the rank window and the fit run on vocab-sized
    data (millions of rows at web scale — a single-partition window is
    acceptable there, and the rank ordering is a total order so a
    two-pass prefix-rank swap-in stays bit-identical if vocab ever
    outgrows one partition).
    """
    tok = df.select(
        F.explode(tokenize(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = freq.withColumn("rank", F.row_number().over(w))
    x = F.log(F.col("rank").cast("double")).cast("decimal(18,9)")
    y = F.log(F.col("c").cast("double")).cast("decimal(18,9)")
    terms = ranked.select(
        x.alias("x"),
        y.alias("y"),
        F.col("c"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    cov_n = nd * sxyd - sxd * syd
    var_x = nd * sxxd - sxd * sxd
    var_y = nd * syyd - syd * syd
    slope = cov_n / var_x
    return agg.select(
        F.col("n").cast("long").alias("n_types"),
        F.col("n_tokens"),
        F.round(F.when(var_x > 0, slope), 6).alias("slope"),
        F.round(
            F.when(var_x > 0, (syd - slope * sxd) / nd), 6
        ).alias("intercept"),
        F.round(
            F.when(
                (var_x > 0) & (var_y > 0), cov_n * cov_n / (var_x * var_y)
            ),
            6,
        ).alias("r2"),
    )
