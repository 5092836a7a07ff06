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
    """
    if model is None:
        model = train_bigram_lm(df, text_col, id_col)
    c2, c1, vocab = model
    bg = _bigram_occurrences(df, text_col, id_col).withColumn(
        "w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1))
    )
    scored = (
        bg.join(F.broadcast(c2), "g", "left")
        .join(F.broadcast(c1), "w1", "left")
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
