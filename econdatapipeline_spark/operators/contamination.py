"""Corpus-hygiene operators for training-data pipelines.

Two classic pre-training gates the reference never needed (it ingests
curated economic series) but any large-scale text pipeline does:

- decontaminate: flag training documents that share word n-grams with a
  held-out evaluation/benchmark corpus (n-gram-overlap decontamination,
  the standard leakage check before pre-training).
- repetition_scores: per-document duplicate-n-gram fractions (the
  "repetitious text" quality signals popularized by the Gopher paper's
  filtering rules).

Scale stance: the eval side of decontamination collapses to a distinct
set of 8-byte gram hashes and is broadcast — benchmark suites stay
MB-sized even when the training corpus is 100 TB, so the corpus scan is
map-only with no shuffle of the big side. Repetition scoring is one
narrow pass of array math plus a two-level (doc, gram) count whose first
aggregation is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import shingles, word_ngrams
from econdatapipeline_spark.sources.tables import fan_out


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag training docs sharing any word n-gram with a holdout corpus.

    Returns one row per contaminated training document:
    ``(id_col, n_grams, hit_grams, contamination)`` where ``n_grams`` is
    the document's distinct n-gram count, ``hit_grams`` how many of
    those also occur anywhere in the holdout, and ``contamination`` the
    ratio. Clean documents are absent (inner join) — the caller
    anti-joins on the result to drop or audit contaminated docs.

    The join key is xxhash64(gram): 8-byte shuffle-free broadcast probes
    instead of multi-word string compares.
    """
    ev = (
        holdout.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .select(F.xxhash64("gram").alias("gram"))
        .distinct()
    )
    tr = fan_out(train).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("sh")
    )
    tr = tr.select(
        id_col, F.size("sh").alias("n_grams"), F.explode("sh").alias("gram")
    ).select(id_col, "n_grams", F.xxhash64("gram").alias("gram"))
    hits = (
        tr.join(F.broadcast(ev), "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
    return hits.select(
        id_col,
        "n_grams",
        "hit_grams",
        F.round(F.col("hit_grams") / F.col("n_grams"), 6).alias("contamination"),
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document.

    ``dup_bigram_frac`` / ``dup_trigram_frac`` = fraction of n-gram
    OCCURRENCES that are repeats (1 - distinct/total), computed as pure
    array expressions; ``top_bigram_frac`` = share of the single most
    frequent bigram, computed as a (doc, gram) count followed by a
    per-doc max — the mode-by-two-aggregations shape, both stages
    map-side combinable. Documents shorter than n tokens score 0 (their
    gram list collapses to one whole-text gram).
    """
    txt = F.col(text_col)
    base = fan_out(df).select(
        F.col(id_col),
        word_ngrams(txt, 2).alias("g2"),
        word_ngrams(txt, 3).alias("g3"),
    )
    ex = base.select(
        id_col,
        F.size("g2").alias("t2"),
        F.size(F.array_distinct("g2")).alias("d2"),
        F.size("g3").alias("t3"),
        F.size(F.array_distinct("g3")).alias("d3"),
        F.explode("g2").alias("gram"),
    )
    top = (
        ex.groupBy(id_col, "t2", "d2", "t3", "d3", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "t2", "d2", "t3", "d3")
        .agg(F.max("c").alias("topc"))
    )
    return top.select(
        id_col,
        F.round((F.col("t2") - F.col("d2")) / F.col("t2"), 6).alias("dup_bigram_frac"),
        F.round((F.col("t3") - F.col("d3")) / F.col("t3"), 6).alias("dup_trigram_frac"),
        F.round(F.col("topc") / F.col("t2"), 6).alias("top_bigram_frac"),
    )
