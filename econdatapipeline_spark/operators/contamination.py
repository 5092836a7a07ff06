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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import (
    shingle_struct_hash,
    shingle_structs,
    word_ngrams,
)
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

    The join key is an 8-byte xxhash64 over the shingle's token tuple,
    hashed straight out of the zipped token slices on both sides so the
    shingling stays in whole-stage codegen (no per-gram string concat)
    and the broadcast probes compare longs, not multi-word strings.
    """
    ev = (
        holdout.select(F.explode(shingle_structs(F.col(text_col), n)).alias("g"))
        .select(shingle_struct_hash(F.col("g"), n).alias("gram"))
        .distinct()
    )
    tr = fan_out(train).select(
        F.col(id_col), shingle_structs(F.col(text_col), n).alias("sh")
    )
    tr = tr.select(
        id_col, F.size("sh").alias("n_grams"), F.explode("sh").alias("g")
    ).select(id_col, "n_grams", shingle_struct_hash(F.col("g"), n).alias("gram"))
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
    frequent bigram, computed as the longest run of equal neighbors in
    the SORTED gram array — a per-row O(n log n) expression. Per-doc
    statistics never need a shuffle: the earlier (doc, gram) count +
    per-doc max shape shipped every gram occurrence through an
    exchange; this form is one narrow projection, which is the shape
    that survives a 100 TB corpus. Documents shorter than n tokens
    collapse to one whole-text gram: their ``dup_*_frac`` columns score
    0 (one occurrence, one distinct), while ``top_bigram_frac`` is 1.0
    — the single gram IS the most frequent one. The oracle mirrors
    both conventions.
    """
    txt = F.col(text_col)
    base = fan_out(df).select(
        F.col(id_col),
        word_ngrams(txt, 2).alias("g2"),
        word_ngrams(txt, 3).alias("g3"),
    )

    def run_step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    mode_count = F.aggregate(
        F.array_sort("g2"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        run_step,
        lambda acc: acc.getField("best"),
    )
    return base.select(
        id_col,
        F.round(
            (F.size("g2") - F.size(F.array_distinct("g2"))) / F.size("g2"), 6
        ).alias("dup_bigram_frac"),
        F.round(
            (F.size("g3") - F.size(F.array_distinct("g3"))) / F.size("g3"), 6
        ).alias("dup_trigram_frac"),
        F.round(mode_count / F.size("g2"), 6).alias("top_bigram_frac"),
    )


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token Shannon entropy -> (id, n_tokens, n_distinct,
    entropy) in nats — the gibberish / boilerplate detector that
    complements the repetition fractions: keyboard-mash scores HIGH
    (every token unique -> entropy = ln n), template spam scores LOW
    (one token dominates -> entropy -> 0); natural prose sits in a
    band between them, so corpus filters gate on BOTH tails.

    Algebra: H = ln(n) - (Σ c·ln c)/n over per-token counts c, so the
    whole operator is two hash aggregates keyed by document (token
    counts, then the per-doc reduction) — both with map-side partials,
    state O(distinct tokens per doc), never O(corpus vocabulary).

    Cross-engine determinism: each c·ln(c) term is floor-rounded at
    1e-6 BEFORE the sum and the sum runs in decimal, so engines add
    identical addends in any order (the ``adamic_adar`` ln discipline);
    the final entropy rounds to 6 at the edge.
    """
    from econdatapipeline_spark.functions.text import tokenize

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    term = (
        F.floor(
            F.col("c").cast("double") * F.log(F.col("c").cast("double")) * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    per_doc = counts.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(term.cast("decimal(28,6)")).cast("double").alias("__clnc"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("__clnc") / F.col("n_tokens")
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "n_distinct",
        F.round(h, 6).alias("entropy"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    tau: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 7, 19, 33, 51),
) -> DataFrame:
    """Embedding-space benchmark decontamination -> (id, contaminated).

    ``decontaminate`` catches verbatim n-gram overlap; paraphrased or
    translated eval leakage survives it. The embedding-space
    complement flags every corpus document whose vector is
    near-duplicate (cosine >= tau) to ANY benchmark vector — the
    semantic-contamination screen run before training (same spirit as
    the SemDeDup near-dup topology in operators/semdedup.py).

    Scale shape: both sides bucket by sign-LSH (functions.vectors.
    sign_bucket), so each benchmark vector only scores in-bucket
    candidates; the benchmark side is tiny by definition (an eval set)
    and broadcasts. Output keeps EVERY corpus row with a flag so the
    kill-list and the survivor set are both one filter away.
    """
    from econdatapipeline_spark.functions.vectors import dot, norm, sign_bucket
    from econdatapipeline_spark.sources.tables import fan_out

    c = fan_out(corpus).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        norm(F.col(vec_col).cast("array<double>")).alias("cn"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    b = F.broadcast(
        benchmark.select(
            F.col(id_col).alias("bid"),
            F.col(vec_col).cast("array<double>").alias("bv"),
            norm(F.col(vec_col).cast("array<double>")).alias("bn"),
            sign_bucket(F.col(vec_col), dims).alias("bucket"),
        )
    )
    hits = (
        c.join(b, "bucket")
        .filter(
            F.round(
                dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")), 6
            )
            >= tau
        )
        .select("id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return c.join(hits, "id", "left").select(
        "id", F.coalesce(F.col("hit"), F.lit(False)).alias("contaminated")
    )
