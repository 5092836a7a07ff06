"""Distributed BPE tokenizer training as iterative Spark aggregation.

A training-data platform that packs, counts, and dedups tokens should
also be able to LEARN the tokenizer from the corpus it curates. This is
byte-pair-encoding training (Sennrich et al. 2016) as the classic
count-merge loop, with the corpus-sized work fully distributed:

- the corpus collapses once into a (word, freq) relation — BPE
  statistics depend only on the word histogram, which is vocabulary-
  sized, not corpus-sized (the 100 TB scan happens exactly once);
- each merge round is ONE pair-count aggregate over the word relation
  (explode adjacent symbol pairs weighted by word freq, map-side
  partials) plus a 1-row argmax collected to the driver (the chosen
  merge IS the model — driver-sized by definition);
- the merge rewrite is a narrow fold over each word's symbol array
  (greedy left-to-right, the reference semantics) — no shuffle;
- the word relation is localCheckpoint'ed per round, the same
  iterative-state discipline as ``dedup.connected_components``.

Determinism: argmax ties break on (count DESC, left ASC, right ASC),
so the learned merge sequence is reproducible across engines, runs,
and partitionings; ``tests/test_bpe.py`` pins the whole loop against a
pure-Python reference implementation, exact match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import bpe_ish_tokens


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) in a symbol
    array — the BPE training rewrite, as one aggregate fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized pass of BPE
    training. Pretokenization is the BPE-ish regex split (words /
    numbers / punctuation runs)."""
    return (
        df.select(F.explode(bpe_ish_tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges -> [(left, right, pair_count)]
    in merge order. Stops early when no pair reaches
    ``min_pair_count``.

    The returned list is the model (driver-sized by definition: one
    tuple per merge). Feed it to ``bpe_encode`` to segment text, or
    wrap with ``merges_df`` for a relational view.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words = (
        word_histogram(df, text_col)
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_idx = F.sequence(F.lit(1), F.size("syms") - 1)
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("n"))
        )
        top = (
            pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        words = words.select(
            "word", "freq", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Relational view of a learned merge list ->
    (merge_rank, left, right, pair_count)."""
    rows = [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a learned merge list ->
    (id, n_pretokens, n_bpe_tokens, tokens).

    Applies the merges IN LEARNED ORDER to every pretoken — one chained
    column expression per merge, all inside codegen'd array math; no
    shuffle, no UDF, so encoding scales as a map-only pass over the
    corpus.
    """
    toks = bpe_ish_tokens(F.col(text_col))
    encode_word = F.split(F.col("w"), "")
    for left, right, _ in merges:
        encode_word = _merge_fold(encode_word, left, right)
    per_word = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "w")
    ).select("id", "pos", encode_word.alias("pieces"))
    encoded = per_word.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_pretokens"),
        F.sum(F.size("pieces")).alias("n_bpe_tokens"),
        F.flatten(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
            ).getField("pieces")
        ).alias("tokens"),
    )
    # documents with ZERO pretokens (empty/whitespace text) produce no
    # posexplode rows; a left join from the id skeleton keeps them in
    # the output so token accounting matches the input row count
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(encoded, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_pretokens", F.lit(0)).alias("n_pretokens"),
        F.coalesce("n_bpe_tokens", F.lit(0)).alias("n_bpe_tokens"),
        F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
    )
