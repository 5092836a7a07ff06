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


def _merge_fold(syms: Column, left: str | Column, right: str | Column) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) in a symbol
    array — the BPE training rewrite, as one aggregate fold. ``left``/
    ``right`` may be Columns (bpe_round_pairs chains the winner
    relation in without a driver collect)."""
    lc = F.lit(left) if isinstance(left, str) else left
    rc = F.lit(right) if isinstance(right, str) else right
    merged = F.concat(lc, rc)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lc)
            & (s == rc),
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


def bpe_round_pairs(
    df: DataFrame,
    rounds: int = 2,
    top_k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Hash-certifiable structural twin of the bpe_train mechanism ->
    (round, rank, left, right, pair_count): the top-k pair counts of
    the first ``rounds`` merge rounds, fully relational (no driver
    collect — each round's winner chains in as a 1-row broadcast).

    bpe_train itself is a driver loop (the chosen merge IS the model,
    so a per-round collect is inherent) and records rows-only with the
    driver oracle; this twin unrolls a fixed number of rounds into one
    plan so BOTH engines can agree bit-for-bit on every mechanism the
    loop relies on: the corpus-to-histogram collapse, the
    freq-weighted adjacent-pair aggregate, the (count DESC, left ASC,
    right ASC) tie-break, and the greedy left-to-right merge rewrite
    (round 2's counts are only right if round 1's winner was applied
    with exact BPE semantics). The ann_ivf_exact pattern.

    Scale: the ranked relation is symbol-vocabulary²-bounded (NOT
    corpus-sized), so the global rank window is safe; the rewrite is
    the same narrow fold bpe_train uses.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = word_histogram(df, text_col).select(
        "freq", F.split("word", "").alias("syms")
    )
    out = None
    for rnd in range(1, rounds + 1):
        pair_idx = F.sequence(F.lit(1), F.size("syms") - 1)
        pairs = (
            cur.filter(F.size("syms") >= 2)
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
        w = Window.orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
        ranked = pairs.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= top_k
        )
        this = ranked.select(
            F.lit(rnd).alias("round"),
            "rank",
            F.col("l").alias("left"),
            F.col("r").alias("right"),
            F.col("n").cast("long").alias("pair_count"),
        )
        out = this if out is None else out.unionByName(this)
        if rnd < rounds:
            winner = ranked.filter(F.col("rank") == 1).select(
                F.col("l").alias("__wl"), F.col("r").alias("__wr")
            )
            cur = cur.crossJoin(F.broadcast(winner)).select(
                "freq",
                _merge_fold(
                    F.col("syms"), F.col("__wl"), F.col("__wr")
                ).alias("syms"),
            )
    return out


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
