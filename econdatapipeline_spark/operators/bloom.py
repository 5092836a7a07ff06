"""Bloom-pruned incremental dedup against a standing corpus.

The 100 TB ingestion question is rarely "dedup this corpus against
itself" (operators/dedup.py) but "which of today's N rows are NEW
relative to the billions already ingested?" A plain anti-join answers
it exactly but shuffles the batch and semi-scans history every run.
The classic fix is a Bloom filter of the historical keys: probe it
map-side, and only the (tiny) maybe-seen remainder pays the exact join.

Spark's own bloom machinery (`BloomFilterAggregate` / `might_contain`)
is optimizer-internal — not callable from the public API — so this
module builds the same structure out of public column expressions:

- build: k double-hashed bit positions per key (Kirsch-Mitzenmacher:
  pos_i = h1 + i*h2 mod m, two xxhash64 seeds), OR-folded into
  m/64 long words via one ``bit_or`` aggregate; the whole filter is
  ONE row holding a word->bits map (a 2^20-bit filter is 16 KiB).
- probe: broadcast that row, test all k positions as pure scan-stage
  expressions (element_at + bitwiseAND) — ZERO shuffle, zero explode;
  a row is "definitely new" unless every probed bit is set.
- exact finish: only maybe-seen rows anti-join history; the union with
  the definitely-new rows is EXACTLY the set a plain anti-join returns
  (a Bloom filter has no false negatives), so the operator is
  hash-certifiable against an ordinary NOT EXISTS oracle while the
  false-positive RATE only governs how much work the exact join sees.

Sizing: m bits for n historical keys gives FP ~ (1 - e^(-kn/m))^k;
the default m=2^20, k=5 holds ~1% FP to n≈10^5 — at real scale pass
m sized to your history (m ≈ 10n bits for ~1% at the optimal k). The
one-row map broadcasts; beyond ~10^9 keys shard the filter by key
range and probe the shard map, same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_K = 5


def _positions(key: Column, num_bits: int, k: int) -> list[Column]:
    """k double-hashed bit positions for a key (all deterministic).

    Both hashes reduce mod m BEFORE combining: raw xxhash64 values sit
    near the int64 boundary, where ``h1 + i*h2`` overflows (an error
    under ANSI arithmetic, silent wrap otherwise). The stride takes
    mod (m-1) + 1 so it is never zero — a zero stride would collapse
    all k probes onto one bit.
    """
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    stride = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(num_bits - 1)) + 1
    return [F.pmod(h1 + F.lit(i) * stride, F.lit(num_bits)) for i in range(k)]


def build_bloom(
    history: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate the historical keys into a one-row Bloom filter.

    Output: a single row ``(words map<long, long>)`` mapping word index
    (bit position div 64) to the OR of its set bits. One data-sized
    hash aggregate keyed by word index (≤ m/64 groups, map-side
    combined), then a words-sized map assembly — the scan dominates,
    exactly like any COUNT(*). Store the row in the warehouse and
    tomorrow's increment ORs into it without rescanning history
    (merge_blooms).
    """
    if num_bits < 64 or num_bits % 64:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = F.explode(F.array(*_positions(F.col(key_col), num_bits, k)))
    sparse = (
        history.select(pos.alias("pos"))
        # shiftleft with a COLUMN shift count is SQL-only (the Python
        # helper accepts literal ints), hence the expr strings
        .select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return sparse.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("words")
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two same-shape filters — the incremental maintenance step
    (union today's batch filter into the standing one, never rescan)."""
    aw = a.select(F.explode("words").alias("word", "bits"))
    bw = b.select(F.explode("words").alias("word", "bits"))
    return (
        aw.unionByName(bw)
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("word"), F.col("bits")))
            ).alias("words")
        )
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Flag each batch row ``maybe_seen`` — map-side only.

    The one-row filter broadcasts (a single-row BroadcastNestedLoopJoin
    — the cheapest join Spark has); every probe is an element_at +
    bitwiseAND scan-stage expression, so the batch is never shuffled,
    exploded, or re-scanned. ``maybe_seen = false`` is a GUARANTEE of
    novelty (no false negatives); ``true`` means "pay the exact join".
    """
    probed = batch.crossJoin(F.broadcast(bloom))
    tmp = []
    for i, p in enumerate(_positions(F.col(key_col), num_bits, k)):
        tmp.append(f"__bloom_p{i}")
        probed = probed.withColumn(f"__bloom_p{i}", p)
    hit = None
    for i in range(k):
        this = F.expr(
            f"(coalesce(element_at(words, __bloom_p{i} div 64), 0L)"
            f" & shiftleft(1L, cast(__bloom_p{i} % 64 as int))) != 0"
        )
        hit = this if hit is None else (hit & this)
    return probed.withColumn("maybe_seen", hit).drop("words", *tmp)


def new_rows(
    batch: DataFrame,
    history: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """EXACT incremental dedup: batch rows whose key is absent from
    history, computed as bloom-prune + exact anti-join on the residue.

    Identical result set to ``batch ANTI JOIN history`` (Bloom filters
    have no false negatives, and false positives are re-checked by the
    join) — hash-certifiable against a NOT EXISTS oracle — but the
    anti-join's probe side carries only the maybe-seen residue: at a
    1% FP rate, 99% of a fresh batch never enters the shuffle. Pass a
    prebuilt ``bloom`` (the standing filter maintained via
    merge_blooms) to skip the history scan entirely on the build side.
    """
    bf = bloom if bloom is not None else build_bloom(history, key_col, num_bits, k)
    flagged = bloom_probe(batch, bf, key_col, num_bits, k)
    definite = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    residue = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = residue.join(
        history.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
    return definite.unionByName(checked)
