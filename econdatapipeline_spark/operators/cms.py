"""Count-min sketch: sublinear frequency estimation with a built-in
exactness audit.

The CMS (Cormode & Muthukrishnan 2005) answers "how often does token X
appear?" from depth·width counters instead of a vocabulary-sized
table — the sketch a 100 TB token-frequency monitor actually ships
(the vocabulary relation is fine at rest, but a fixed-size sketch is
what fits in a streaming state store or a per-executor accumulator).
Guarantee: est >= true, and est <= true + eps·N with probability
1 − delta for width = e/eps, depth = ln(1/delta).

Relational shape: the corpus collapses ONCE to (token, freq); the
sketch is depth hash-aggregates over that relation expressed as one
explode(depth) + groupBy(row, bucket) — counters-sized output, never
vocabulary-sized. Estimation replays the same md5 bucket derivation
(the sampling.py `_md5_bucket` idiom, portable to any engine) and
takes the min over depth rows. The audit output pairs each queried
token's estimate with its exact count — the minhash_error pattern:
every sketch ships with the query that certifies it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(token_col, row: int, width: int):
    """Row-r CMS bucket of a token: first 8 md5 hex digits of
    '<r>:<token>' as an int, mod width (DuckDB: CAST('0x' ||
    substr(md5(...), 1, 8) AS BIGINT) % width)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), token_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    freq_col: str = "freq",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(token, freq) relation -> CMS counters (row, bucket, cnt),
    depth·width rows at most."""
    per_row = None
    for r in range(depth):
        this = tokens.select(
            F.lit(r).alias("row"),
            _bucket(F.col(token_col), r, width).alias("bucket"),
            F.col(freq_col).cast("long").alias("f"),
        )
        per_row = this if per_row is None else per_row.unionByName(this)
    return per_row.groupBy("row", "bucket").agg(
        F.sum("f").cast("long").alias("cnt")
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    k: int = 20,
) -> DataFrame:
    """Top-k tokens with exact and CMS-estimated counts ->
    (token, exact_count, cms_estimate, overestimate), ordered by
    exact count desc then token.

    One corpus-sized tokenize+count collapse; the sketch and the
    estimates are vocabulary-sized aggregates; output is k rows. The
    overestimate column IS the audit: it is always >= 0 (CMS never
    undercounts), and small relative to eps·N when width is sized to
    the vocabulary's tail mass.
    """
    from econdatapipeline_spark.functions.text import (  # noqa: PLC0415
        bpe_ish_tokens,
    )

    toks = (
        df.select(F.explode(bpe_ish_tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    sketch = cms_sketch(toks, depth=depth, width=width)
    top = (
        toks.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    )
    probes = None
    for r in range(depth):
        this = top.select(
            "token",
            "freq",
            F.lit(r).alias("row"),
            _bucket(F.col("token"), r, width).alias("bucket"),
        )
        probes = this if probes is None else probes.unionByName(this)
    est = (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("token", "freq")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "token",
        F.col("freq").alias("exact_count"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("freq"))
        .cast("long")
        .alias("overestimate"),
    ).orderBy(F.desc("exact_count"), F.asc("token"))
