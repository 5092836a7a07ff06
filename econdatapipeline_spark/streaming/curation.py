"""Streaming corpus curation: quality-gate a document firehose.

The ingestion-time half of operators/curation: corpus-level stages
(dedup, LM percentile cuts) need the whole corpus, but the Gopher rule
battery is pure per-row column arithmetic — so it belongs at the edge,
BEFORE documents are ever stored. The same gopher_rules expressions
run unchanged on a streaming DataFrame (stateless projection + filter,
no state store, works in append mode), which keeps the batch and
stream gates bit-identical by construction: one rule implementation,
two execution modes.

curation_gate  -> the pass-through stream (kept docs + rule flags)
quality_monitor-> per event-time window per-rule failure counts — the
                  operations dashboard (a crawler gone wrong shows as
                  a spiking rule, not as silent corpus pollution).

Scale shape: the gate is a narrow map; the monitor is ONE windowed
aggregation with conditional-count columns (the quality.validate
shape), so state is exactly the open windows' count rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.quality import gopher_flag_exprs


_RULES = (
    "ok_words", "ok_word_len", "ok_symbol", "ok_bullet",
    "ok_ellipsis", "ok_alpha", "ok_stops",
)


def _flagged(docs: DataFrame, text_col: str, **gopher_overrides) -> DataFrame:
    """docs + rule flags + gopher_pass, computed as withColumns on the
    SAME frame — never a join of the stream against a projection of
    itself, which on a streaming frame would plan a stateful
    stream-stream join with unbounded state for a stateless map."""
    exprs = gopher_flag_exprs(text_col, **gopher_overrides)
    out = docs.withColumns(exprs)
    return out.withColumn(
        "gopher_pass",
        F.col(_RULES[0])
        & F.col(_RULES[1])
        & F.col(_RULES[2])
        & F.col(_RULES[3])
        & F.col(_RULES[4])
        & F.col(_RULES[5])
        & F.col(_RULES[6]),
    )


def curation_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **gopher_overrides,
) -> DataFrame:
    """Keep only documents passing the Gopher battery -> the original
    columns plus the rule flags (so downstream audits don't recompute).
    Stateless; identical semantics on batch and streaming frames."""
    keep = [c for c in docs.columns if c != id_col]
    return (
        _flagged(docs, text_col, **gopher_overrides)
        .filter(F.col("gopher_pass"))
        .select(id_col, *keep, *_RULES)
    )


def quality_monitor(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    **gopher_overrides,
) -> DataFrame:
    """Per event-time window rule-failure dashboard -> (window_start,
    window_end, n_docs, n_pass, fail_<rule>...).

    One windowed aggregation; on a streaming frame the watermark bounds
    state and closes windows for append mode. A healthy crawl shows a
    stable pass fraction — any single fail_* series spiking is the
    direct pointer to WHAT broke (encoding gone wrong -> fail_alpha;
    a listings site flooding in -> fail_bullet)."""
    joined = _flagged(docs, text_col, **gopher_overrides).select(
        F.col(id_col), F.col(ts_col), F.col("gopher_pass"), *_RULES
    )
    if joined.isStreaming:
        joined = joined.withWatermark(ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
    ]
    for r in _RULES:
        aggs.append(
            F.sum(F.when(~F.col(r), 1).otherwise(0))
            .cast("long")
            .alias(f"fail_{r[3:]}")
        )
    return (
        joined.groupBy(F.window(F.col(ts_col), window))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_docs",
            "n_pass",
            *[f"fail_{r[3:]}" for r in _RULES],
        )
    )
