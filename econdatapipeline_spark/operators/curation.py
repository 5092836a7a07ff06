"""End-to-end corpus curation funnel: rules -> dedup -> LM tail cut.

The composed shape every pretraining-data pipeline runs (C4, Gopher,
RefinedWeb all chain roughly these stages): structural quality rules
first (cheapest, biggest cut), exact duplicate removal second, then a
model-based fluency cut on what survives. This module wires the
existing operators into ONE declarative plan and reports the funnel —
per-stage in/out counts — which is the number a curation run is
actually judged by ("where did my corpus go?").

Spark shape: each stage's surviving ID set (8 bytes/doc, never the
text) materializes via localCheckpoint, because the funnel both
CHAINS the stages and AGGREGATES every one of them for the report —
lazy composition would re-run the stage-1 rules four times. The
report is then four 1-row aggregates cross-joined (driver-sized) and
exploded into tidy rows. Each stage's cut is deterministic and
engine-portable: gopher_rules is pure column arithmetic, the dedup
canonical is min-id-per-content-hash, and the LM cutoff is the exact
interpolated percentile of decimal-quantized cross-entropies (the
quantile_filter discipline).

At 100 TB the stage ORDER is the cost model: rules are a map-only
scan over everything; dedup's hash-agg shuffle runs on rule
survivors only; LM scoring (explode + broadcast model join), the most
expensive stage, touches only deduplicated survivors. Reversing the
order would LM-score spam and duplicates just to throw them away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.operators.lm import lm_score
from econdatapipeline_spark.operators.quality import gopher_rules


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_keep_frac: float = 0.8,
    **gopher_overrides,
) -> tuple[DataFrame, DataFrame]:
    """Run the three-stage funnel -> (kept, report).

    ``kept`` is the surviving slice of ``df`` (original columns);
    ``report`` is three tidy rows (stage, n_in, n_out):

    1. ``gopher``      — gopher_rules pass flag (thresholds
                         overridable via ``**gopher_overrides``)
    2. ``exact_dedup`` — one survivor per distinct normalized text
                         (md5 key, min id wins — the best-copy rule)
    3. ``lm_tail``     — self-trained bigram-LM cross-entropy at or
                         under the exact ``lm_keep_frac`` percentile
                         of stage-2 survivors; docs too short to score
                         (xent null) carry no fluency evidence and are
                         KEPT, same contract as dsir_log_ratio = 0.

    The LM trains on stage-2 survivors, not the raw corpus — training
    on data the rules already rejected would let boilerplate define
    "fluent".
    """
    if not 0.0 < lm_keep_frac <= 1.0:
        raise ValueError(f"lm_keep_frac must be (0, 1], got {lm_keep_frac}")
    # Stage survivor IDS localCheckpoint (ids only — never the text):
    # the funnel report aggregates every stage AND chains them, so
    # without the barrier each reference re-derives the whole prefix
    # (stage-1 rules would run four times). Ids are 8 bytes/doc; the
    # text re-joins lazily from the scan.
    flags = gopher_rules(df, text_col, id_col, **gopher_overrides)
    s1_ids = (
        flags.filter(F.col("gopher_pass"))
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    s1 = df.join(s1_ids, id_col, "semi")
    key = F.md5(F.lower(F.trim(F.col(text_col))))
    best = (
        s1.select(F.col(id_col), key.alias("k"))
        .groupBy("k")
        .agg(F.min(id_col).alias(id_col))
    )
    s2_ids = (
        s1.join(best.select(id_col), id_col, "semi")
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    s2 = df.join(s2_ids, id_col, "semi")
    scored = lm_score(s2, None, text_col, id_col)
    cut = scored.filter(F.col("xent").isNotNull()).agg(
        F.expr(f"percentile(xent, {lm_keep_frac!r})").alias("cutoff")
    )
    keep_ids = (
        scored.join(F.broadcast(cut))
        .filter(F.col("xent").isNull() | (F.col("xent") <= F.col("cutoff")))
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    s3 = df.join(keep_ids, id_col, "semi")

    counts = (
        df.agg(F.count(F.lit(1)).alias("n0"))
        .crossJoin(s1_ids.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(s2_ids.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(keep_ids.agg(F.count(F.lit(1)).alias("n3")))
    )
    report = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("gopher").alias("stage"),
                    F.col("n0").cast("long").alias("n_in"),
                    F.col("n1").cast("long").alias("n_out"),
                ),
                F.struct(
                    F.lit("exact_dedup").alias("stage"),
                    F.col("n1").cast("long").alias("n_in"),
                    F.col("n2").cast("long").alias("n_out"),
                ),
                F.struct(
                    F.lit("lm_tail").alias("stage"),
                    F.col("n2").cast("long").alias("n_in"),
                    F.col("n3").cast("long").alias("n_out"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_in", "s.n_out")
    return s3, report
