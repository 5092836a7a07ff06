"""End-to-end corpus curation funnel: rules -> dedup -> LM tail cut.

The composed shape every pretraining-data pipeline runs (C4, Gopher,
RefinedWeb all chain roughly these stages): structural quality rules
first (cheapest, biggest cut), exact duplicate removal second, then a
model-based fluency cut on what survives. This module wires the
existing operators into ONE declarative plan and reports the funnel —
per-stage in/out counts — which is the number a curation run is
actually judged by ("where did my corpus go?").

Spark shape: the stages stay lazy and compose into a single DAG; the
report is four 1-row aggregates cross-joined (driver-sized) and
exploded into tidy rows, so the whole funnel is one action. Each
stage's cut is deterministic and engine-portable: gopher_rules is
pure column arithmetic, the dedup canonical is min-id-per-content-
hash, and the LM cutoff is the exact interpolated percentile of
decimal-quantized cross-entropies (the quantile_filter discipline).

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
        raise ValueError(f"lm_keep_frac must be in (0, 1], got {lm_keep_frac}")
    flags = gopher_rules(df, text_col, id_col, **gopher_overrides)
    s1 = df.join(
        flags.filter(F.col("gopher_pass")).select(id_col), id_col, "semi"
    )
    key = F.md5(F.lower(F.trim(F.col(text_col))))
    best = (
        s1.select(F.col(id_col), key.alias("k"))
        .groupBy("k")
        .agg(F.min(id_col).alias(id_col))
    )
    s2 = s1.join(best.select(id_col), id_col, "semi")
    scored = lm_score(s2, None, text_col, id_col)
    cut = scored.filter(F.col("xent").isNotNull()).agg(
        F.expr(f"percentile(xent, {lm_keep_frac!r})").alias("cutoff")
    )
    keep_ids = (
        scored.join(F.broadcast(cut))
        .filter(F.col("xent").isNull() | (F.col("xent") <= F.col("cutoff")))
        .select(id_col)
    )
    s3 = s2.join(keep_ids, id_col, "semi")

    counts = (
        df.agg(F.count(F.lit(1)).alias("n0"))
        .crossJoin(s1.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
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
