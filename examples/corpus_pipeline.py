"""Training-corpus preparation: the full hygiene funnel end-to-end.

Run from the repo root:  python examples/corpus_pipeline.py

Composes the corpus operators the way a pre-training data pipeline
would, over the benchmark documents table:

  1. quality + language gates         (functions.text, column exprs)
  2. data-driven quantile gate +      (operators.quality.quantile_filter,
     domain frequency cap              operators.sampling.domain_cap)
  3. repetition filter                (operators.contamination)
  4. benchmark decontamination        (operators.contamination)
  5. exact dedup, best copy kept      (operators.dedup)
  6. near-dup clustering + canonical  (operators.dedup: MinHash LSH ->
                                       star-contraction CC -> min_by pick)
  7. leakage-safe cluster split       (operators.sampling.cluster_split)
  8. per-split token accounting +     (functions.text,
     sketch-based distinct audit       operators.stats.hll_rollup)
  9. training-order shuffle + shards  (operators.sampling.corpus_shuffle)

Every stage is a lazy DataFrame transform; the funnel executes as a
handful of Spark jobs only at the final action — at 100 TB the same
composition runs unchanged, with the gates applied map-side during the
initial scan and only survivors ever reaching a shuffle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark import get_spark
from econdatapipeline_spark.functions import text as TX
from econdatapipeline_spark.operators.contamination import (
    decontaminate,
    repetition_scores,
)
from econdatapipeline_spark.operators.dedup import (
    exact_dedup_best,
    minhash_lsh_candidates,
    star_components,
)
from econdatapipeline_spark.operators.sampling import cluster_split

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(
        app_name="corpus_pipeline", master="local[4]", shuffle_partitions=4
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n0 = docs.count()

    # 1. Quality + language gates: pure column expressions, applied in the scan stage.
    gated = docs.filter(
        (TX.stopword_ratio(F.col("text"), "en") > 0.01)
        & (F.length("text") >= 50)
    )

    # 2. Data-driven quality gate (cutoff from the corpus, not a magic
    #    number) + mega-domain cap (top copies per source).
    from econdatapipeline_spark.operators.quality import quantile_filter
    from econdatapipeline_spark.operators.sampling import domain_cap

    gated = quantile_filter(gated, "n_chars", 0.05).drop("cutoff")
    gated = domain_cap(gated, max_per_domain=200).drop("domain_rank")

    # 3. Repetition filter: drop documents dominated by repeated bigrams.
    rep = repetition_scores(gated)
    gated = gated.join(
        rep.filter(F.col("top_bigram_frac") <= 0.5).select("doc_id"), "doc_id"
    )
    n1 = gated.count()

    # 3. Decontamination: docs sharing 4-grams with the held-out slice are dropped.
    holdout = docs.filter(F.col("doc_id") % 17 == 0)
    train_pool = gated.filter(F.col("doc_id") % 17 != 0)
    contaminated = decontaminate(train_pool, holdout, n=4).select("doc_id")
    clean = train_pool.join(contaminated, "doc_id", "left_anti")
    n2 = clean.count()

    # 4. Exact dedup keeping the best copy per fingerprint group
    #    (exact_dedup_best returns the winning ids; join back for text).
    winners = exact_dedup_best(clean, score=F.col("n_chars")).select("doc_id")
    deduped = clean.join(winners, "doc_id")
    n3 = deduped.count()

    # 5. Near-dup clustering: LSH candidates -> star-contraction
    #    connected components -> ONE canonical doc per cluster (longest
    #    copy wins, id tiebreak) via a single min_by aggregate.
    cand = minhash_lsh_candidates(deduped, num_hashes=16, bands=8)
    n_cand = cand.count()
    # materialize once: the label table feeds the canonical pick AND the
    # split below; checkpointing also severs the lineage so the reuse
    # is not an ambiguous self-join
    labels = star_components(
        cand.filter(F.col("est_jaccard") >= 0.8)
    ).localCheckpoint(eager=True)
    with_cluster = deduped.join(labels, deduped.doc_id == labels.node, "left").select(
        deduped["*"], F.coalesce(labels.cluster, deduped.doc_id).alias("cluster_id")
    )
    canonical = (
        with_cluster.groupBy("cluster_id")
        .agg(
            F.min_by(
                F.col("doc_id"),
                F.struct((-F.col("n_chars")).alias("o1"), F.col("doc_id").alias("o2")),
            ).alias("doc_id")
        )
        .select("doc_id")
    )
    deduped = deduped.join(canonical, "doc_id")

    # 6-7. LEAKAGE-SAFE deterministic split: assignment by near-dup
    #    cluster, so surviving docs whose near-dups were removed still
    #    land on the side their cluster hashes to — no near-duplicate
    #    content ever straddles train/test. Then token accounting.
    split = cluster_split(deduped, labels, test_fraction=0.2)
    stats = (
        split.withColumn("n_tokens", F.size(TX.tokenize(F.col("text"))))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("split")
    )

    # 8b. Sketch audit: per-source approx distinct + union-merged total
    #     (the re-aggregatable COUNT DISTINCT — increments merge in).
    from econdatapipeline_spark.operators.stats import hll_rollup

    audit = hll_rollup(split.filter(F.col("split") == "train"), "doc_id", "source")

    # 9. Deterministic training order + equal shards for the train side.
    from econdatapipeline_spark.operators.sampling import corpus_shuffle

    train = split.filter(F.col("split") == "train")
    sharded = corpus_shuffle(train.select("doc_id", "source"), n_shards=4)
    shard_sizes = (
        sharded.groupBy("shard_id").agg(F.count(F.lit(1)).alias("docs"))
        .orderBy("shard_id")
    )

    print(f"corpus funnel: {n0} raw -> {n1} gated -> {n2} clean -> {n3} deduped")
    print(f"near-dup candidate pairs: {n_cand}")
    for r in stats.collect():
        print(f"  split={r['split']:<6} docs={r['docs']:<6} tokens={r['tokens']}")
    merged = {r["group"]: r["approx_distinct"] for r in audit.collect()}
    print(f"train distinct-doc sketch (union-merged): ~{merged['__all__']:.0f}")
    for r in shard_sizes.collect():
        print(f"  shard={r['shard_id']} docs={r['docs']}")
    print("corpus pipeline done")


if __name__ == "__main__":
    main()
