"""Semantic + model-based curation: the round-4 operator families
composed end-to-end.

Run from the repo root:  python examples/semantic_curation.py

The complement to examples/corpus_pipeline.py (which runs the lexical
hygiene funnel): this walkthrough exercises the embedding-space and
model-based stages a modern pre-training pipeline layers on top,

  1.  substring-span dedup          (operators.spans — Lee et al. 2021)
  2.  bigram-LM quality scoring     (operators.lm — perplexity proxy)
  3.  SemDeDup semantic dedup       (operators.semdedup)
  4.  embedding decontamination     (operators.contamination)
  5.  MinHash estimator audit       (operators.dedup.minhash_estimate_error)
  6.  ANN recall audit              (operators.evaluation.topk_overlap)
  7.  hybrid BM25+dense retrieval   (operators.retrieval)
  8.  curation-classifier metrics   (operators.evaluation.roc_auc)
  9.  key-skew probe before joins   (operators.skew.skew_report)

Stages 5/6/8 are the AUDIT half — measuring the sketches, indexes, and
classifiers that gate the corpus, which is how thresholds get chosen
before a 100 TB run rather than after it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from econdatapipeline_spark import get_spark
from econdatapipeline_spark.operators.contamination import semantic_decontaminate
from econdatapipeline_spark.operators.dedup import minhash_estimate_error
from econdatapipeline_spark.operators.evaluation import roc_auc, topk_overlap
from econdatapipeline_spark.operators.lm import lm_score, train_bigram_lm
from econdatapipeline_spark.operators.retrieval import hybrid_search
from econdatapipeline_spark.operators.semdedup import semantic_dedup
from econdatapipeline_spark.operators.similarity import brute_force_topk, lsh_topk
from econdatapipeline_spark.operators.skew import skew_report
from econdatapipeline_spark.operators.spans import substring_dup_stats

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="semantic_curation")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # 1. cross-document exact substring coverage -> drop heavy overlap
    spans = substring_dup_stats(docs, k=8, flag_frac=0.5)
    clean = docs.join(spans.filter(~F.col("flagged")).select("doc_id"), "doc_id")
    print(f"substring dedup: {docs.count()} -> {clean.count()} docs")

    # 2. LM quality: train on the surviving slice, score everything
    model = train_bigram_lm(clean)
    scored = lm_score(docs, model=model)
    cutoff = scored.approxQuantile("xent", [0.9], 0.01)[0]
    print(f"LM xent p90 cutoff: {cutoff:.3f}")

    # 3. semantic dedup over embeddings (keep the centroid-edge copy)
    sem = semantic_dedup(emb, tau=0.2)
    print(f"semantic dedup keeps {sem.filter('kept').count()} / {sem.count()}")

    # 4. embedding-space benchmark decontamination
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    corpus_emb = emb.filter(F.col("vec_id") % 10 != 0)
    decon = semantic_decontaminate(corpus_emb, bench, tau=0.9)
    print(f"semantically contaminated: {decon.filter('contaminated').count()}")

    # 5. audit the MinHash sketch before trusting it corpus-wide
    audit = minhash_estimate_error(docs).agg(
        F.count("*").alias("pairs"), F.round(F.avg("abs_err"), 4).alias("mean_err")
    ).collect()[0]
    print(f"minhash audit: {audit['pairs']} pairs, mean |est-exact| {audit['mean_err']}")

    # 6. audit the ANN index against exact ground truth
    queries = emb.filter(F.col("vec_id") < 3)
    rec = topk_overlap(
        lsh_topk(emb, queries, k=5), brute_force_topk(emb, queries, k=5), k=5
    ).agg(F.round(F.avg("recall"), 3).alias("recall_at_5")).collect()[0]
    print(f"ANN recall@5: {rec['recall_at_5']}")

    # 7. hybrid retrieval over the curated corpus
    hits = hybrid_search(docs, emb, ["spark", "shuffle"], query_vec_id=0, k=5)
    print("hybrid top-5:", [r["doc_id"] for r in hits.collect()])

    # 8. evaluate a (toy) quality classifier before gating on it
    scored_cls = emb.select(
        (F.col("label") < 5).alias("label"),
        ((F.col("vec_id") % 97) / F.lit(96.0)).alias("score"),
    )
    auc = roc_auc(scored_cls).collect()[0]
    print(f"classifier AUC {auc['auc']} over {auc['n_pos']}+/{auc['n_neg']}-")

    # 9. skew probe: is doc source a safe join/partition key?
    probe = skew_report(docs, "source").collect()[0]
    print(
        f"source-key skew: top1_share={probe['top1_share']}, "
        f"balance={probe['balance']}"
    )


if __name__ == "__main__":
    main()
