"""Cross-document exact substring-span deduplication.

Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better") removes every >= k-token substring that occurs twice in the
corpus, using a single-machine suffix array. The distributed
re-expression: slide a k-token window over every document, key windows
by content, and any window whose content appears in >= ``min_docs``
distinct documents marks its k token positions as duplicated. Per-doc
coverage (union of marked windows) is the curation signal — documents
whose duplicated-token fraction exceeds a threshold are flagged, and
``duplicate_spans`` materializes the merged duplicated intervals for
surgical span removal.

Scale shape: windowing is a scan-stage expression (arrays_zip slices —
no per-position Python); the duplicate-window test is one xxhash64
hash-aggregate with map-side combine; coverage re-joins windows to the
duplicate-key set by hash (never the strings) and counts distinct
covered positions, a k-bounded explode. Nothing is quadratic; the
suffix array's global sort is replaced by hash grouping, which is the
shape that distributes.

Tokenization and the shorter-than-k collapse (whole doc as one window)
follow functions.text.word_ngrams so the SQL oracle replays the exact
window inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import tokenize, word_ngrams
from econdatapipeline_spark.sources.tables import fan_out


def _windows(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, n_tokens, pos, whash) — one row per k-token window."""
    return fan_out(df).select(
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).alias("n_tokens"),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos", "win"),
    ).select(
        id_col, "n_tokens", "pos", F.xxhash64("win").alias("whash")
    )


def _dup_windows(
    df: DataFrame, k: int, min_docs: int, text_col: str, id_col: str
) -> DataFrame:
    """Windows whose content occurs in >= min_docs distinct documents."""
    wins = _windows(df, k, text_col, id_col)
    dup = (
        wins.groupBy("whash")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("whash")
    )
    return wins.join(dup, "whash")


def _coverage(dup_wins: DataFrame, k: int, id_col: str) -> DataFrame:
    """(id, t) — distinct duplicated token positions per document."""
    return dup_wins.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.col("pos"),
                F.least(F.col("pos") + (k - 1), F.col("n_tokens") - 1),
            )
        ).alias("t"),
    ).distinct()


def substring_dup_stats(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    flag_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring coverage.

    Output: (id, n_tokens, dup_tokens, dup_frac, flagged) for EVERY
    document — dup_tokens is the size of the union of all k-token
    windows shared verbatim with >= min_docs - 1 other documents.
    """
    base = df.select(
        F.col(id_col), F.size(tokenize(F.col(text_col))).alias("n_tokens")
    )
    # countDistinct (not distinct + count): one shuffle with map-side
    # partial dedup instead of a distinct exchange followed by a
    # count exchange
    dup_wins = _dup_windows(df, k, min_docs, text_col, id_col)
    cov = (
        dup_wins.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.col("pos"),
                    F.least(F.col("pos") + (k - 1), F.col("n_tokens") - 1),
                )
            ).alias("t"),
        )
        .groupBy(id_col)
        .agg(F.countDistinct("t").alias("dup_tokens"))
    )
    frac = F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens").cast(
        "double"
    )
    return base.join(cov, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        F.round(frac, 6).alias("dup_frac"),
        (frac >= flag_frac).alias("flagged"),
    )


def duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged duplicated intervals per document.

    Output: (id, span_start, span_end, span_len) — maximal runs of
    consecutive duplicated token positions (gaps-and-islands over the
    coverage set; the window shuffles one row per duplicated position
    per doc, already the minimal interval input).
    """
    cov = _coverage(_dup_windows(df, k, min_docs, text_col, id_col), k, id_col)
    w = Window.partitionBy(id_col).orderBy("t")
    islands = cov.withColumn(
        "island", F.col("t") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("t").cast("long").alias("span_start"),
            F.max("t").cast("long").alias("span_end"),
            F.count("*").cast("long").alias("span_len"),
        )
        .drop("island")
    )
