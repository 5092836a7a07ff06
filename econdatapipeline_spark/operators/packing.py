"""Training-batch assembly operators: sequence packing, chunking, scrubbing.

The reference has no training-data layer (its surface stops at
normalized economic series — see SURVEY §2.10); these are the
operations a large-scale LLM corpus pipeline runs after dedup/quality
gating, built as pure column programs so they stay inside codegen at
100 TB:

- ``pack_sequences``: assign documents to fixed token-budget training
  sequences. Deterministic contiguous packing — order documents by a
  stable key, running token total, bin = floor(cumsum / budget). One
  window over one global ordering; at cluster scale the ordering key
  is a (shard, id) pair so the window partitions by shard and packing
  is embarrassingly parallel per shard.
- ``chunk_documents``: split text into overlapping fixed-size token
  windows (embedding-model context prep). ``sequence()`` + ``explode``
  + ``slice`` on the token array — no UDF, linear in output size.
- ``scrub_pii``: regex redaction of emails / phone numbers / SSN-ish
  patterns, chained ``regexp_replace`` (vectorized, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import tokenize


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """(id, tokens) -> (id, tokens, seq_id): contiguous token packing.

    Documents are laid out in ``id`` order; a running pre-sum of token
    counts assigns each document the sequence index
    ``floor(tokens_before / budget)`` — the deterministic "concat then
    cut every `budget` tokens" layout used by most pretraining loaders
    (documents are not reordered to minimize padding; that variant is
    bin-packing and non-deterministic under parallelism).

    With ``shard_col`` the window partitions by shard — no global sort,
    each shard packs independently (the 100 TB shape: shard = input
    file / date bucket). Without it, a single-partition window is the
    honest semantics of one global stream; range-partitioned sort keeps
    it distributed until the final running sum.
    """
    part = [shard_col] if shard_col else []
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy(*part).orderBy(id_col)
        if part
        else Window.orderBy(id_col)
    )
    toks = F.coalesce(F.size(tokenize(F.col(text_col))), F.lit(0))
    before = F.coalesce(
        F.sum(toks).over(win.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    out_cols = ([F.col(shard_col)] if shard_col else []) + [
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
        F.floor(before / F.lit(budget)).cast("long").alias("seq_id"),
        (before % F.lit(budget)).cast("long").alias("seq_offset"),
    ]
    return df.select(*out_cols)


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Stride = chunk_size - overlap. Chunk k covers tokens
    [k*stride, k*stride + chunk_size). The last chunk may be short;
    empty documents produce no chunks. All array ops (sequence,
    transform, slice) are built-ins — the explode is the only
    row-multiplying step and is pipelined, never shuffled.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # ceil((n-overlap)/stride), floored at 1 so short docs still emit
    # their single (partial) chunk; 0 only for genuinely empty input.
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)))
    )
    chunk_idx = F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1))
    with_idx = df.select(
        F.col(id_col), toks.alias("_toks"), chunk_idx.alias("chunk_id")
    )
    start = F.col("chunk_id") * stride  # 0-based; slice() is 1-based
    return with_idx.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), start + 1, chunk_size)
        ).alias("chunk_text"),
        F.least(F.size(F.col("_toks")) - start, F.lit(chunk_size))
        .cast("long")
        .alias("chunk_tokens"),
    )


# Precedence matters: emails first (their local part can look like a
# phone), then SSN-ish, then phones (longest-match forms first).
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PHONE = (
    # no leading \b: it cannot match before '(' (paren is non-word, like
    # the space preceding it); the digit branch carries its own boundary
    r"(?:\+?1[-. ])?(?:\([0-9]{3}\)[-. ]?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b"
)


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact emails / SSNs / US-style phone numbers from a text column.

    Chained regexp_replace — single narrow projection, whole-stage
    codegen, no UDF. The pattern set is deliberately conservative
    (high-precision forms only); corpus pipelines layer domain filters
    on top rather than widening these regexes and mangling prose.
    """
    out = out_col or text_col
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), _EMAIL, "<EMAIL>"),
            _SSN,
            "<SSN>",
        ),
        _PHONE,
        "<PHONE>",
    )
    return df.withColumn(out, scrubbed)


_CARD = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"


def scrub_cards(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Redact Luhn-VALID card-like digit runs -> ``out_col`` (default
    in-place) with each hit replaced by ``<CARD>``.

    The checksum gate is the point: a bare 13-19-digit regex redacts
    order ids, timestamps, and phone-number runs wholesale; validating
    the Luhn check digit first (functions/text.luhn_valid) keeps
    precision high, which is why every production scrubber (e.g. the
    public presidio/scrubadub designs) gates card redaction on it.

    Shape: regexp_extract_all finds candidates, list-filter keeps the
    Luhn-valid ones, and one string fold replaces them — a single
    narrow codegen projection, no UDF, no shuffle."""
    from econdatapipeline_spark.functions.text import luhn_valid

    out = out_col or text_col
    candidates = F.filter(
        F.regexp_extract_all(F.col(text_col), F.lit(_CARD), 0),
        lambda c: luhn_valid(c),
    )
    scrubbed = F.aggregate(
        candidates,
        F.col(text_col),
        lambda acc, c: F.replace(acc, c, F.lit("<CARD>")),
    )
    return df.withColumn(out, scrubbed)
