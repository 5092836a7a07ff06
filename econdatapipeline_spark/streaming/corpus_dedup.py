"""Streaming near-dup screening against a standing corpus + an
idempotent append sink.

The streaming face of the incremental-dedup story
(operators/dedup.minhash_lsh_cross): documents arrive as a stream and
are screened against a STATIC banded index of the standing corpus.
Everything on the stream side is stateless per-row column expressions —
the signature comes from functions.text.minhash_signature (array HOF
form, no aggregation), bands from minhash_bands, so no streaming
aggregation state exists at all; the only stateful operator is the
optional within-watermark candidate dedup. The stream-static join
probes the corpus index per micro-batch exactly like
joins.enrich_stream probes a dimension.

At 100 TB the banded corpus index is the materialized artifact the
batch path already maintains (write_clustered on band_key makes the
probe a pruned scan); the stream only ever shingles ITSELF.

``idempotent_append_sink`` closes the operational gap of plain
foreachBatch appends: foreachBatch gives at-least-once side effects, so
a post-write pre-checkpoint crash replays the batch on restart and a
blind append would duplicate it. The sink records each committed batch
id in the warehouse blob area and skips batches already marked —
batch-id + ledger = exactly-once appends, the pattern Structured
Streaming's docs prescribe for non-transactional sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from econdatapipeline_spark.functions.text import (
    minhash_bands,
    minhash_signature,
    shingles,
)
from econdatapipeline_spark.sources.warehouse import Warehouse

COMMITS_CONTAINER = "stream-commits"


def banded_corpus_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_key) static index of the standing corpus.

    Row-expression MinHash (no aggregation), so the identical builder
    also runs on a stream. Persist the result via
    ``Warehouse.write_clustered(..., ["band_key"])`` in production.
    """
    rows = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col)), num_hashes)
    return corpus.select(
        F.col(id_col),
        F.posexplode(minhash_bands(sig, bands, rows)).alias("band_idx", "band_key"),
    )


def stream_near_dup_candidates(
    stream_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 16,
    bands: int = 4,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(id_left, id_right, ts) candidate pairs: stream doc vs corpus doc.

    Stream side: shingle -> row-expression MinHash -> band explode (all
    stateless) -> inner stream-static join on (band_idx, band_key) ->
    within-watermark dedup of (id_left, id_right), since two shared
    bands yield the same pair twice and unbounded distinct is illegal
    on a stream. Works identically on a batch frame (the unified-model
    convention of this package), where the dedup is a plain
    dropDuplicates.
    """
    rows = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col)), num_hashes)
    banded = stream_docs.select(
        F.col(id_col).alias("id_left"),
        F.col(ts_col).alias("ts"),
        F.posexplode(minhash_bands(sig, bands, rows)).alias("band_idx", "band_key"),
    )
    # the index id column is whatever banded_corpus_index was built
    # with (its id_col param) — the single non-band column
    corpus_id = [
        c for c in corpus_index.columns if c not in ("band_idx", "band_key")
    ][0]
    idx = corpus_index.select(
        F.col(corpus_id).alias("id_right"), "band_idx", "band_key"
    )
    cands = banded.join(idx, ["band_idx", "band_key"]).select(
        "id_left", "id_right", "ts"
    )
    if cands.isStreaming:
        return cands.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["id_left", "id_right"]
        )
    return cands.dropDuplicates(["id_left", "id_right"])


def idempotent_append_sink(
    stream: DataFrame,
    wh: Warehouse,
    table: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """writeStream -> exactly-once appends via a batch-id commit ledger.

    foreachBatch replays a batch when a crash lands between the side
    effect and the checkpoint write. The append is made IDEMPOTENT
    rather than merely marked: each batch's files land under
    deterministic batch-prefixed names via replace (never blind
    append), and a replay first clears that batch's files — so a crash
    at ANY point (mid-write, pre-marker) replays to the identical
    final state with no duplicated rows. The marker blob then only
    short-circuits the recompute.

    Markers are scoped by the streaming QUERY ID read from the
    checkpoint's ``metadata`` file: a genuine crash-replay restarts
    from the same checkpoint (same query id, same batch id — marker
    hits, batch skipped), while a deleted-and-recreated checkpoint
    mints a new query id, so its restarted batch 0 — which carries NEW
    data — is never mistaken for the old run's batch 0 (that mistake
    is silent data loss).
    """
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    wh.create_container(COMMITS_CONTAINER)

    def query_id() -> str:
        # written by Spark at query start, before the first batch runs;
        # stable for the checkpoint's lifetime, regenerated with it
        try:
            with open(os.path.join(checkpoint_dir, "metadata")) as fh:
                return json.load(fh).get("id", "")
        except (OSError, ValueError):
            return ""

    def append_once(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"{table}/run_{query_id()}_batch_{batch_id}"
        if wh.get_blob(COMMITS_CONTAINER, marker) is not None:
            return
        dest = wh.path(table)
        # staging and final names carry the run id too: a recreated
        # checkpoint's batch 0 must never clear or collide with the
        # old incarnation's batch-0 files
        run_tag = f"run{query_id()}-batch{batch_id}"
        staging = f"{dest}__{run_tag}"
        batch_df.write.mode("overwrite").parquet(staging)
        os.makedirs(dest, exist_ok=True)
        prefix = f"{run_tag}-"
        # a replay of a half-moved batch starts clean
        for name in os.listdir(dest):
            if name.startswith(prefix):
                os.remove(os.path.join(dest, name))
        for name in sorted(os.listdir(staging)):
            if name.endswith(".parquet"):
                os.replace(
                    os.path.join(staging, name),
                    os.path.join(dest, prefix + name),
                )
        shutil.rmtree(staging, ignore_errors=True)
        wh.put_blob(COMMITS_CONTAINER, marker, b"committed")

    writer = stream.writeStream.foreachBatch(append_once).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
