"""Structured Streaming ingest into an encoded table.

Spark rendering of the reference's buffer-then-flush listener lifecycle
(O18: tables buffered per run, flushed on step completion,
/root/reference/Parquet/ParquetResultListener.cs:107-117,89-105): a
micro-batch is the "buffered table", `foreachBatch` the flush, and the
manifest snapshot commit the artifact publish (O19).

Exactly-once: epoch k writes part ids [k*n_parts, (k+1)*n_parts).  When
Structured Streaming re-delivers an epoch after a crash, those part ids
are already in the committed snapshot and `write_encoded` skips them —
the sink is idempotent, so checkpoint + manifest give end-to-end
exactly-once without any sink-side transaction log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .engine import DEFAULT_ROWS_PER_CHUNK
from .manifest import write_encoded


def encode_stream(stream_df: DataFrame, table_path: str,
                  checkpoint_dir: str,
                  key: list[str] | None = None, n_parts: int = 4,
                  codec: str = "auto",
                  rows_per_chunk: int = DEFAULT_ROWS_PER_CHUNK,
                  trigger_available_now: bool = True,
                  branch: str | None = None):
    """Start a streaming query encoding micro-batches into the table.

    `branch="name"` makes the ingest a WAP pipeline: every micro-batch
    commit is STAGED on the branch (published readers never see a
    partial stream), audited via `ref=` reads, and atomically released
    with `publish_branch` when the operator signs off — the
    audit-gated ingest pattern.  Epoch idempotency is unchanged: the
    branch head's committed parts drive the skip.

    Returns the StreamingQuery; callers own awaitTermination/stop."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_encoded(batch_df, table_path, key=key, n_parts=n_parts,
                      codec=codec, rows_per_chunk=rows_per_chunk,
                      part_offset=int(epoch_id) * n_parts,
                      branch=branch)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    ttl_ms: int | None = None) -> DataFrame:
    """Cross-batch exact dedup: emit each distinct text digest once —
    a custom stateful operator via applyInPandasWithState.

    State is one flag per digest group; a digest seen in any earlier
    micro-batch emits nothing.  Within a batch the lowest id wins (the
    reference-style keeper rule, cf. textops.dedup.exact_dedup).

    `ttl_ms` bounds the state store for unbounded digest spaces: a
    digest idle for longer than the TTL is evicted (processing-time
    timeout), after which a re-occurrence is emitted again — the
    standard recall-vs-state trade of windowed dedup.  At 10^12 docs
    the state store shards by digest hash across executors and the TTL
    keeps each shard O(active window), not O(stream)."""
    from pyspark.sql import functions as SF
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"digest string, {id_col} long"
    state_schema = "seen int"
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def dedup_fn(key, pdfs, state):
        import pandas as pd
        if ttl_ms and state.hasTimedOut:
            state.remove()  # evicted: digest may be emitted again later
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf[id_col].min())
                best = m if best is None else min(best, m)
        seen = state.exists
        if ttl_ms:
            if not seen:
                state.update((1,))
            state.setTimeoutDuration(ttl_ms)  # slide the TTL on activity
        elif not seen:
            state.update((1,))
        if seen or best is None:
            return
        yield pd.DataFrame({"digest": [key[0]], id_col: [best]})

    return (stream_df
            .withColumn("digest", SF.md5(SF.col(text_col)))
            .groupBy("digest")
            .applyInPandasWithState(dedup_fn, out_schema, state_schema,
                                    "update", timeout))


def windowed_ingest_stats(stream_df: DataFrame, ts_col: str = "warc_ts",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed ingest statistics with a late-data watermark.

    Per (window, lang) doc counts and byte volume — the monitoring feed
    a crawl-ingest pipeline tails.  The watermark bounds state: windows
    older than max(event_time) - watermark are finalized and dropped
    from the store, so state size is O(active windows), not O(stream)."""
    from pyspark.sql import functions as SF
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(SF.window(ts_col, window).alias("w"), "lang")
            .agg(SF.count(SF.lit(1)).alias("n_docs"),
                 SF.sum(SF.octet_length("text")).alias("text_bytes"))
            .select(SF.col("w.start").alias("window_start"), "lang",
                    "n_docs", "text_bytes"))


def file_stream(spark: SparkSession, input_dir: str, schema_ddl: str,
                max_files_per_trigger: int = 1) -> DataFrame:
    """Parquet-directory source with bounded per-batch file count."""
    return (spark.readStream
            .schema(schema_ddl)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")  # dataset dirs nest files
            .parquet(input_dir))
