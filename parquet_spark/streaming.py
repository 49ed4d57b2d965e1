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
                  trigger_available_now: bool = True):
    """Start a streaming query encoding micro-batches into the table.

    Returns the StreamingQuery; callers own awaitTermination/stop."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_encoded(batch_df, table_path, key=key, n_parts=n_parts,
                      codec=codec, rows_per_chunk=rows_per_chunk,
                      part_offset=int(epoch_id) * n_parts)

    writer = (stream_df.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def file_stream(spark: SparkSession, input_dir: str, schema_ddl: str,
                max_files_per_trigger: int = 1) -> DataFrame:
    """Parquet-directory source with bounded per-batch file count."""
    return (spark.readStream
            .schema(schema_ddl)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")  # dataset dirs nest files
            .parquet(input_dir))
