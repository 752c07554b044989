"""Streaming watch-folder ingest — the reference's 500 ms QTimer
directory poll (S14, reference gui_tabs_databases.py:253-257)
re-expressed as the thing it actually is: a file-source stream with
incremental index maintenance.

    spark.readStream (file source, wholetext)
      → foreachBatch: chunk → normalize → embed → APPEND to the
        database's vectors parquet
      → checkpointLocation gives exactly-once file processing across
        restarts (the reference's resume machinery,
        stage_tokenize.py:341-382, collapses into this).

Each micro-batch runs the SAME build_chunks/build_vectors operators
as the batch write path — one code path, two execution modes. The
trigger is the knob: ``availableNow`` drains the backlog and stops
(used in tests and backfills); ``processingTime='500 milliseconds'``
reproduces the reference's polling cadence for a live folder.

Scale: the file source lists incrementally (maxFilesPerTrigger bounds
batch size); appends are new parquet files only — no rewrite of
existing data; downstream readers see them on the next query. Text
formats stream via the wholetext text source; binary formats would
use the same pipeline behind a binaryFile batch re-list (Spark's file
stream source handles text-like formats natively).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectordb_light_spark.operators.ingest import IngestConfig, build_chunks, build_vectors


def watch_folder_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    glob: str = "*.{txt,md}",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S14: streaming scan of a document folder (text formats).

    Returns a streaming DataFrame with the same column contract the
    batch extractor produces (file_path, file_type, file_name, text,
    hash, document_type), so everything downstream is shared."""
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(source_dir).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("file_path"),
    )
    return raw.where(F.trim("text") != "").select(
        "file_path",
        F.lower(F.regexp_extract("file_path", r"(\.[^./\\]+)$", 1)).alias("file_type"),
        F.element_at(F.split("file_path", "/"), -1).alias("file_name"),
        "text",
        F.sha2(F.col("text"), 256).alias("hash"),
        F.lit("document").alias("document_type"),
    )


def start_incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    db_path: str,
    cfg: IngestConfig = IngestConfig(),
    *,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    processing_time: str = "500 milliseconds",
) -> StreamingQuery:
    """Maintain <db_path>/vectors incrementally from a watched folder.

    foreachBatch reuses the batch operators verbatim; the vectors
    parquet grows by append-only files. ``available_now=True`` drains
    and terminates (deterministic for tests/backfill); otherwise runs
    at the reference's 500 ms cadence."""
    checkpoint_dir = checkpoint_dir or os.path.join(db_path, "_checkpoint")
    vectors_dir = os.path.join(db_path, "vectors")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = build_chunks(batch_df, cfg)
        vectors = build_vectors(chunks, cfg)
        vectors.write.mode("append").parquet(vectors_dir)

    stream = watch_folder_stream(spark, source_dir)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
