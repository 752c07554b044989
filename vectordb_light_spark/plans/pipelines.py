"""End-to-end pipeline plans — declarative compositions of the
engine's operators into the jobs a user actually runs.

Each plan is a pure DataFrame→DataFrame function (no I/O except where
noted), so Catalyst sees ONE logical plan per pipeline and optimizes
across operator boundaries: filters reorder ahead of the dedup
shuffle, column pruning reaches the scan, and the whole pre-shuffle
prefix fuses into one codegen stage.

    rag_ingest_plan        reference write path (§3.1) minus the sinks
    training_corpus_plan   the 100 TB training-data curation pipeline:
                           quality gate → lang filter → exact dedup →
                           near-dup removal (MinHash-LSH)
    corpus_report_plan     per-language quality/dedup observability
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_light_spark.functions.text import lang_id, quality_score
from vectordb_light_spark.operators.dedup import exact_dedup, minhash_dedup
from vectordb_light_spark.operators.ingest import IngestConfig, build_chunks, build_vectors


def rag_ingest_plan(documents: DataFrame, cfg: IngestConfig = IngestConfig()) -> DataFrame:
    """Documents → embedded chunk vectors (the reference's §3.1 write
    path as one logical plan; operators.ingest.create_database adds
    the sinks/atomicity around this)."""
    return build_vectors(build_chunks(documents, cfg), cfg)


def training_corpus_plan(
    documents: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: list[str] | None = None,
    near_dup_threshold: float | None = 0.9,
) -> DataFrame:
    """Training-data curation: quality gate → language filter → exact
    dedup (min-id survivor) → optional MinHash-LSH near-dup removal.

    Order is the cost order: the cheap JVM-side quality/language
    predicates run in the scan stage and shrink the corpus BEFORE any
    shuffle; exact dedup shuffles only a 64-bit key; the LSH tier runs
    last on the smallest surviving set. Adds ``quality`` and
    ``detected_lang`` columns to the output.
    """
    gated = (
        documents.withColumn("quality", quality_score(text_col))
        .withColumn("detected_lang", lang_id(text_col))
        .where(F.col("quality") >= F.lit(min_quality))
    )
    if languages:
        gated = gated.where(F.col("detected_lang").isin(languages))
    deduped = exact_dedup(gated, text_col=text_col, id_col=id_col)
    if near_dup_threshold is not None:
        deduped = minhash_dedup(
            deduped, text_col=text_col, id_col=id_col, threshold=near_dup_threshold
        )
    return deduped


def corpus_report_plan(documents: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Per-language corpus observability: document counts, mean
    quality, duplicate counts — the counters the reference logs
    per-stage (SURVEY §5), as one queryable aggregate."""
    from vectordb_light_spark.operators.dedup import canonical_text

    keyed = documents.select(
        lang_id(text_col).alias("detected_lang"),
        quality_score(text_col).alias("quality"),
        F.sha2(canonical_text(text_col), 256).alias("k"),
    )
    return (
        keyed.groupBy("detected_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            (F.count(F.lit(1)) - F.countDistinct("k")).alias("n_exact_dups"),
        )
        .orderBy("detected_lang")
    )
