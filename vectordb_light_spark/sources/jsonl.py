"""JSONL corpus source — the de-facto interchange format of LLM
training datasets (one JSON document per line).

The reference ingests only local office files (SURVEY §2.1); a
100 TB training corpus arrives as JSONL dumps. This source reads them
schema-first with corrupt-line QUARANTINE instead of job failure —
the same drop-don't-fail policy as the reference's file extractor
(S12, reference document_processor.py:242-288), but with the rejects
returned as a DataFrame so the pipeline can count/inspect them.

Scale: the reader is Spark's native JSON scan (JVM, splittable on
uncompressed/zstd-seekable files); an explicit schema avoids the
full inference pre-pass, and column pruning applies as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SCHEMA = "doc_id long, text string, lang string, source string"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    *,
    schema: str = DEFAULT_SCHEMA,
    min_text_chars: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → (documents, rejects).

    - Lines that parse and carry ≥ ``min_text_chars`` of text land in
      ``documents`` (schema exactly ``schema``).
    - Unparseable lines land in ``rejects`` as their raw text
      (PERMISSIVE mode's corrupt-record column), parsed-but-empty
      docs as nulls-with-raw-absent — both counted, neither fatal.

    The input is persisted before the corrupt-record split: Spark
    forbids filtering on the corrupt column straight off the scan
    (the parser would need re-running per filter), and the persist
    also means ONE parse feeds both outputs.
    """
    from vectordb_light_spark.session import persist_if_batch

    raw = (
        spark.read.schema(f"{schema}, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    raw = persist_if_batch(raw)
    parsed = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    good = parsed.where(
        F.length(F.coalesce(F.col("text"), F.lit(""))) >= min_text_chars
    )
    rejects = raw.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    ).unionByName(
        parsed.where(
            F.length(F.coalesce(F.col("text"), F.lit(""))) < min_text_chars
        ).select(F.to_json(F.struct("*")).alias("raw_line"))
    )
    return good, rejects
