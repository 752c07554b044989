"""SQL surface (vectordb_light_spark/sql.py): the engine driven from
spark.sql — views, pandas-UDF normalizers, and pure-SQL vector math."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_light_spark.sql import SQL_IDIOMS, register_sql_surface

SF = "/root/testdata/sf0.001"


def test_sql_flagship_search_equals_dataframe_api(spark):
    """Top-6 cosine written as pure SQL (native higher-order
    functions, zero UDFs) equals the DataFrame-API topk_cosine."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.session import load_table

    register_sql_surface(spark, SF)
    sim = SQL_IDIOMS["similarity_clipped"].format(
        a="e.embedding", b="q.qv"
    )
    got = spark.sql(f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, ROUND({sim}, 6) AS similarity_score
        FROM embeddings e, q
        ORDER BY similarity_score DESC, e.vec_id
        LIMIT 6
    """).collect()

    emb = load_table(spark, SF, "embeddings")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    want = topk_cosine(
        emb, qv, SearchParams(k=6, threshold=0.0, assume_normalized=True),
        id_col="vec_id", vec_col="embedding",
    ).collect()
    assert [(r["vec_id"], r["similarity_score"]) for r in got] == [
        (r["vec_id"], round(r["similarity_score"], 6)) for r in want
    ]


def test_sql_normalizer_udf_matches_python(spark):
    from vectordb_light_spark.functions.text import normalize_text_py

    register_sql_surface(spark)
    raw = "A weird​ text\r\nwith   runs\n\n\n\nand\ttabs"
    got = spark.sql(
        "SELECT vdb_normalize_text(x) AS n FROM VALUES ('%s') AS t(x)"
        % raw.replace("'", "''")
        .replace("\\", "\\\\")
        .replace("\r", "\\r")
        .replace("\n", "\\n")
        .replace("\t", "\\t")
    ).first()["n"]
    assert got == normalize_text_py(raw)


def test_sql_idioms_norm(spark):
    register_sql_surface(spark)
    norm = SQL_IDIOMS["l2norm"].format(a="array(3D, 4D)")
    assert spark.sql(f"SELECT {norm} AS n").first()["n"] == 5.0
