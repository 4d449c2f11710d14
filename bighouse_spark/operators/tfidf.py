"""Generic TF-IDF top-k keyword extraction over any (id, text) table.

Shared by the ``text_tfidf_topk`` registry query and the
``tfidfTopK()`` SQL table function (``dialect/transpile.py``), so the
SQL surface and the Python surface execute the identical plan.

Scale shape (same analysis as ``queries/textops2.py``): explode →
one (doc, term) count table materialized once (tracked persist,
released at the request boundary by ``engine.execute``); document
frequency and the corpus document count both derive from that table
instead of rescanning the corpus; df and n_docs broadcast into the
scoring join; one window on doc_id for the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bighouse_spark.functions.text import tokens
from bighouse_spark.operators.caching import tracked_persist


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, tfidf, rk)
    with a deterministic term tiebreak (score desc, term asc)."""
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = tracked_persist(
        exploded.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("doc_id").alias(id_col), "term", "tfidf", "rk"
        )
    )
