"""A2/J4 — sparse retrieval: explicit TF-IDF postings + inverted-index join.

The reference delegates this to an embedded text-index library (behavior:
index build api/index_versioning.py:435-485, query ai_worker.py:202-229).
Spark restatement: postings ARE a DataFrame — `explode(split(...))` →
`groupBy(term, doc)` for tf, `groupBy(term)` over distinct docs for df,
idf = ln((N+1)/(df+1)) + 1 (smoothed), score(q, d) = Σ tf·idf over shared
terms (a shuffle hash join on term + sum agg).

Scale notes: postings build is one shuffle; scoring joins the (small) query
term set → broadcast. Map-side partial aggregation applies to both groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) bag — lowercase whitespace tokenization (matches the SQL
    oracle exactly; the byte-identical path uses the UDF tokenizer)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " +")).alias("token"),
    ).filter(F.col("token") != "")


def build_postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(token, doc_id, tf, idf, tf_idf)."""
    toks = tokenize(docs, text_col, id_col)
    n_docs = docs.count()
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df_t.withColumn(
        "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1.0)) + 1.0
    )
    return tf.join(idf, "token").withColumn("tf_idf", F.col("tf") * F.col("idf"))


def score_query(postings: DataFrame, query_terms: list[str], top_k: int = 10) -> DataFrame:
    """Top-k docs by Σ tf·idf over the query's terms. Query side is a tiny
    literal table → broadcast join; deterministic tie-break on doc_id."""
    spark = postings.sparkSession
    q = spark.createDataFrame([(t.lower(),) for t in query_terms], ["token"]).distinct()
    scored = (
        postings.join(F.broadcast(q), "token")
        .groupBy("doc_id")
        .agg(F.round(F.sum("tf_idf"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
