"""Term-weighting / retrieval scoring over the ``documents`` table: TF-IDF
top terms per document and BM25 ranking against a fixed term set.

Cross-engine float discipline (what makes these oracle-hashable): every
arithmetic step is an IEEE-754 correctly-rounded op (``+ - * /``) over
identical inputs, combined in a FIXED expression-tree order on both sides.
``ln``-based IDF is deliberately replaced by its argument ratio
``(N - df + 0.5) / (df + 0.5)`` — same ranking (the log is monotonic), but
bit-identical across engines, where ``ln`` is only within-1-ulp. Unordered
float SUMs are avoided the same way: per-term contributions pivot to columns
and add in fixed left-to-right order. DuckDB decimal literals are cast to
DOUBLE explicitly (a bare ``0.5`` is DECIMAL there, DOUBLE in Spark).

Scale design: token explode -> hash-agg (map-side combined) for TF; the DF
and N sides are tiny aggregates broadcast into the scoring join; top-k per
doc is a bounded window; nothing shuffles document text.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evolution_spark.functions.text import norm_text as _norm_text
from evolution_spark.queries.base import query, table

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# BM25 constants, written as the exact decimal literals both engines parse to
# the same double (k1=1.2, b=0.75 -> k1+1=2.2, 1-b=0.25 pre-folded so neither
# engine's constant folder changes the tree).
_BM25_TERMS = ("query", "vector", "stream")


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word, tf, score FROM (
      SELECT t.doc_id, t.word, t.tf,
             t.tf * ((n.n_docs - d.df + CAST(0.5 AS DOUBLE))
                     / (d.df + CAST(0.5 AS DOUBLE))) AS score,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ((n.n_docs - d.df + CAST(0.5 AS DOUBLE))
                                / (d.df + CAST(0.5 AS DOUBLE))) DESC, t.word
             ) AS rn
      FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (probabilistic-IDF ratio form —
    monotone in the standard ln-IDF, exact across engines; see module doc).

    Plan: TF = explode + hash-agg on (doc_id, word); DF re-aggregates TF
    (word-only, tiny -> broadcast); N is a scalar broadcast; top-3 is a
    per-doc window over <= vocabulary-size rows."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.select(F.count(F.lit(1)).alias("n_docs"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "word", "tf", (F.col("tf") * idf).alias("score"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    )
    return scored.withColumn("rn", rn).where(F.col("rn") <= 3).select(
        "doc_id", "word", "tf", "score"
    )


def _bm25_contrib_sql() -> str:
    return (
        "((n.n_docs - d.df + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE)))"
        " * (t.tf * CAST(2.2 AS DOUBLE))"
        " / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)"
        "    + CAST(0.75 AS DOUBLE) * (l.dl / a.avgdl)))"
    )


@query(
    "bm25_rank",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), dls AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), a AS (
      SELECT CAST(SUM(dl) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dls
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    contrib AS (
      SELECT t.doc_id, t.word, {_bm25_contrib_sql()} AS c
      FROM tf t JOIN dfreq d USING (word) JOIN dls l USING (doc_id)
      CROSS JOIN a CROSS JOIN n
      WHERE t.word IN ('query', 'vector', 'stream')
    )
    SELECT doc_id, c_query, c_vector, c_stream,
           c_query + c_vector + c_stream AS bm25
    FROM (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN word = 'query'  THEN c END), CAST(0 AS DOUBLE)) AS c_query,
             COALESCE(MAX(CASE WHEN word = 'vector' THEN c END), CAST(0 AS DOUBLE)) AS c_vector,
             COALESCE(MAX(CASE WHEN word = 'stream' THEN c END), CAST(0 AS DOUBLE)) AS c_stream
      FROM contrib GROUP BY doc_id
    )
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def bm25_rank(spark, sf_dir):
    """Top-10 documents by BM25 (k1=1.2, b=0.75) for the fixed term set
    ('query', 'vector', 'stream'); IDF in ratio form (module doc). Per-term
    contributions pivot to columns and sum left-to-right so the float
    addition order is identical in both engines.

    Plan: same TF/DF/N broadcasts as TF-IDF plus a doc-length aggregate;
    the term filter cuts the scored frame to |terms| rows per doc before the
    pivot; final top-10 is TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    dls = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dls.select((F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl"))
    n = d.select(F.count(F.lit(1)).alias("n_docs"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    c = idf * (F.col("tf") * F.lit(2.2)) / (
        F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl")))
    )
    contrib = (
        tf.where(F.col("word").isin(*_BM25_TERMS))
        .join(F.broadcast(dfreq), "word")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n))
        .select("doc_id", "word", c.alias("c"))
    )
    zero = F.lit(0).cast("double")
    pivoted = contrib.groupBy("doc_id").agg(
        F.coalesce(F.max(F.when(F.col("word") == "query", F.col("c"))), zero).alias("c_query"),
        F.coalesce(F.max(F.when(F.col("word") == "vector", F.col("c"))), zero).alias("c_vector"),
        F.coalesce(F.max(F.when(F.col("word") == "stream", F.col("c"))), zero).alias("c_stream"),
    )
    return (
        pivoted.select(
            "doc_id", "c_query", "c_vector", "c_stream",
            (F.col("c_query") + F.col("c_vector") + F.col("c_stream")).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )
