package graft.scale

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance ranking over the documents corpus: TF-IDF term
  * weighting and BM25 retrieval — the two standard scoring functions a
  * training-data pipeline needs for corpus search, query-based filtering,
  * and boilerplate-aware term weighting.
  *
  * Scale shape (100 TB): both queries are token-explode map stages feeding
  * hash aggregates. TF-IDF shuffles token rows twice (doc-term tf, then
  * term df) and joins tf⋈df on the token — the vocabulary-sized side is
  * the small one at web scale, so AQE picks a broadcast there; corpus
  * stats (N, avgdl) are single-row aggregates broadcast via crossJoin.
  * BM25 filters to the query's terms BEFORE the shuffle, so the heavy
  * token stream is pruned at the map side and per-term tf columns are
  * conditional aggregates (fixed addition order — deterministic doubles
  * across engines).
  */
object Ranking {

  /** TF-IDF top-3 terms per document. idf = ln((N+1)/(df+1)) + 1 (the
    * smoothed form that never zeroes a term present everywhere); ties on
    * score break by token so the cutoff is deterministic. */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    // df = docs-per-token, derived FROM the tf aggregate: one row per
    // (doc, tok) already exists there, so this reuses tf's exchange
    // instead of re-scanning + re-distincting the token stream (the
    // corpus is the 100 TB side; one less full pass over it)
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"))
  }

  val tfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.tok, tf.tf,
       |    tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1) AS tfidf,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |                       ORDER BY tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1) DESC,
       |                                tf.tok) AS rank
       |  FROM tf JOIN df USING (tok) CROSS JOIN n)
       |SELECT doc_id, CAST(rank AS INT) AS rank, tok, tf,
       |  round(tfidf, 6) + 0 AS tfidf
       |FROM scored WHERE rank <= 3""".stripMargin

  /** BM25 (k1=1.2, b=0.75) of the fixed query "hash join window" — top-20
    * documents. Per-term tf columns are conditional aggregates so the
    * 3-term score is summed in a fixed order (bit-identical across
    * engines); idf is the standard ln(1 + (N-df+0.5)/(df+0.5)). */
  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("hash", "join", "window")
    val k1 = 1.2; val b = 0.75
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val tfCols = count(lit(1)).as("dl") +:
      terms.map(t => sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val perDoc = toks.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val corpusCols = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val corpus = perDoc.agg(corpusCols.head, corpusCols.tail: _*)
    val withStats = perDoc.crossJoin(broadcast(corpus))
    def termScore(t: String) = {
      val tf = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
      idf * tf * lit(k1 + 1) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    val score = terms.map(termScore).reduceLeft(_ + _)
    withStats
      .withColumn("bm25", round(score, 6))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("dl"),
        col("tf_hash"), col("tf_join"), col("tf_window"), col("bm25"))
  }

  val bm25Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS dl,
       |    CAST(sum(CASE WHEN tok = 'hash'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_hash,
       |    CAST(sum(CASE WHEN tok = 'join'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
       |    CAST(sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
       |  FROM toks GROUP BY 1),
       |corpus AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
       |    sum(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS df_hash,
       |    sum(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS df_join,
       |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
       |  FROM per_doc),
       |scored AS (
       |  SELECT doc_id, dl, tf_hash, tf_join, tf_window,
       |    round(
       |      ln(1.0 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
       |        * tf_hash * 2.2 / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5))
       |        * tf_join * 2.2 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_window + 0.5) / (df_window + 0.5))
       |        * tf_window * 2.2 / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl)),
       |      6) + 0 AS bm25
       |  FROM per_doc CROSS JOIN corpus)
       |SELECT doc_id, dl, tf_hash, tf_join, tf_window, bm25
       |FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- hybrid
  /** Hybrid retrieval via RECIPROCAL RANK FUSION — the standard way a
    * RAG/retrieval pipeline combines a lexical index (BM25) with a
    * dense one (embedding cosine) without score calibration:
    * rrf(d) = Σ 1/(60 + rank_i(d)) over the lists that retrieved d.
    * Lexical list = the BM25 top-50 for the 3-term query; dense list =
    * top-50 cosine against the query doc's embedding (vec_id 0 — ids
    * align with doc_id). Full-outer on doc_id, absent list contributes
    * nothing, final top-20 by fused score.
    *
    * 100 TB shape: each list is its own top-k (rank-limited before the
    * fusion join), so the fusion joins two 50-row sets — the pattern
    * holds however big the corpus is, because k is the product decision,
    * not the data size. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val kRrf = 60.0
    // lexical ranks: same scoring plan as [[bm25Search]], ranked not limited
    val terms = Seq("hash", "join", "window")
    val k1 = 1.2; val b = 0.75
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val tfCols = count(lit(1)).as("dl") +:
      terms.map(t => sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val perDoc = toks.groupBy(col("doc_id")).agg(tfCols.head, tfCols.tail: _*)
    val corpusCols = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(corpusCols.head, corpusCols.tail: _*)
    def termScore(t: String) = {
      val tf = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
      idf * tf * lit(k1 + 1) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    // top-k per side via orderBy+limit — TakeOrderedAndProject, a
    // distributed bounded heap (NOT a corpus-wide single-partition
    // window); the row_number that assigns ranks then runs over exactly
    // k rows, so its unpartitioned window is bounded by the product
    // decision k, never by corpus size
    val wLex = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25").desc, col("doc_id"))
    val lex = perDoc.crossJoin(broadcast(stats))
      .withColumn("bm25", round(terms.map(termScore).reduceLeft(_ + _), 6))
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .withColumn("rank_lex", row_number().over(wLex))
      .select(col("doc_id"), col("rank_lex"))
    // dense ranks: cosine against the query vector over the cached ANN
    // corpus, same top-k shape
    val c = Similarity.corpus(spark, dir)
    val q = c.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val wDen = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("doc_id"))
    val dense = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        graft.functions.GraftFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .select(col("vec_id").as("doc_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("doc_id")).limit(50)
      .withColumn("rank_dense", row_number().over(wDen))
      .select(col("doc_id"), col("rank_dense"))
    val wOut = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_dense")), lit(0.0)), 6))
      .withColumn("fused_rank", row_number().over(wOut))
      .filter(col("fused_rank") <= 20)
      .select(col("fused_rank"), col("doc_id"), col("rank_lex"),
        col("rank_dense"), col("rrf"))
  }

  val hybridRrfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS dl,
       |    CAST(sum(CASE WHEN tok = 'hash'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_hash,
       |    CAST(sum(CASE WHEN tok = 'join'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
       |    CAST(sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
       |  FROM toks GROUP BY 1),
       |corpus AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
       |    sum(CASE WHEN tf_hash   > 0 THEN 1 ELSE 0 END) AS df_hash,
       |    sum(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS df_join,
       |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
       |  FROM per_doc),
       |lex_scored AS (
       |  SELECT doc_id,
       |    round(
       |      ln(1.0 + (n_docs - df_hash + 0.5) / (df_hash + 0.5))
       |        * tf_hash * 2.2 / (tf_hash + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5))
       |        * tf_join * 2.2 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_window + 0.5) / (df_window + 0.5))
       |        * tf_window * 2.2 / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl)),
       |      6) AS bm25
       |  FROM per_doc CROSS JOIN corpus),
       |lex AS (
       |  SELECT doc_id, rank_lex FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
       |    FROM lex_scored) WHERE rank_lex <= 50),
       |e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
       |  FROM embeddings),
       |qv AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0),
       |den AS (
       |  SELECT doc_id, rank_dense FROM (
       |    SELECT e.vec_id AS doc_id,
       |      row_number() OVER (ORDER BY
       |        list_sum(list_transform(list_zip(e.v, q.qv), p -> p[1] * p[2]))
       |          / (e.nrm * q.qn) DESC, e.vec_id) AS rank_dense
       |    FROM e CROSS JOIN qv q) WHERE rank_dense <= 50),
       |fused AS (
       |  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.rank_lex, d.rank_dense,
       |    round(coalesce(1.0 / (60.0 + l.rank_lex), 0.0)
       |        + coalesce(1.0 / (60.0 + d.rank_dense), 0.0), 6) + 0 AS rrf
       |  FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id)
       |SELECT * FROM (
       |  SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank,
       |         doc_id, rank_lex, rank_dense, rrf
       |  FROM fused)
       |WHERE fused_rank <= 20""".stripMargin

  // ---------------------------------------------------------------- topics
  /** Topic labels per embedding cluster — the "what is in this corpus"
    * exploration view: every document lands in its k-means cluster
    * (vec_id ≡ doc_id; the assignment is the shared 3-iteration Lloyd
    * replay), each cluster is treated as one super-document, and its
    * top-3 terms by LIFT — the term's frequency share inside the
    * cluster relative to its corpus share (> 1 ⇒ overrepresented) —
    * name the topic. Lift, unlike cluster-level idf, keeps its signal
    * when the vocabulary is corpus-wide (every term in every cluster
    * zeroes idf but still skews by cluster). The rank filter is the
    * WindowGroupLimit shape — partitioned by cluster, bounded by 3.
    *
    * Scale: the token aggregate is (clusters × vocab) rows after the
    * map-side combine; everything downstream of the corpus pass is
    * cluster-count-sized. */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    val assign = Similarity.kmeansAssign3(spark, dir)
      .select(col("vec_id").as("doc_id"), col("cid"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("term"))
      .filter(length(col("term")) >= 3)
    val tf = toks.join(assign, "doc_id")
      .groupBy(col("cid"), col("term")).agg(count(lit(1)).as("tf"))
    val totals = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("term_total"))
    val wAllTok = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("lift").desc, col("term"))
    tf.withColumn("cluster_total", sum(col("tf")).over(wAllTok))
      .join(totals, "term")
      .crossJoin(broadcast(tf.agg(sum(col("tf")).as("corpus_total"))))
      .withColumn("lift", round(
        (col("tf") / col("cluster_total")) /
          (col("term_total") / col("corpus_total")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("cid"), col("rank"), col("term"), col("tf"), col("lift"))
  }

  val clusterTopicsSql: String =
    s"""WITH ${Similarity.kmeansCtes},
       |toks AS (
       |  SELECT doc_id, tok AS term FROM (
       |    SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents)
       |  WHERE len(tok) >= 3),
       |tf AS (
       |  SELECT a.cid, t.term, count(*) AS tf
       |  FROM toks t JOIN a3 a ON a.vec_id = t.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cid, term, tf,
       |    round((tf * 1.0 / sum(tf) OVER (PARTITION BY cid)) /
       |          (sum(tf) OVER (PARTITION BY term) * 1.0 / sum(tf) OVER ()),
       |          6) + 0 AS lift
       |  FROM tf)
       |SELECT cid, rank, term, tf, lift FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cid
       |            ORDER BY lift DESC, term) AS rank
       |  FROM scored)
       |WHERE rank <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tfidf_topterms" -> (tfidfTopTerms _),
    "text_cluster_topics" -> (clusterTopics _),
    "search_hybrid_rrf"   -> (hybridRrf _),
    "text_bm25_search"    -> (bm25Search _))

  def oracles: Map[String, String] = Map(
    "text_tfidf_topterms" -> tfidfSql,
    "text_cluster_topics" -> clusterTopicsSql,
    "search_hybrid_rrf"   -> hybridRrfSql,
    "text_bm25_search"    -> bm25Sql)
}
