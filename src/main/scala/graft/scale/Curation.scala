package graft.scale

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a pretraining pipeline runs between dedup
  * and packing: benchmark decontamination and intra-document repetition
  * scoring (the Gopher/C4-style repetition rules).
  *
  * Scale shapes:
  *  - decontamination joins the corpus against the BENCHMARK side, which
  *    is tiny by construction (eval sets are MBs even when the corpus is
  *    100 TB) — so the benchmark shingle set broadcasts and the corpus
  *    only shuffles once, for its own per-doc count;
  *  - repetition metrics are two linear hash aggregates over token /
  *    bigram rows — mergeable partials, no driver involvement, heavy
  *    tokens absorbed by map-side combine.
  */
object Curation {

  // ---------------------------------------------------------- decontamination
  /** Benchmark decontamination: flag corpus docs whose shingles overlap a
    * held-out benchmark set (docs with doc_id % 97 == 0 stand in for the
    * eval benchmark). Production pipelines use 8–13-gram overlap; the
    * corpus fixture's docs are short, so this uses the engine-wide
    * 3-gram shingles ([[Dedup.shingleRows]]) — the plan shape is
    * identical, only the n-gram width differs.
    *
    * Per doc: distinct-shingle count, benchmark-hit count, contamination
    * fraction, and the ≥ 20% drop flag. */
  def decontamOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val isBench = col("doc_id") % 97 === 0
    val benchShingles = Dedup.shingleRows(docs.filter(isBench))
      .select(col("s")).distinct().withColumn("hit", lit(1))
    Dedup.shingleRows(docs.filter(!isBench))
      .join(broadcast(benchShingles), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_shingles"), 6)
          .as("contaminated_frac"),
        (col("n_hits").cast("double") / col("n_shingles") >= 0.2)
          .as("contaminated"))
  }

  val decontamOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |shs AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS s FROM toks),
       |bench AS (SELECT DISTINCT s FROM shs WHERE doc_id % 97 = 0),
       |corp AS (SELECT doc_id, s FROM shs WHERE doc_id % 97 <> 0)
       |SELECT c.doc_id, count(*) AS n_shingles, count(b.s) AS n_hits,
       |  round(count(b.s) * 1.0 / count(*), 6) + 0 AS contaminated_frac,
       |  (count(b.s) * 1.0 / count(*)) >= 0.2 AS contaminated
       |FROM corp c LEFT JOIN bench b ON c.s = b.s
       |GROUP BY c.doc_id""".stripMargin

  // ---------------------------------------------------------- repetition
  /** Intra-document repetition metrics (the Gopher repetition filters,
    * re-based on tokens/bigrams because the fixture's text has no line
    * structure): type/token ratio, most-frequent-token fraction,
    * duplicate-bigram fraction (1 − distinct/total), and the share of
    * the doc covered by its top bigram. Docs with fewer than two tokens
    * keep null bigram metrics (left join) in both engines. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .filter(col("t1").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1")).as("b"))
    val tokStats = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        max(col("c")).as("max_tok"))
    val biStats = bigrams.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("n_bi_types"),
        max(col("c")).as("max_bi"))
    tokStats.join(biStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        round(col("max_tok").cast("double") / col("n_tokens"), 6)
          .as("max_token_frac"),
        round(lit(1.0) - col("n_bi_types").cast("double") / col("n_bigrams"), 6)
          .as("dup_bigram_frac"),
        round(col("max_bi").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"))
  }

  val textRepetitionSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |tr AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
       |tc AS (SELECT doc_id, tok, count(*) AS c FROM tr GROUP BY 1, 2),
       |tstats AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         count(*) AS n_types, max(c) AS max_tok
       |  FROM tc GROUP BY doc_id),
       |br AS (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, len(ts) - 1),
       |                               i -> ts[i] || ' ' || ts[i+1])) AS b
       |  FROM toks WHERE len(ts) >= 2),
       |bc AS (SELECT doc_id, b, count(*) AS c FROM br GROUP BY 1, 2),
       |bstats AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |         count(*) AS n_bi_types, max(c) AS max_bi
       |  FROM bc GROUP BY doc_id)
       |SELECT t.doc_id, t.n_tokens,
       |  round(t.n_types * 1.0 / t.n_tokens, 6) + 0 AS type_token_ratio,
       |  round(t.max_tok * 1.0 / t.n_tokens, 6) + 0 AS max_token_frac,
       |  round(1.0 - b.n_bi_types * 1.0 / b.n_bigrams, 6) + 0 AS dup_bigram_frac,
       |  round(b.max_bi * 1.0 / b.n_bigrams, 6) + 0 AS top_bigram_frac
       |FROM tstats t LEFT JOIN bstats b ON t.doc_id = b.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontam_overlap" -> (decontamOverlap _),
    "text_repetition"  -> (textRepetition _))

  def oracles: Map[String, String] = Map(
    "decontam_overlap" -> decontamOverlapSql,
    "text_repetition"  -> textRepetitionSql)
}
