package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ENTITY RESOLUTION over product records — the record-linkage stage a
  * curation pipeline runs when the "documents" are structured records
  * (catalog listings, author profiles, org registries) rather than
  * text: find record pairs that describe the same real-world entity,
  * score the evidence, and collapse matches into a golden record.
  *
  * Three stages, each registered and oracled:
  *   - [[erCandidates]]: BLOCKED pair generation. The part table
  *     self-joins only inside (noun, type, size-bucket) blocks with a
  *     name-length band — the standard blocking construction that keeps
  *     ER linear-ish at 100 TB (pairs ∝ Σ block² with bounded blocks,
  *     never corpus²). The block key is a shuffle key: no broadcast of
  *     the corpus, both sides hash-partition by block.
  *   - [[erMatches]]: Fellegi–Sunter-style agreement scoring, in
  *     INTEGER points (name similarity scaled ×100 via levenshtein,
  *     +20 brand agreement, +20 price agreement). Integer evidence is
  *     deliberate — the same reproducibility-by-construction argument
  *     as [[GraphOps]]' fixed-point PageRank: no float summation order
  *     to disagree across engines or partitionings.
  *   - [[erGolden]]: survivorship. Each record resolves to
  *     `least(own key, min matched partner)` — ONE propagation round of
  *     the min-label loop ([[Dedup.dedupClusters]] is the to-fixpoint
  *     version of the same machinery; one round is the common
  *     production shorthand when match graphs are cliques-by-blocking,
  *     as here where matches require name/type agreement). The golden
  *     record aggregates canonical attributes with order-insensitive
  *     functions only (min, count, integer cents sum).
  */
object EntityResolution {

  /** Normalized record view: lowered name, its noun (second token —
    * names are "adjective noun"), coarse size bucket, name length. */
  private def records(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
        col("p_partkey").as("key"),
        lower(col("p_name")).as("name"),
        col("p_brand").as("brand"),
        col("p_type").as("ptype"),
        col("p_size").as("size"),
        col("p_retailprice").as("price"))
      // get() (0-based, NULL out of bounds regardless of ANSI mode) +
      // coalesce to '' matches DuckDB split_part semantics: a one-token
      // name must still block (as the empty noun), not null out of the
      // equi-join — element_at would THROW under ANSI for a short name
      .withColumn("noun", coalesce(get(split(col("name"), " "), lit(1)), lit("")))
      .withColumn("size_bucket", expr("size div 10"))
      .withColumn("len", length(col("name")))

  private val recsSql =
    """recs AS (
      |  SELECT p_partkey AS key, lower(p_name) AS name, p_brand AS brand,
      |         p_type AS ptype, p_size AS size, p_size // 10 AS size_bucket,
      |         p_retailprice AS price, length(lower(p_name)) AS len,
      |         split_part(lower(p_name), ' ', 2) AS noun
      |  FROM part)""".stripMargin

  /** Scored candidate pairs. `name_pts = 100 − (100·lev) div maxlen`
    * stays integer end-to-end; the ≥ 50 floor drops non-evidence pairs
    * at the source (at scale: before they shuffle anywhere further).
    * The price test compares IEEE doubles built identically on both
    * engines from the same parquet values — deterministic, no sums.
    *
    * Memoized per (session, dir): [[erMatches]] and [[erGolden]] both
    * read this frame, and the blocked levenshtein pass is the ER
    * kernel cost — without the memo each consumer re-pays it. */
  def erCandidates(spark: SparkSession, dir: String): DataFrame =
    DirMemo.getOrCompute(spark, "er_cand", dir)(
      // r15: compact the checkpoint before storing it — the impl's
      // levenshtein join now runs cluster-wide (32 partitions), but a
      // memo checkpointed that wide makes every consumer of this
      // fit-sized pair frame pay ~32 block-read tasks per stage
      // (er_golden regressed 0.46→1.05 s before the repartition; the
      // 7.7k-row shuffle here is trivial and the join's own
      // parallelism is untouched)
      erCandidatesImpl(spark, dir).repartition(2).localCheckpoint())

  private[graft] def erCandidatesImpl(spark: SparkSession, dir: String): DataFrame = {
    // r15: the blocked self-join's levenshtein runs IN the join stage,
    // and with both sides derived from one small-file scan AQE
    // coalesced that stage to a single task (measured 1t/2.3s — the
    // whole query). Hash-distribute the base on the block keys with an
    // EXPLICIT partition count (AQE must respect it; by bytes this
    // shuffle is KBs and would fold back to 1 task): both aliased
    // sides inherit the layout, so the equi-join adds no new exchange
    // and the edit-distance work spreads across the cluster. r16: the
    // count comes from the shared bytes-aware helper — the self-join
    // needs this hash layout at any scale (the repartition REPLACES the
    // join's own exchange, it never adds one), but a core-pinned count
    // under-partitions a corpus-sized input; Spread.width follows the
    // size estimate with the cluster width as the floor.
    val r0 = records(spark, dir)
    val r = r0.repartition(graft.util.Spread.width(r0),
      col("noun"), col("ptype"), col("size_bucket"))
    def side(p: String) =
      r.select(r.columns.map(c => col(c).as(p + c)).toIndexedSeq: _*)
    side("a_").join(side("b_"),
        col("a_noun") === col("b_noun") &&
        col("a_ptype") === col("b_ptype") &&
        col("a_size_bucket") === col("b_size_bucket") &&
        col("a_key") < col("b_key") &&
        abs(col("a_len") - col("b_len")) <= 3)
      .withColumn("name_pts",
        lit(100) - expr("(100 * levenshtein(a_name, b_name)) div greatest(a_len, b_len)"))
      .filter(col("name_pts") >= 50)
      .withColumn("same_brand", col("a_brand") === col("b_brand"))
      .withColumn("price_close",
        abs(col("a_price") - col("b_price")) <=
          lit(0.05) * greatest(col("a_price"), col("b_price")))
      .select(col("a_key").as("a_id"), col("b_key").as("b_id"),
        col("name_pts"), col("same_brand"), col("price_close"),
        (col("name_pts")
          + when(col("same_brand"), 20).otherwise(0)
          + when(col("price_close"), 20).otherwise(0)).as("score"))
  }

  /** Shared CTE chain: blocked pairs → integer-scored candidates. */
  private val candSql =
    s"""$recsSql,
       |pairs AS (
       |  SELECT a.key AS a_id, b.key AS b_id,
       |         100 - (100 * levenshtein(a.name, b.name)) // greatest(a.len, b.len) AS name_pts,
       |         a.brand = b.brand AS same_brand,
       |         abs(a.price - b.price) <= 0.05 * greatest(a.price, b.price) AS price_close
       |  FROM recs a JOIN recs b
       |    ON a.noun = b.noun AND a.ptype = b.ptype
       |   AND a.size_bucket = b.size_bucket
       |   AND a.key < b.key AND abs(a.len - b.len) <= 3),
       |cand AS (
       |  SELECT a_id, b_id, name_pts, same_brand, price_close,
       |         name_pts + (CASE WHEN same_brand THEN 20 ELSE 0 END)
       |                  + (CASE WHEN price_close THEN 20 ELSE 0 END) AS score
       |  FROM pairs WHERE name_pts >= 50)""".stripMargin

  val erCandidatesSql: String =
    s"""WITH $candSql
       |SELECT a_id, b_id, name_pts, same_brand, price_close, score
       |FROM cand""".stripMargin

  /** Match decision: total evidence ≥ 120 — an exact name plus at least
    * one corroborating field, or a near-exact name plus both. */
  def erMatches(spark: SparkSession, dir: String): DataFrame =
    erCandidates(spark, dir)
      .filter(col("score") >= 120)
      .select(col("a_id"), col("b_id"), col("score"))

  val erMatchesSql: String =
    s"""WITH $candSql
       |SELECT a_id, b_id, score FROM cand WHERE score >= 120""".stripMargin

  /** Golden records: every source record (matched or singleton) lands in
    * exactly one resolved group; attributes survive via order-
    * insensitive picks (min name, distinct-brand count, integer cents
    * sum — never a float sum whose partition order could differ). */
  def erGolden(spark: SparkSession, dir: String): DataFrame = {
    val m = erMatches(spark, dir)
    val partners = m.select(col("a_id").as("id"), col("b_id").as("p"))
      .unionByName(m.select(col("b_id").as("id"), col("a_id").as("p")))
      .groupBy(col("id")).agg(min(col("p")).as("min_p"))
    records(spark, dir)
      .join(partners, col("key") === col("id"), "left")
      .withColumn("resolved_id", least(col("key"), coalesce(col("min_p"), col("key"))))
      .groupBy(col("resolved_id"))
      .agg(
        count(lit(1)).as("n_records"),
        min(col("name")).as("canonical_name"),
        countDistinct(col("brand")).as("n_brands"),
        sum(expr("cast(round(price * 100) as bigint)")).as("price_cents"))
  }

  val erGoldenSql: String =
    s"""WITH $candSql,
       |m AS (SELECT a_id, b_id FROM cand WHERE score >= 120),
       |partners AS (
       |  SELECT id, min(p) AS min_p FROM (
       |    SELECT a_id AS id, b_id AS p FROM m
       |    UNION ALL
       |    SELECT b_id AS id, a_id AS p FROM m)
       |  GROUP BY id),
       |resolved AS (
       |  SELECT r.*, least(r.key, coalesce(pt.min_p, r.key)) AS resolved_id
       |  FROM recs r LEFT JOIN partners pt ON r.key = pt.id)
       |SELECT resolved_id, count(*) AS n_records,
       |       min(name) AS canonical_name,
       |       count(DISTINCT brand) AS n_brands,
       |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS price_cents
       |FROM resolved GROUP BY resolved_id""".stripMargin

  /** INCREMENTAL resolution — the shape a production pipeline actually
    * runs: a small incoming batch (here: every 20th key, standing in
    * for today's delta) matches against the existing corpus through the
    * same blocks. The batch side is tiny relative to the corpus, so the
    * join is batch-blocks × corpus-blocks — at 100 TB the corpus never
    * self-joins, and the batch side broadcasts when it fits. Each
    * incoming record takes its best match (highest score, then lowest
    * corpus key) or keeps its own key as a new entity. */
  def erIncremental(spark: SparkSession, dir: String): DataFrame = {
    val r = records(spark, dir)
    def side(df: DataFrame, p: String) =
      df.select(df.columns.map(c => col(c).as(p + c)).toIndexedSeq: _*)
    val batch = side(r.filter(col("key") % 20 === 0), "a_")
    val corpus = side(r.filter(col("key") % 20 =!= 0), "b_")
    val scored = batch.join(corpus,
        col("a_noun") === col("b_noun") &&
        col("a_ptype") === col("b_ptype") &&
        col("a_size_bucket") === col("b_size_bucket") &&
        abs(col("a_len") - col("b_len")) <= 3)
      .withColumn("name_pts",
        lit(100) - expr("(100 * levenshtein(a_name, b_name)) div greatest(a_len, b_len)"))
      .withColumn("score", col("name_pts")
        + when(col("a_brand") === col("b_brand"), 20).otherwise(0)
        + when(abs(col("a_price") - col("b_price")) <=
            lit(0.05) * greatest(col("a_price"), col("b_price")), 20).otherwise(0))
      .filter(col("score") >= 120)
    val best = scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("a_key"))
          .orderBy(col("score").desc, col("b_key"))))
      .filter(col("rk") === 1)
      .select(col("a_key").as("k"), col("b_key"), col("score"))
    batch.select(col("a_key"))
      .join(best, col("a_key") === col("k"), "left")
      .select(col("a_key").as("batch_id"),
        coalesce(col("b_key"), col("a_key")).as("resolved_id"),
        col("b_key").isNotNull.as("matched"),
        coalesce(col("score"), lit(0L)).as("best_score"))
  }

  val erIncrementalSql: String =
    s"""WITH $recsSql,
       |scored AS (
       |  SELECT a.key AS a_key, b.key AS b_key,
       |         (100 - (100 * levenshtein(a.name, b.name)) // greatest(a.len, b.len))
       |         + (CASE WHEN a.brand = b.brand THEN 20 ELSE 0 END)
       |         + (CASE WHEN abs(a.price - b.price) <= 0.05 * greatest(a.price, b.price)
       |                 THEN 20 ELSE 0 END) AS score
       |  FROM recs a JOIN recs b
       |    ON a.noun = b.noun AND a.ptype = b.ptype
       |   AND a.size_bucket = b.size_bucket
       |   AND abs(a.len - b.len) <= 3
       |  WHERE a.key % 20 = 0 AND b.key % 20 <> 0),
       |best AS (
       |  SELECT a_key, b_key, score FROM (
       |    SELECT a_key, b_key, score,
       |           row_number() OVER (PARTITION BY a_key
       |                              ORDER BY score DESC, b_key) AS rk
       |    FROM scored WHERE score >= 120)
       |  WHERE rk = 1)
       |SELECT r.key AS batch_id,
       |       coalesce(b.b_key, r.key) AS resolved_id,
       |       b.b_key IS NOT NULL AS matched,
       |       CAST(coalesce(b.score, 0) AS BIGINT) AS best_score
       |FROM recs r LEFT JOIN best b ON r.key = b.a_key
       |WHERE r.key % 20 = 0""".stripMargin

  /** TRUE transitive entity ids — connected components over the match
    * graph, dropping [[erGolden]]'s min-direct-partner shorthand (exact
    * only when match-cliques coincide with components; a chain
    * A–B–C with no A–C match resolves A and C apart under the
    * shorthand, together here). The component loop is the shared
    * [[GraphOps.connectedComponents]] min-label propagation
    * (checkpointed state, label-sum convergence); the oracle replays it
    * as the same recursive-CTE transitive closure the dedup clusters
    * use. One row per matched record: (key, entity_id, n_members of
    * its entity). */
  def erClusters(spark: SparkSession, dir: String): DataFrame = {
    val comps = GraphOps.connectedComponents(
      erMatches(spark, dir).select(col("a_id").as("a"), col("b_id").as("b")))
    val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    comps.join(sizes, "label")
      .select(col("id").as("key"), col("label").as("entity_id"), col("n_members"))
  }

  val erClustersSql: String =
    s"""WITH RECURSIVE $candSql,
       |mm AS (SELECT a_id, b_id FROM cand WHERE score >= 120),
       |medges AS (
       |  SELECT a_id AS a, b_id AS b FROM mm
       |  UNION
       |  SELECT b_id AS a, a_id AS b FROM mm),
       |mreach(a, b) AS (
       |  SELECT a, b FROM medges
       |  UNION
       |  SELECT r.a, e.b FROM mreach r JOIN medges e ON e.a = r.b),
       |mcc AS (
       |  SELECT a AS key, least(a, min(b)) AS entity_id FROM mreach GROUP BY a)
       |SELECT key, entity_id,
       |       count(*) OVER (PARTITION BY entity_id) AS n_members
       |FROM mcc""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_candidates" -> (erCandidates _),
    "er_matches"    -> (erMatches _),
    "er_golden"     -> (erGolden _),
    "er_clusters"   -> (erClusters _),
    "er_incremental" -> (erIncremental _))

  def oracles: Map[String, String] = Map(
    "er_candidates" -> erCandidatesSql,
    "er_matches"    -> erMatchesSql,
    "er_golden"     -> erGoldenSql,
    "er_clusters"   -> erClustersSql,
    "er_incremental" -> erIncrementalSql)
}
