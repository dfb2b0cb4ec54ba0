package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup pair graph — the same edge set the
  * connected-components dedup stage consumes ([[Dedup.dedupClusters]]),
  * read here for IMPORTANCE instead of membership: PageRank scores
  * which documents sit at the center of duplication neighborhoods (the
  * canonical "which template spawned this family" signal a curation
  * pipeline uses to pick cluster representatives and to spot mass-
  * produced boilerplate).
  *
  * Determinism design: the iteration runs in FIXED-POINT micro-units
  * (BIGINT millionths). Floating-point PageRank is order-sensitive —
  * neighbor sums associate differently across engines and even across
  * partition counts, so a float loop can't be hash-oracled and isn't
  * reproducible run-to-run at scale. Integer sums are associative:
  * per-edge contributions quantize via integer division, damping is
  * `(s·85) div 100`, and every iteration is bit-exact on any engine,
  * any partitioning, any cluster size. Reproducibility-by-construction
  * is the property a 100 TB pipeline wants from ranking stages.
  *
  * Scale shape: 3 fixed Lloyd-style rounds, each = one join edges⋈pr
  * (pr is node-sized, broadcastable at the near-dup-graph scale) + one
  * aggregate on the destination key; pr state is localCheckpoint'ed per
  * round (lineage truncation — see Dedup.computeClusters). */
object GraphOps {

  /** Memoized per (session, dir) like the other iterative indexes
    * (cluster labels, containment pairs): the loop runs driver-side
    * actions, so repeat calls would re-pay all three rounds. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    DirMemo.getOrCompute(spark, "pagerank", dir)(
      graphPagerankImpl(spark, dir))

  private[graft] def graphPagerankImpl(spark: SparkSession, dir: String): DataFrame = {
    val p0 = Dedup.minhashLshPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    // ADAPTIVE small-graph path (same threshold reasoning as
    // [[connectedComponents]]): the fixed-point iteration is INTEGER
    // micro-units throughout, so a driver replay is bit-exact against
    // the distributed loop AND the oracle — order-insensitivity is the
    // whole point of the integer design. Each distributed round costs
    // ~3 scheduled jobs; below 100k edges that overhead IS the query.
    val smallPairs = p0.limit(100001).collect()
    if (smallPairs.length <= 100000) {
      val edges = smallPairs.flatMap(r =>
        Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val n = deg.size
      val prInit = if (n == 0) 0L else math.round(1e6 / n)
      val base = if (n == 0) 0L else math.round(0.15 * 1e6 / n)
      var pr = deg.map { case (k, _) => k -> prInit }
      for (_ <- 1 to 3) {
        val sums = scala.collection.mutable.HashMap.empty[Long, Long]
        edges.foreach { case (a, b) =>
          sums(b) = sums.getOrElse(b, 0L) + pr(a) / deg(a) }
        pr = deg.map { case (k, _) => k -> (base + sums.getOrElse(k, 0L) * 85 / 100) }
      }
      import spark.implicits._
      return deg.keys.toSeq.map(id => (id, deg(id), pr(id)))
        .toDF("doc_id", "deg", "pr_units")
        .select(col("doc_id"), col("deg"), col("pr_units"),
          round(col("pr_units") / 1e6, 6).as("pagerank"))
    }
    val p = p0
    // coalesce(4): the pair graph is a few hundred rows — without it
    // every iteration schedules 32 near-empty shuffle tasks (the same
    // reasoning as Dedup.computeClusters)
    val edges = p.unionByName(
        p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .coalesce(4).localCheckpoint() // consumed by deg + 3 iteration joins
    val deg = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
      .coalesce(4).localCheckpoint()
    val n = deg.count()
    // floor(x + 0.5) on both sides (Scala math.round == floor(x+0.5) for
    // positive doubles; the oracle writes the same expression)
    val prInit = if (n == 0) 0L else math.round(1e6 / n)
    val base = if (n == 0) 0L else math.round(0.15 * 1e6 / n)
    var pr = deg.select(col("doc_a").as("doc_id"), lit(prInit).as("pr_units"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(pr.select(col("doc_id").as("doc_a"), col("pr_units")), "doc_a")
        .join(deg, "doc_a")
        .select(col("doc_b"), expr("pr_units div deg").as("c"))
      val sums = contrib.groupBy(col("doc_b")).agg(sum(col("c")).as("s"))
      val prev = pr
      pr = deg.select(col("doc_a").as("doc_id"))
        .join(sums.withColumnRenamed("doc_b", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("pr_units"))
        .coalesce(4).localCheckpoint()
      prev.unpersist() // round k's blocks are dead once round k+1 materializes
    }
    // the final pr and deg back the memoized result; the edge blocks do
    // not (checkpoint lineage is truncated) — release them
    edges.unpersist()
    pr.join(deg.withColumnRenamed("doc_a", "doc_id"), "doc_id")
      .select(col("doc_id"), col("deg"), col("pr_units"),
        round(col("pr_units") / 1e6, 6).as("pagerank"))
  }

  val graphPagerankSql: String = {
    def iter(prev: String, tag: String): String =
      s"""s_$tag AS (
         |  SELECT e.b AS id, CAST(sum(p.u // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN $prev p ON p.id = e.a JOIN deg d ON d.a = e.a
         |  GROUP BY e.b),
         |$tag AS (
         |  SELECT d.a AS id,
         |         (SELECT base FROM cst) + (coalesce(s.s, 0) * 85) // 100 AS u
         |  FROM deg d LEFT JOIN s_$tag s ON s.id = d.a)""".stripMargin
    s"""WITH pairs AS (
       |${Dedup.minhashLshPairsSql}
       |),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS a, doc_a AS b FROM pairs),
       |deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
       |cst AS (
       |  SELECT CAST(floor(1e6 / greatest(count(*), 1) + 0.5) AS BIGINT) AS init,
       |         CAST(floor(0.15 * 1e6 / greatest(count(*), 1) + 0.5) AS BIGINT) AS base
       |  FROM deg),
       |pr0 AS (SELECT a AS id, (SELECT init FROM cst) AS u FROM deg),
       |${iter("pr0", "pr1")},
       |${iter("pr1", "pr2")},
       |${iter("pr2", "pr3")}
       |SELECT p.id AS doc_id, d.deg AS deg, p.u AS pr_units,
       |       round(p.u / 1e6, 6) + 0 AS pagerank
       |FROM pr3 p JOIN deg d ON d.a = p.id""".stripMargin
  }

  /** Shared iterative min-label connected components over an
    * undirected pair set (columns `a`, `b`) — the
    * [[Dedup.computeClusters]] loop generalized to any edge frame:
    * per round, closed-neighborhood min as union + one aggregate (two
    * shuffles), state localCheckpointed so per-iteration planning is
    * O(1), convergence detected by the strictly-decreasing label sum
    * (labels only ever shrink). The edge graph is assumed
    * orders-of-magnitude smaller than the corpus (only matched pairs
    * appear), hence the small fixed partition count. */
  private[scale] def connectedComponents(pairs: DataFrame): DataFrame = {
    // ADAPTIVE small-graph path: a match/near-dup graph is usually
    // orders of magnitude smaller than its corpus, and the distributed
    // loop costs ~3 scheduled jobs per iteration — pure overhead when
    // the edge set fits the driver. Below the threshold, collect and
    // run union-find (same labels: component MINIMUM). The distributed
    // min-label loop below is the ≥ threshold path and the semantics
    // both paths share; 100k edges ≈ 1.6 MB of longs, far under any
    // sane driver budget, while a graph OVER it is exactly when the
    // loop's per-iteration cost amortizes.
    val collected = pairs.select(col("a"), col("b")).limit(100001).collect()
    if (collected.length <= 100000) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      collected.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
          parent(hi) = lo }
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "label")
    }
    val edges = pairs.select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .coalesce(4).cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).coalesce(4).cache()
    var prevSum = Long.MinValue
    var changed = true
    var iter = 0
    while (changed && iter < 20) {
      val updated = edges
        .join(labels.select(col("id").as("b"), col("label")), "b")
        .select(col("a").as("id"), col("label"))
        .unionByName(labels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .coalesce(4).localCheckpoint()
      val row = updated.agg(sum(col("label"))).head()
      val s = if (row.isNullAt(0)) 0L else row.getLong(0)
      labels.unpersist()
      changed = s != prevSum
      prevSum = s
      labels = updated
      iter += 1
    }
    edges.unpersist()
    labels
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _))

  def oracles: Map[String, String] = Map(
    "graph_pagerank" -> graphPagerankSql)
}
