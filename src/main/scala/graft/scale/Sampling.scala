package graft.scale

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling/splitting — the operations a training
  * run needs BEFORE any learning starts, at 100 TB shapes:
  *
  *  - train/val/test split must be a pure function of the document key
  *    (re-runs, backfills, and multi-team reads all agree; no RNG state,
  *    no shuffle at all — the split is a map-stage column);
  *  - stratified sampling keeps per-stratum proportions under the same
  *    determinism (hash-threshold per stratum, not reservoir state).
  *
  * Hashing is md5 (like [[Dedup]]) so DuckDB reproduces every assignment
  * bit-for-bit.
  */
object Sampling {

  /** 0–99 bucket from the md5 of the document key — the split axis. */
  private def hashBucket(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  private val hashBucketSql =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100"

  /** Deterministic 90/5/5 train/val/test split over documents: the
    * assignment is a map-stage expression on the key — zero shuffle,
    * stable across re-runs and engines. */
  def splitTrainVal(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))

  val splitTrainValSql: String =
    s"""SELECT doc_id, lang, source,
       |       CASE WHEN $hashBucketSql < 90 THEN 'train'
       |            WHEN $hashBucketSql < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Stratified 20% sample per (lang) stratum: hash-threshold inside the
    * stratum (deterministic, proportions hold per stratum without any
    * per-stratum state or sort). Output is the per-stratum census —
    * kept vs total — so the oracle checks both membership and rates. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("kept", (hashBucket(col("doc_id")) < 20).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_sampled"),
        round(avg(col("kept")), 6).as("sample_rate"))

  val sampleStratifiedSql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN $hashBucketSql < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |       round(avg(CASE WHEN $hashBucketSql < 20 THEN 1.0 ELSE 0.0 END), 6) + 0 AS sample_rate
       |FROM documents GROUP BY lang""".stripMargin

  /** EXACT-k per-stratum sample (k=5 per lang) — reservoir-sampling
    * semantics, derandomized: rank each stratum by the md5 of the doc key
    * (a uniform, engine-reproducible permutation) and keep the first k.
    * Unlike the hash-threshold sample above, the count per stratum is
    * exact, not expected — what eval-set construction needs. One window
    * over the stratum exchange; at 100 TB replace row_number with a
    * per-partition top-k heap (TakeOrderedAndProject does this for global
    * top-k; per-group, min(struct) over k slots) — the ORDER stays the
    * md5 permutation either way. */
  def sampleReservoir(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("source"))
  }

  val sampleReservoirSql: String =
    """SELECT lang, CAST(rk AS INT) AS rk, doc_id, source FROM (
      |  SELECT lang, doc_id, source,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 5""".stripMargin

  /** Split-leakage audit — the check that motivates group-aware splits:
    * near-duplicate pairs ([[Dedup.minhashLshPairs]], Jaccard ≥ 0.5)
    * whose two docs land in DIFFERENT splits leak training content into
    * eval. Output is the (split_a, split_b) pair matrix with a `leaky`
    * flag; a clean split has all mass on the diagonal. Cost = the LSH
    * pair query + one broadcast-sized aggregation. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    def split(c: Column): Column = {
      val b = conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100
      when(b < 90, "train").when(b < 95, "val").otherwise("test")
    }
    Dedup.minhashLshPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .withColumn("split_a", split(col("doc_a")))
      .withColumn("split_b", split(col("doc_b")))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", col("split_a") =!= col("split_b"))
  }

  /** Cluster-aware split — the fix for what [[splitLeakage]] measures:
    * the split key is the near-dup CLUSTER label
    * ([[Dedup.dedupClusters]] connected components; docs outside any
    * cluster keep their own id), so every member of a near-dup family
    * lands in the same split and cross-split leakage is zero by
    * construction (spec-pinned; oracle-checked via the recursive-CTE
    * closure in [[Dedup.connectedComponentsCte]]). */
  def splitByCluster(spark: SparkSession, dir: String): DataFrame = {
    val labels = Dedup.dedupClusters(spark, dir)
    val b = conv(substring(md5(col("group_key").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("group_key"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
  }

  private def splitOfSql(c: String): String =
    s"""CASE WHEN ('0x' || substr(md5($c::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'train'
       |     WHEN ('0x' || substr(md5($c::VARCHAR), 1, 8))::BIGINT % 100 < 95 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val splitByClusterSql: String =
    s"""WITH RECURSIVE ${Dedup.connectedComponentsCte}
       |SELECT d.doc_id,
       |       coalesce(c.cluster_id, d.doc_id) AS group_key,
       |       ${splitOfSql("coalesce(c.cluster_id, d.doc_id)")} AS split
       |FROM documents d LEFT JOIN cc c USING (doc_id)""".stripMargin

  val splitLeakageSql: String =
    s"""WITH pairs AS (
       |${Dedup.minhashLshPairsSql}
       |)
       |SELECT split_a, split_b, count(*) AS n_pairs, split_a <> split_b AS leaky
       |FROM (SELECT ${splitOfSql("doc_a")} AS split_a,
       |             ${splitOfSql("doc_b")} AS split_b
       |      FROM pairs)
       |GROUP BY split_a, split_b""".stripMargin

  /** Corpus heavy hitters — the boilerplate detector every web-scale
    * pipeline runs (headers/footers/licenses repeat across documents):
    * top 20 word-3-gram shingles by DISTINCT-document frequency. One
    * hash aggregate with map-side combine over shingle ROWS (the
    * [[Dedup.shingleRows]] shape); the top-k is a single reduction, not
    * a global sort. At 100 TB the same query runs with a count-min /
    * space-saving sketch in the combine stage — the exact form here IS
    * the verification oracle for that sketch. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Dedup.shingleIndex(spark, dir)
      .groupBy(col("s")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("s"))
      .limit(20)

  val heavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |shs AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS s FROM toks)
       |SELECT s, count(*) AS n_docs
       |FROM shs GROUP BY s
       |ORDER BY n_docs DESC, s LIMIT 20""".stripMargin

  /** Per-doc boilerplate coverage — how much of each document is made of
    * corpus-wide heavy-hitter shingles ([[heavyHitters]] top-20
    * broadcast back): the doc-level signal that drives header/footer/
    * license stripping. Same broadcast-join shape as decontamination —
    * the flagged set is constant-sized regardless of corpus bytes. */
  def boilerplateFrac(spark: SparkSession, dir: String): DataFrame = {
    val hh = heavyHitters(spark, dir).select(col("s")).withColumn("hit", lit(1))
    Dedup.shingleIndex(spark, dir)
      .join(broadcast(hh), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_shingles"), 6)
          .as("boilerplate_frac"))
  }

  val boilerplateFracSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |shs AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS s FROM toks),
       |hh AS (
       |  SELECT s FROM (SELECT s, count(*) AS n_docs FROM shs GROUP BY s
       |                 ORDER BY n_docs DESC, s LIMIT 20))
       |SELECT c.doc_id, count(*) AS n_shingles, count(h.s) AS n_boiler,
       |       round(count(h.s) * 1.0 / count(*), 6) + 0 AS boilerplate_frac
       |FROM shs c LEFT JOIN hh h ON c.s = h.s
       |GROUP BY c.doc_id""".stripMargin

  /** Contrastive pair mining — training data FOR the embedding model:
    * each near-dup pair ([[Dedup.minhashLshPairs]]) yields an (anchor,
    * positive); the negative is hash-picked deterministically from a
    * ranked 10% sample pool (at corpus scale the negative pool is
    * always a bounded sample, so the global rank window never sees more
    * than the sample — here ~50 rows). Pairs whose pick collides with
    * the anchor or positive are dropped (deterministic in both
    * engines). */
  def pairsContrastive(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLshPairs(spark, dir)
    val pool0 = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string").cast("binary")).as("hsh"))
      .filter(conv(substring(col("hsh"), 1, 8), 16, 10).cast("long") % 100 < 10)
    // cap the pool BEFORE ranking it: orderBy+limit is a distributed
    // TakeOrdered, so the unpartitioned row_number that assigns pool
    // indexes runs over at most 100k rows — without the cap it would be
    // a single-partition window over 10% of the corpus. Random
    // negatives only need a bounded pool; at the test SFs the pool is
    // far under the cap, so results are unchanged.
    val pool = pool0.orderBy(col("hsh")).limit(100000)
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("hsh"))) - 1)
      .select(col("rk"), col("doc_id").as("negative_id"))
    val poolN = pool.agg(count(lit(1)).as("npool"))
    pairs.crossJoin(broadcast(poolN))
      .withColumn("rk",
        conv(substring(md5(concat_ws("_", col("doc_a"), col("doc_b")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % col("npool"))
      .join(broadcast(pool), Seq("rk"))
      .filter(col("negative_id") =!= col("doc_a") && col("negative_id") =!= col("doc_b"))
      .select(col("doc_a").as("anchor_id"), col("doc_b").as("positive_id"),
        col("negative_id"), col("jaccard"))
  }

  val pairsContrastiveSql: String =
    s"""WITH pairs AS (
       |${Dedup.minhashLshPairsSql}
       |),
       |pool0 AS (
       |  SELECT doc_id, md5(doc_id::VARCHAR) AS hsh FROM documents
       |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 10),
       |pool AS (
       |  SELECT row_number() OVER (ORDER BY hsh) - 1 AS rk, doc_id AS negative_id
       |  FROM pool0),
       |n AS (SELECT count(*) AS npool FROM pool),
       |px AS (
       |  SELECT p.*,
       |    ('0x' || substr(md5(p.doc_a::VARCHAR || '_' || p.doc_b::VARCHAR), 1, 8))::BIGINT
       |      % n.npool AS rk
       |  FROM pairs p, n)
       |SELECT px.doc_a AS anchor_id, px.doc_b AS positive_id, pool.negative_id, px.jaccard
       |FROM px JOIN pool ON px.rk = pool.rk
       |WHERE pool.negative_id <> px.doc_a AND pool.negative_id <> px.doc_b""".stripMargin

  /** Sequence packing — the pretraining batcher: documents are laid out
    * in a deterministic order (per-lang, by doc_id) and cut into
    * fixed-budget packs of 4096 tokens; a document belongs to the pack
    * where it STARTS (packed samples cross document boundaries, as in
    * GPT-style pretraining). pack_id = floor(preceding-cumsum / budget)
    * — one running-sum window per lang, no stateful fold needed. Output
    * is the per-pack census (docs, tokens, fill rate vs budget). */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 4096
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(tokens(col("text"))).as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0)))
      .withColumn("pack_id", floor(col("start_offset") / budget))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(sum(col("n_tokens")) / lit(budget.toDouble), 6).as("fill_ratio"))
  }

  val packSequencesSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, len($tokensListSql) AS n_tokens FROM documents),
       |offs AS (
       |  SELECT doc_id, lang, n_tokens,
       |         coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       |  FROM toks)
       |SELECT lang, CAST(floor(start_offset / 4096) AS BIGINT) AS pack_id,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       round(sum(n_tokens) / 4096.0, 6) + 0 AS fill_ratio
       |FROM offs GROUP BY 1, 2""".stripMargin

  /** Mixture resampling — reweight the corpus to TARGET per-language
    * token shares (the data-mixing step of a pretraining run): per-lang
    * weight = target_share · total_tokens / lang_tokens; weight < 1
    * downsamples by a deterministic hash fraction, weight > 1 emits
    * ⌊w⌋ copies plus a hash-fractional extra. The per-lang stats are a
    * TINY aggregate broadcast back over the corpus — the 100 TB plan is
    * one map-side filter/replicate, no corpus shuffle beyond the census.
    * Output: per-lang census (in/out docs+tokens, weight, achieved
    * share) so the oracle pins both the rates and the replication. */
  def sampleMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), size(tokens(col("text"))).as("n_tokens"))
    val targetShare =
      when(col("lang") === "en", 0.30).otherwise(0.175)
    // fit-then-fold: one-row corpus total crossJoined back instead of a
    // single-partition window over the per-lang frame
    val statsBase = docs.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
    val tot = statsBase.agg(sum(col("lang_tokens")).as("total_tokens"))
    val stats = statsBase.crossJoin(broadcast(tot))
      .withColumn("target_share", targetShare)
      .withColumn("weight",
        col("target_share") * col("total_tokens") / col("lang_tokens"))
    // 32-bit md5 prefix as a uniform fraction in [0,1) — bit-identical in DuckDB
    val hashFrac = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val census = docs.join(broadcast(stats), Seq("lang"))
      .withColumn("n_copies",
        floor(col("weight")) +
          when(hashFrac < col("weight") - floor(col("weight")), 1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs_in"),
        max(col("lang_tokens")).as("tokens_in"),
        round(max(col("lang_tokens")) / max(col("total_tokens")).cast("double"), 6)
          .as("current_share"),
        max(col("target_share")).as("target_share"),
        round(max(col("weight")), 6).as("weight"),
        sum(col("n_copies")).as("n_docs_out"),
        sum(col("n_copies") * col("n_tokens")).as("tokens_out"))
    val outTot = census.agg(sum(col("tokens_out")).as("out_total"))
    census.crossJoin(broadcast(outTot))
      .withColumn("achieved_share",
        round(col("tokens_out") / col("out_total").cast("double"), 6))
      .drop("out_total")
  }

  val sampleMixtureSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, len(${Dedup.tokensSql}) AS n_tokens FROM documents),
       |stats AS (
       |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens FROM docs GROUP BY lang),
       |w AS (
       |  SELECT lang, lang_tokens,
       |         CAST(sum(lang_tokens) OVER () AS BIGINT) AS total_tokens,
       |         CASE WHEN lang = 'en' THEN 0.30::DOUBLE ELSE 0.175::DOUBLE END AS target_share
       |  FROM stats),
       |ww AS (
       |  SELECT *, target_share * total_tokens / lang_tokens AS weight FROM w),
       |cop AS (
       |  SELECT d.lang, d.n_tokens, ww.lang_tokens, ww.total_tokens, ww.target_share, ww.weight,
       |         CAST(floor(ww.weight) AS BIGINT) +
       |         CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0
       |                   < ww.weight - floor(ww.weight) THEN 1 ELSE 0 END AS n_copies
       |  FROM docs d JOIN ww ON d.lang = ww.lang),
       |census AS (
       |  SELECT lang, count(*) AS n_docs_in,
       |         max(lang_tokens) AS tokens_in,
       |         round(max(lang_tokens) * 1.0 / max(total_tokens), 6) + 0 AS current_share,
       |         max(target_share) AS target_share,
       |         round(max(weight), 6) + 0 AS weight,
       |         CAST(sum(n_copies) AS BIGINT) AS n_docs_out,
       |         CAST(sum(n_copies * n_tokens) AS BIGINT) AS tokens_out
       |  FROM cop GROUP BY lang)
       |SELECT *, round(tokens_out * 1.0 / sum(tokens_out) OVER (), 6) + 0 AS achieved_share
       |FROM census""".stripMargin

  private def tokens(c: Column): Column = Dedup.tokens(c)
  private def tokensListSql: String = Dedup.tokensSql

  // ---------------------------------------------------------------- DSIR
  /** DSIR-style importance resampling (Xie et al. 2023, simplified to
    * unigram features): reweight the source corpus toward a TARGET
    * domain (the zh docs here) by the per-token likelihood ratio of two
    * add-1-smoothed unigram LMs — target over source — length-
    * normalized per doc, accept with probability min(1, exp(w)) against
    * the deterministic md5 fraction (no RNG state; re-runs agree).
    *
    * 100 TB shape: both LMs are ONE token aggregate each (map-side
    * combine), the merged ratio table is vocab-sized → broadcast, the
    * per-doc weight is one more aggregate. The accept test compares the
    * ROUNDED probability so both engines gate on identical doubles.
    *
    * On the sf fixture the langs share one vocabulary, so mean accept
    * ≈ 0.99 — DSIR correctly finds nothing to reweight; discrimination
    * on genuinely distinct domains is pinned in `SamplingSpec`
    * (target ≈ 1.0 vs off-domain < 0.1). */
  def sampleDsir(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(Dedup.tokens(col("text"))).as("tok"))
    // fit-then-fold: one-row vocab totals crossJoined back instead of a
    // single-partition window serializing the vocab through one task
    val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("cs"))
    val vTot = counts.agg(sum(col("cs")).as("ns"), count(lit(1)).as("v"))
    val vocab = counts.crossJoin(broadcast(vTot))
    val tc = tok.filter(col("lang") === "zh")
      .groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val tTot = tc.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val ratios = vocab.join(tc, Seq("tok"), "left")
      .withColumn("ct", coalesce(col("ct"), lit(0L)))
      .crossJoin(broadcast(tTot))
      .select(col("tok"),
        (log((col("ct") + 1.0) / (col("nt") + col("v"))) -
          log((col("cs") + 1.0) / (col("ns") + col("v")))).as("lr"))
    // ratios is vocab-sized and a raw-token vocab never truly saturates
    // at web scale (numbers, typos, URLs) — no broadcast hint; AQE
    // broadcasts it while it is actually small and shuffles past that
    val weighted = tok.join(ratios, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(round(avg(col("lr")), 6).as("log_ratio"))
    val prob = round(least(lit(1.0), exp(col("log_ratio"))), 6)
    val hf = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 1000000L).cast("double") / 1000000.0
    weighted.select(col("doc_id"), col("log_ratio"),
      prob.as("accept_prob"), (hf < prob).as("sampled"))
  }

  val sampleDsirSql: String =
    s"""WITH tr AS (
       |  SELECT doc_id, lang, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS cs FROM tr GROUP BY tok),
       |tot AS (SELECT sum(cs) AS ns, count(*) AS v FROM vocab),
       |tc AS (SELECT tok, count(*) AS ct FROM tr WHERE lang = 'zh' GROUP BY tok),
       |ntt AS (SELECT count(*) AS nt FROM tr WHERE lang = 'zh'),
       |ratios AS (
       |  SELECT vb.tok,
       |         ln((coalesce(t.ct, 0) + 1.0) / (ntt.nt + tot.v)) -
       |         ln((vb.cs + 1.0) / (tot.ns + tot.v)) AS lr
       |  FROM vocab vb LEFT JOIN tc t USING (tok), tot, ntt),
       |w AS (
       |  SELECT doc_id, round(avg(lr), 6) + 0 AS log_ratio
       |  FROM tr JOIN ratios USING (tok) GROUP BY doc_id)
       |SELECT doc_id, log_ratio,
       |  round(least(1.0, exp(log_ratio)), 6) + 0 AS accept_prob,
       |  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000000) / 1000000.0 <
       |    round(least(1.0, exp(log_ratio)), 6) AS sampled
       |FROM w""".stripMargin

  // ---------------------------------------------------------------- shard manifest
  /** SHARD WRITER MANIFEST — the artifact a training job consumes: docs
    * assigned to 16 shards by a pure key hash (idempotent backfills,
    * resumable writes, every re-run and every engine lands each doc in
    * the same shard — the property a 100 TB shard layout cannot live
    * without), one manifest row per shard with occupancy (docs, chars,
    * whitespace tokens), the doc_id range, and an ORDER-FREE integer
    * content checksum (sum of per-doc md5 prefixes) so a reader can
    * audit a shard without rescanning text. One map stage + one 16-group
    * aggregate; at scale this IS the write plan — `partitionBy(shard)`
    * with the manifest as the job's side output. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    Tables.documents(spark, dir)
      .withColumn("shard", hashBucket(col("doc_id")) % 16)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(toks).cast("long")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
  }

  val shardManifestSql: String =
    s"""SELECT ($hashBucketSql) % 16 AS shard,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(len(${Dedup.tokensSql})) AS BIGINT) AS total_tokens,
       |  min(doc_id) AS min_doc_id,
       |  max(doc_id) AS max_doc_id,
       |  CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS checksum
       |FROM documents GROUP BY 1""".stripMargin

  /** EPOCH SHUFFLE — the deterministic dataloader-order permutation a
    * 100 TB training run needs: the order key for epoch e is
    * md5(e || '_' || doc_id), a reproducible uniform permutation with
    * zero coordination, materialized SHARD-LOCALLY. Each doc routes to
    * shard = top-32-bits-of-key mod 16 (shards stay balanced because
    * the key is uniform), and its position within the shard is a
    * row_number over the (epoch, shard) partition ordered by the same
    * key. The only exchange is the shard hash partition and the window
    * sorts one shard per task — the naive `ORDER BY rand()` global
    * shuffle is a full-corpus RANGE SORT per epoch, plus a
    * nondeterminism bug on retry. Readers streaming shards
    * independently and interleaving them replay the per-epoch
    * permutation — the tf.data / streaming-dataset contract
    * (shard-shuffled, intra-shard deterministic). Two epochs emitted
    * so the output pins that the permutation CHANGES with the epoch
    * seed. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val epochs = spark.range(1, 3).select(col("id").as("epoch"))
    val key = md5(concat(col("epoch").cast("string"), lit("_"),
      col("doc_id").cast("string")).cast("binary"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("ord"), col("doc_id"))
    Tables.documents(spark, dir)
      .crossJoin(broadcast(epochs))
      .withColumn("ord", key)
      .withColumn("shard",
        conv(substring(col("ord"), 1, 8), 16, 10).cast("long") % 16)
      .withColumn("pos", row_number().over(w))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
  }

  val epochShuffleSql: String =
    """SELECT epoch, shard, CAST(pos AS INT) AS pos, doc_id FROM (
      |  SELECT g.e AS epoch,
      |         ('0x' || substr(md5(g.e || '_' || d.doc_id), 1, 8))::BIGINT % 16 AS shard,
      |         row_number() OVER (
      |           PARTITION BY g.e,
      |             ('0x' || substr(md5(g.e || '_' || d.doc_id), 1, 8))::BIGINT % 16
      |           ORDER BY md5(g.e || '_' || d.doc_id), d.doc_id) AS pos,
      |         d.doc_id
      |  FROM documents d, unnest(generate_series(1, 2)) g(e))""".stripMargin

  // ------------------------------------------------- rolling-origin CV folds
  /** Rolling-origin cross-validation folds — the time-series-safe CV a
    * backtest/forecast pipeline needs (random K-fold leaks the future
    * into training): fold k trains on everything before boundary B_k and
    * tests on the following 5 days, boundaries advancing 5 days per
    * fold. The 4-row fold table broadcasts; events fan out to at most
    * the folds whose test window hasn't closed (bounded ×4, one scan,
    * no shuffle beyond the final 8-group rollup). Census per
    * (fold, role) so the split is auditable — row counts, user reach,
    * and the time extents that PROVE train < test temporally. */
  def splitTimeFolds(spark: SparkSession, dir: String): DataFrame = {
    val folds = spark.range(1, 5).select(col("id").as("fold"),
      expr("timestampadd(DAY, (id - 1) * 5, TIMESTAMP '2024-01-10')").as("b"))
    Tables.events(spark, dir)
      .join(broadcast(folds), col("ts") < col("b") + expr("INTERVAL 5 DAYS"))
      .select(col("fold"),
        when(col("ts") < col("b"), "train").otherwise("test").as("role"),
        col("user_id"), col("ts"))
      .groupBy(col("fold"), col("role"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts")).as("ts_min"),
        max(col("ts")).as("ts_max"))
  }

  val splitTimeFoldsSql: String =
    """WITH folds AS (
      |  SELECT * FROM (VALUES
      |    (1, TIMESTAMP '2024-01-10'), (2, TIMESTAMP '2024-01-15'),
      |    (3, TIMESTAMP '2024-01-20'), (4, TIMESTAMP '2024-01-25')) AS t(fold, b)),
      |a AS (
      |  SELECT fold, CASE WHEN ts < b THEN 'train' ELSE 'test' END AS role,
      |         user_id, ts
      |  FROM events JOIN folds ON ts < b + INTERVAL 5 DAY)
      |SELECT fold, role, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       min(ts) AS ts_min, max(ts) AS ts_max
      |FROM a GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- drift detection
  /** Feature-drift detection via Population Stability Index, per
    * event_type: decile edges fit on the REFERENCE window (first half of
    * the month, exact `percentile` ≙ DuckDB `quantile_cont` — at 100 TB
    * swap for `percentile_approx`), both windows binned on those edges
    * in ONE scan (side flag, no second pass), PSI = Σ (p_cur − p_ref) ·
    * ln(p_cur / p_ref) over the 10 bins with ε-smoothing so empty bins
    * don't blow up. The fit result is 5 rows × 9 edges — broadcast back
    * over the fact scan, the standard fit-then-apply shape. PSI > 0.2 is
    * the conventional retrain trigger; the oracle pins the whole
    * numeric pipeline, not just the verdict. */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        when(col("ts") < cut, "ref").otherwise("cur").as("side"))
    val edgeCols = (1 to 9).map(k => expr(s"percentile(value, 0.$k)").as(s"e$k"))
    val edges = ev.filter(col("side") === "ref")
      .groupBy(col("event_type"))
      .agg(edgeCols.head, edgeCols.tail: _*)
    val bin = (1 to 9).map(k =>
      when(col("value") > col(s"e$k"), 1).otherwise(0)).reduce(_ + _)
    val perBin = ev.join(broadcast(edges), "event_type")
      .withColumn("bin", bin)
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val pr = (col("n_ref") + lit(1e-6)) / (col("tr") + lit(1e-5))
    val pc = (col("n_cur") + lit(1e-6)) / (col("tc") + lit(1e-5))
    perBin
      .withColumn("tr", sum(col("n_ref")).over(wt))
      .withColumn("tc", sum(col("n_cur")).over(wt))
      .withColumn("term", (pc - pr) * log(pc / pr))
      .groupBy(col("event_type"))
      .agg(max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"),
        round(sum(col("term")), 6).as("psi"))
  }

  val driftPsiSql: String = {
    val edgeAggs = (1 to 9).map(k => s"quantile_cont(value, 0.$k) AS e$k").mkString(", ")
    val binExpr = (1 to 9).map(k => s"(value > e$k)::INT").mkString(" + ")
    s"""WITH ev AS (
       |  SELECT event_type, value,
       |         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref' ELSE 'cur' END AS side
       |  FROM events),
       |edges AS (
       |  SELECT event_type, $edgeAggs
       |  FROM ev WHERE side = 'ref' GROUP BY event_type),
       |b AS (
       |  SELECT ev.event_type, side, $binExpr AS bin
       |  FROM ev JOIN edges USING (event_type)),
       |c AS (
       |  SELECT event_type, bin,
       |         CAST(sum(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |         CAST(sum(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
       |  FROM b GROUP BY 1, 2),
       |t AS (
       |  SELECT *, CAST(sum(n_ref) OVER (PARTITION BY event_type) AS BIGINT) AS tr,
       |            CAST(sum(n_cur) OVER (PARTITION BY event_type) AS BIGINT) AS tc
       |  FROM c)
       |SELECT event_type, max(tr) AS n_ref, max(tc) AS n_cur,
       |       round(sum(((n_cur + 1e-6) / (tc + 1e-5) - (n_ref + 1e-6) / (tr + 1e-5))
       |             * ln(((n_cur + 1e-6) / (tc + 1e-5)) / ((n_ref + 1e-6) / (tr + 1e-5)))), 6) + 0 AS psi
       |FROM t GROUP BY event_type""".stripMargin
  }

  // ------------------------------------------------------------ hard negatives
  /** HARD-NEGATIVE mining for embedding-model training — the complement
    * of [[pairsContrastive]]'s random pool: for each anchor, the most
    * similar vectors that are NOT near-duplicates (cosine below the 0.4
    * dedup threshold but as high as possible under it). Random negatives
    * are trivially separable and teach the model nothing; the highest-
    * similarity non-duplicates are where the decision boundary actually
    * gets trained. positive = the top neighbor overall; hard negatives =
    * top-3 under the threshold.
    *
    * Scale shape: identical to the ANN brute pass the corpus already
    * caches — anchors broadcast, corpus never shuffles, per-anchor top-k
    * via one window over the scored candidates (at web scale the scoring
    * side swaps to the LSH/IVF candidate path like `ann_*` does). */
  def sampleHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val dupThreshold = 0.4
    val c = Similarity.corpus(spark, dir)
    val anchors = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("anchor_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .select(col("anchor_id"), col("vec_id"), col("cosine"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id")).orderBy(col("cosine").desc, col("vec_id"))
    val positive = scored.withColumn("rk", row_number().over(wAll))
      .filter(col("rk") === 1)
      .select(col("anchor_id"), col("vec_id").as("positive_id"),
        round(col("cosine"), 6).as("positive_cos"))
    val hard = scored.filter(col("cosine") < dupThreshold)
      .withColumn("rk", row_number().over(wAll))
      .filter(col("rk") <= 3)
      .select(col("anchor_id"), col("rk").as("neg_rank"),
        col("vec_id").as("negative_id"), round(col("cosine"), 6).as("negative_cos"))
    positive.join(hard, "anchor_id")
      .select(col("anchor_id"), col("positive_id"), col("positive_cos"),
        col("neg_rank"), col("negative_id"), col("negative_cos"))
  }

  val sampleHardNegativesSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      |  FROM embeddings),
      |anchors AS (SELECT vec_id AS anchor_id, v AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT a.anchor_id, e.vec_id,
      |         list_sum(list_transform(list_zip(e.v, a.qv), p -> p[1] * p[2]))
      |           / (e.nrm * a.qn) AS cosine
      |  FROM e CROSS JOIN anchors a WHERE e.vec_id <> a.anchor_id),
      |pos AS (
      |  SELECT anchor_id, vec_id AS positive_id, round(cosine, 6) + 0 AS positive_cos
      |  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
      |                    ORDER BY cosine DESC, vec_id) AS rk FROM scored)
      |  WHERE rk = 1),
      |hard AS (
      |  SELECT anchor_id, rk AS neg_rank, vec_id AS negative_id,
      |         round(cosine, 6) + 0 AS negative_cos
      |  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
      |                    ORDER BY cosine DESC, vec_id) AS rk
      |        FROM scored WHERE cosine < 0.4)
      |  WHERE rk <= 3)
      |SELECT anchor_id, positive_id, positive_cos, neg_rank, negative_id, negative_cos
      |FROM pos JOIN hard USING (anchor_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hardneg"    -> (sampleHardNegatives _),
    "split_time_folds"  -> (splitTimeFolds _),
    "drift_psi"         -> (driftPsi _),
    "shard_manifest"    -> (shardManifest _),
    "sample_dsir"       -> (sampleDsir _),
    "split_train_val"   -> (splitTrainVal _),
    "sample_stratified" -> (sampleStratified _),
    "sample_reservoir"  -> (sampleReservoir _),
    "epoch_shuffle"     -> (epochShuffle _),
    "pack_sequences"    -> (packSequences _),
    "sample_mixture"    -> (sampleMixture _),
    "split_leakage"     -> (splitLeakage _),
    "split_by_cluster"  -> (splitByCluster _),
    "text_heavy_hitters" -> (heavyHitters _),
    "text_boilerplate_frac" -> (boilerplateFrac _),
    "pairs_contrastive" -> (pairsContrastive _))

  def oracles: Map[String, String] = Map(
    "sample_hardneg"    -> sampleHardNegativesSql,
    "split_time_folds"  -> splitTimeFoldsSql,
    "drift_psi"         -> driftPsiSql,
    "shard_manifest"    -> shardManifestSql,
    "sample_dsir"       -> sampleDsirSql,
    "split_train_val"   -> splitTrainValSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_reservoir"  -> sampleReservoirSql,
    "epoch_shuffle"     -> epochShuffleSql,
    "pack_sequences"    -> packSequencesSql,
    "sample_mixture"    -> sampleMixtureSql,
    "split_leakage"     -> splitLeakageSql,
    "split_by_cluster"  -> splitByClusterSql,
    "text_heavy_hitters" -> heavyHittersSql,
    "text_boilerplate_frac" -> boilerplateFracSql,
    "pairs_contrastive" -> pairsContrastiveSql)
}
