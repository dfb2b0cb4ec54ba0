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
    // per-doc predicates commute with per-doc shingling, so both sides
    // filter the shared memoized shingle index instead of re-tokenizing
    val sh = Dedup.shingleIndex(spark, dir)
    val isBench = col("doc_id") % 97 === 0
    val benchShingles = sh.filter(isBench)
      .select(col("s")).distinct().withColumn("hit", lit(1))
    sh.filter(!isBench)
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

  /** Bloom-prefiltered decontamination — the 100 TB shape of
    * [[decontamOverlap]] when the benchmark shingle set outgrows a
    * comfortable broadcast HASH relation: Spark's own runtime-filter
    * machinery (`BloomFilterAggregate` → one binary row of bits,
    * `BloomFilterMightContain` probe on `xxhash64(s)`, the exact pair
    * `InjectRuntimeFilter` plants under shuffle joins) is driven here
    * explicitly. Bits are ~10 bits/element vs ~100+ bytes/entry for a
    * hash relation — an ~80× smaller ship — and the probe drops
    * non-overlapping corpus shingle rows MAP-SIDE, before any shuffle,
    * so the exact join only sees the contaminated sliver.
    *
    * A Bloom filter has NO false negatives, so prefilter → exact verify
    * is lossless: the output is bit-identical to [[decontamOverlap]]
    * and shares its oracle. The filter bytes take one fit-sized driver
    * hop (`DataFrameStatFunctions.bloomFilter` does the same); at
    * cluster scale the same plan ships as a scalar subquery. */
  def decontamBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val sh = Dedup.shingleIndex(spark, dir)
    val isBench = col("doc_id") % 97 === 0
    val bench = sh.filter(isBench).select(col("s")).distinct()
    val bloomAgg = GraftShim.column(
      new BloomFilterAggregate(GraftShim.expression(xxhash64(col("s"))), 100000L)
        .toAggregateExpression())
    val bits = bench.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = GraftShim.column(new BloomFilterMightContain(
      Literal.create(bits, org.apache.spark.sql.types.BinaryType),
      GraftShim.expression(xxhash64(col("s")))))
    val corpus = sh.filter(!isBench)
    val totals = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.filter(mightContain) // map-side bloom prune
      .join(broadcast(bench), Seq("s")) // exact verify kills the FPs
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("contaminated_frac"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles") >= 0.2)
          .as("contaminated"))
  }

  // ---------------------------------------------------------- repetition
  /** Intra-document repetition metrics (the Gopher repetition filters,
    * re-based on tokens/bigrams because the fixture's text has no line
    * structure): type/token ratio, most-frequent-token fraction,
    * duplicate-bigram fraction (1 − distinct/total), and the share of
    * the doc covered by its top bigram. Docs with fewer than two tokens
    * keep null bigram metrics (left join) in both engines. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // token rows and bigram rows are both pure map stages: counts don't
    // need positions, and adjacent pairs come from zipping the token
    // array with its own tail (the bpeMergesImpl shape) — the
    // posexplode+lead window this replaces paid a doc_id shuffle and a
    // per-doc sort before the first aggregate
    val tokArr = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
    val toks = tokArr.select(col("doc_id"), explode(col("ts")).as("tok"))
    val n1 = greatest(size(col("ts")) - 1, lit(0))
    val bigrams = tokArr
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), n1), slice(col("ts"), lit(2), n1),
        (l, r) => concat_ws(" ", l, r))).as("b"))
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

  // ---------------------------------------------------------- fused pipeline
  /** The training-corpus flagship: the FULL curation path as ONE lazy
    * plan — drop benchmark docs → exact-dedup representatives → quality
    * gate (score ≥ 0.4) → decontamination (benchmark 3-gram overlap
    * < 20%, broadcast) → PII census → deterministic split assignment.
    * The document analog of `pipeline_full`: where the reference-style
    * pipeline would materialize between stages, every stage here is a
    * transformation over the same DAG, so Catalyst sees — and
    * optimizes — the whole path at once. Output: one row per surviving
    * doc with its score, contamination fraction, PII hit count, and
    * split. */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val isBench = col("doc_id") % 97 === 0
    val corpus = docs.filter(!isBench)
    // stage 1: exact dedup — keep each content hash's lowest doc_id
    val reps = corpus.groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val kept = corpus.join(reps, Seq("doc_id"), "left_semi")
    // stage 2: quality gate on the ROUNDED score (what the user sees)
    val scored = kept
      .withColumn("quality_score", round(graft.scale.TextAnalysis.qualityScoreCol, 6))
      .filter(col("quality_score") >= 0.4)
    // stage 3: decontamination — benchmark shingle set broadcast.
    // Both sides FILTER the shared shingle index (per-doc shingling
    // commutes with per-doc predicates — see Dedup.shingleIndex): the
    // pipeline reads the materialized index a corpus maintains anyway
    // instead of re-tokenizing the corpus twice inline.
    val benchShingles = Dedup.shingleIndex(spark, dir)
      .filter(col("doc_id") % 97 === 0)
      .select(col("s")).distinct().withColumn("hit", lit(1))
    val fracs = Dedup.shingleIndex(spark, dir)
      .join(scored.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .join(broadcast(benchShingles), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg((count(col("hit")).cast("double") / count(lit(1))).as("frac"))
    // stage 4: keep clean docs, assign the deterministic split
    val b = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100
    scored.join(fracs, Seq("doc_id"), "left")
      .filter(coalesce(col("frac"), lit(0.0)) < 0.2)
      .select(col("doc_id"), col("quality_score"),
        round(coalesce(col("frac"), lit(0.0)), 6).as("contaminated_frac"),
        graft.scale.TextAnalysis.piiHitsCol.as("n_pii"),
        when(b < 90, "train").when(b < 95, "val").otherwise("test").as("split"))
  }

  val corpusPipelineSql: String =
    s"""WITH ${graft.scale.TextAnalysis.qualityCtes},
       |reps AS (
       |  SELECT min(doc_id) AS doc_id FROM documents
       |  WHERE doc_id % 97 <> 0 GROUP BY md5(text)),
       |qualified AS (
       |  SELECT q.doc_id, round(q.score, 6) + 0 AS quality_score
       |  FROM qs q JOIN reps r ON r.doc_id = q.doc_id
       |  WHERE round(q.score, 6) >= 0.4),
       |toks2 AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |shs2 AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS sgl FROM toks2),
       |bench2 AS (SELECT DISTINCT sgl FROM shs2 WHERE doc_id % 97 = 0),
       |fr AS (
       |  SELECT c.doc_id, count(b.sgl) * 1.0 / count(*) AS frac
       |  FROM (SELECT doc_id, sgl FROM shs2
       |        WHERE doc_id IN (SELECT doc_id FROM qualified)) c
       |  LEFT JOIN bench2 b ON c.sgl = b.sgl
       |  GROUP BY c.doc_id)
       |SELECT q.doc_id, q.quality_score,
       |  round(coalesce(fr.frac, 0), 6) + 0 AS contaminated_frac,
       |  ${graft.scale.TextAnalysis.piiHitsSql("d.text")} AS n_pii,
       |  CASE WHEN ('0x' || substr(md5(q.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'train'
       |       WHEN ('0x' || substr(md5(q.doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM qualified q
       |JOIN documents d ON d.doc_id = q.doc_id
       |LEFT JOIN fr ON fr.doc_id = q.doc_id
       |WHERE coalesce(fr.frac, 0) < 0.2""".stripMargin

  // ------------------------------------------------- substring-run dedup
  /** Substring-level duplication profile (the Lee-et-al "deduplicating
    * training data" signal, at shingle granularity): a POSITIONAL shingle
    * is duplicated when its text occurs in ≥ 2 distinct documents; per doc
    * report the duplicated fraction and the LONGEST consecutive duplicated
    * run — long runs are verbatim-copied passages that survive doc-level
    * near-dup thresholds.
    *
    * Scale shape: positional shingles shuffle once on the shingle text
    * (count-distinct docs), the ≥2-doc set joins back on the SAME key (a
    * co-partitioned exchange Catalyst reuses), and the run-length pass is
    * gaps-and-islands on the per-doc exchange. Never docs² — duplication
    * is decided per shingle string, not per pair. */
  def substringRuns(spark: SparkSession, dir: String): DataFrame = {
    val wPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // r16: REVERTED back to the r15 lead-window shape after a measured
    // round trip. The "pure map" variant (shingles as a token-array
    // transform, no window) looked better ISOLATED (RunOne 1.55 vs
    // 1.84 s) but its three consumers (df aggregate, totals aggregate,
    // runs window) each re-ran tokenize+shingle from the scan with no
    // shuffle boundary to reuse, and IN-BENCH it measured 2.0–2.4 s vs
    // 1.15 s for this form across three full runs; pinning it with an
    // explicit doc_id exchange shuffled 3M shingle strings and was
    // worse still (1.83–2.53 isolated). This form tokenizes ONCE into
    // the window's doc_id exchange, which all three branches reuse.
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(wPos))
      .withColumn("t2", lead(col("tok"), 2).over(wPos))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("s"))
    val dupSet = sh.groupBy(col("s"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("s"), lit(true).as("dup"))
    val flagged = sh.join(dupSet, Seq("s"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(false)))
    val totals = flagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"))
    val runs = flagged.filter(col("dup"))
      .withColumn("island", col("pos") - row_number().over(wPos))
      .groupBy(col("doc_id"), col("island")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id")).agg(max(col("run")).as("max_dup_run"))
    totals.join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_shingles"), 6).as("dup_frac"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  val substringRunsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |pos AS (
       |  SELECT doc_id, unnest(generate_series(1, len(ts) - 2)) AS pos, ts
       |  FROM toks WHERE len(ts) >= 3),
       |sh AS (
       |  SELECT doc_id, pos, ts[pos] || ' ' || ts[pos+1] || ' ' || ts[pos+2] AS s
       |  FROM pos),
       |dups AS (
       |  SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
       |flagged AS (
       |  SELECT sh.doc_id, sh.pos, d.s IS NOT NULL AS dup
       |  FROM sh LEFT JOIN dups d USING (s)),
       |totals AS (
       |  SELECT doc_id, count(*) AS n_shingles,
       |         CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM flagged GROUP BY doc_id),
       |islands AS (
       |  SELECT doc_id,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM flagged WHERE dup),
       |runs AS (
       |  SELECT doc_id, max(cnt) AS max_dup_run FROM (
       |    SELECT doc_id, island, count(*) AS cnt FROM islands GROUP BY 1, 2) g
       |  GROUP BY doc_id)
       |SELECT t.doc_id, t.n_shingles, t.n_dup,
       |  round(t.n_dup * 1.0 / t.n_shingles, 6) + 0 AS dup_frac,
       |  coalesce(r.max_dup_run, 0) AS max_dup_run
       |FROM totals t LEFT JOIN runs r USING (doc_id)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontam_overlap" -> (decontamOverlap _),
    "decontam_bloom"   -> (decontamBloom _),
    "text_repetition"  -> (textRepetition _),
    "corpus_pipeline"  -> (corpusPipeline _),
    "dedup_substring_runs" -> (substringRuns _))

  def oracles: Map[String, String] = Map(
    "decontam_overlap" -> decontamOverlapSql,
    "decontam_bloom"   -> decontamOverlapSql,
    "text_repetition"  -> textRepetitionSql,
    "corpus_pipeline"  -> corpusPipelineSql,
    "dedup_substring_runs" -> substringRunsSql)
}
