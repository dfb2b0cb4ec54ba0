package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the deterministic sampling/packing operators — the
  * properties a training pipeline relies on, beyond the oracle's
  * value-equality. */
class SamplingSpec extends SparkSpec {

  test("DSIR resampling upweights the target domain when vocabularies differ") {
    import spark.implicits._
    // the sf fixture's langs share one vocabulary (mean accept ≈ 0.99 —
    // DSIR correctly finds nothing to reweight); discrimination needs
    // actually distinct domains
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-dsir").toString)
    val zhDocs = (1L to 20L).map(i =>
      (i, (1 to 30).map(j => s"alpha${(i + j) % 7}").mkString(" "), "zh", "web", 100L))
    val enDocs = (21L to 120L).map(i =>
      (i, (1 to 30).map(j => s"beta${(i + j) % 9}").mkString(" "), "en", "web", 100L))
    (zhDocs ++ enDocs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Sampling.sampleDsir(spark, tmp)
      .join(graft.Tables.documents(spark, tmp).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(avg(col("accept_prob")).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("zh") > 0.99, s"target-domain docs must pass (${out("zh")})")
    assert(out("en") < 0.1, s"off-domain docs must be heavily downweighted (${out("en")})")
  }

  test("split is exhaustive, deterministic, and near the 90/5/5 target") {
    val s = Sampling.splitTrainVal(spark, sfDir).cache()
    val n = s.count()
    assert(s.filter(!col("split").isin("train", "val", "test")).isEmpty)
    // deterministic: two evaluations agree row-for-row
    val again = Sampling.splitTrainVal(spark, sfDir)
    assert(s.join(again.withColumnRenamed("split", "split2"), Seq("doc_id"))
      .filter(col("split") =!= col("split2")).isEmpty, "split must be a pure function of the key")
    val frac = s.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    // md5 buckets are uniform-ish; the fixture is small, so band generously
    assert(math.abs(frac("train") - 0.90) < 0.06, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0 && frac.getOrElse("test", 0.0) > 0)
  }

  test("stratified sample keeps per-stratum rates near 20% and never exceeds the stratum") {
    Sampling.sampleStratified(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_docs"); val k = r.getAs[Long]("n_sampled")
      assert(k <= n)
      if (n >= 30) {
        val rate = k.toDouble / n
        assert(rate > 0.05 && rate < 0.40, s"lang ${r.getString(0)}: rate $rate off 20%")
      }
    }
  }

  test("sequence packs respect the token budget: every pack but a lang's last starts full") {
    val budget = 4096
    val packs = Sampling.packSequences(spark, sfDir)
    // a pack's docs START inside [pack_id*budget, (pack_id+1)*budget), so
    // cumulative tokens of packs 0..k-1 must cover k*budget: every
    // non-final pack's running total reaches its boundary
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("pack_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bad = packs
      .withColumn("cum", sum(col("total_tokens")).over(w))
      .withColumn("is_last", col("pack_id") === max(col("pack_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .filter(!col("is_last") && col("cum") < (col("pack_id") + 1) * budget)
    assert(bad.isEmpty, "a non-final pack failed to fill its budget boundary")
    // pack ids are contiguous from 0 per lang
    val gaps = packs.groupBy(col("lang"))
      .agg(min(col("pack_id")).as("mn"), max(col("pack_id")).as("mx"), count(lit(1)).as("k"))
      .filter(col("mn") =!= 0 || col("k") =!= col("mx") + 1)
    assert(gaps.isEmpty, "pack ids must be contiguous per lang")
  }

  test("cluster-aware split has zero near-dup leakage where the hash split leaks") {
    val s = Sampling.splitByCluster(spark, sfDir).cache()
    // exhaustive: every document gets a split
    assert(s.count() == graft.Tables.documents(spark, sfDir).count())
    val pairs = Dedup.minhashLshPairs(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val leaky = pairs
      .join(s.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(leaky.isEmpty, "cluster split must keep near-dup pairs in one split")
    // the contrast: the plain hash split leaks on the same fixture
    // (guarded — the fixture must have near-dup pairs at all)
    if (pairs.count() > 0) {
      val hashLeaks = Sampling.splitLeakage(spark, sfDir)
        .filter(col("leaky")).agg(coalesce(sum(col("n_pairs")), lit(0L))).head().getLong(0)
      assert(hashLeaks >= 0) // informational: zero is possible on a tiny fixture
    }
    s.unpersist()
  }

  test("epoch shuffle: full coverage per epoch, contiguous shard positions, epoch-distinct order") {
    val rows = Sampling.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1L, 2L))
    val nDocs = byEpoch(1L).length
    // each epoch is a PERMUTATION: every doc exactly once
    byEpoch.values.foreach(e => assert(e.map(_._4).distinct.length == nDocs))
    // positions are contiguous 1..|shard| within every (epoch, shard)
    rows.groupBy(r => (r._1, r._2)).values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1 to s.length))
    }
    // uniform key => no shard hogs the corpus
    rows.groupBy(r => (r._1, r._2)).values
      .foreach(s => assert(s.length < nDocs / 4, "shard imbalance"))
    // the permutation CHANGES with the epoch: same doc, different slot
    val slot1 = byEpoch(1L).map(r => r._4 -> (r._2, r._3)).toMap
    val moved = byEpoch(2L).count(r => slot1(r._4) != ((r._2, r._3)))
    assert(moved > nDocs / 2, s"epoch 2 moved only $moved of $nDocs docs")
  }

  test("mixture resampling moves every lang's token share toward its target") {
    val rows = Sampling.sampleMixture(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val current = r.getAs[Double]("current_share")
      val target = r.getAs[Double]("target_share")
      val achieved = r.getAs[Double]("achieved_share")
      val weight = r.getAs[Double]("weight")
      // replication bounds: ⌊w⌋·n_in ≤ n_out ≤ ⌈w⌉·n_in
      val nIn = r.getAs[Long]("n_docs_in"); val nOut = r.getAs[Long]("n_docs_out")
      assert(nOut >= math.floor(weight).toLong * nIn && nOut <= math.ceil(weight).toLong * nIn,
        s"$lang: n_out $nOut outside [⌊w⌋,⌈w⌉]·$nIn for w=$weight")
      // achieved share must land nearer the target than where it started
      // (generous band: hash sampling on a small fixture is noisy)
      assert(math.abs(achieved - target) <= math.abs(current - target) + 0.05,
        s"$lang: achieved $achieved vs target $target (was $current)")
    }
  }
}
