package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup cluster assignment (connected components): correctness on the
  * real pair graph plus the invariants labels must satisfy. */
class DedupSpec extends SparkSpec {

  // sf0.01: sf0.001's corpus yields too few near-dup pairs to exercise
  // chaining; the driver's correctness gate runs at sf0.01 anyway
  private val dir = "/root/testdata/sf0.01"

  test("every near-dup pair lands in the same cluster, labeled by its component minimum") {
    val clusters = Dedup.dedupClusters(spark, dir).cache()
    val pairs = Dedup.minhashLshPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    assert(pairs.count() > 0)
    // co-clustering: both endpoints of every pair share a label
    val split = pairs
      .join(clusters.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(clusters.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split == 0, s"$split pairs split across clusters")
    // the label IS a member, and it is the minimum of its cluster
    val badLabel = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("min_member"))
      .filter(col("cluster_id") =!= col("min_member")).count()
    assert(badLabel == 0)
    // every clustered doc appears exactly once
    val dup = clusters.groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("label propagation resolves a chained component to one cluster") {
    import spark.implicits._
    // A≈B, B≈C, D≈E: two components {A,B,C} and {D,E} — the chain forces
    // at least two propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val edges = pairs.unionByName(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    (1 to 5).foreach { _ =>
      val nm = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("label")), "doc_b")
        .groupBy(col("doc_a").as("doc_id")).agg(min(col("label")).as("nlabel"))
      labels = labels.join(nm, Seq("doc_id"), "left")
        .select(col("doc_id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
    }
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(10L) == 10L && out(11L) == 10L)
  }

  test("paragraph dedup keeps a chunk only at its first global occurrence") {
    import spark.implicits._
    // doc 2's first 10 tokens copy doc 1's; doc 3 repeats its own chunk.
    // tokens() lowercases and splits on non-alphanumerics.
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
    val own2 = (1 to 10).map(i => s"own2x$i").mkString(" ")
    val rep3 = (1 to 10).map(i => s"rep3x$i").mkString(" ")
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-para").toString)
    Seq(
      (1L, shared, "en", "web", 100L),
      (2L, s"$shared $own2", "en", "web", 200L),
      (3L, s"$rep3 $rep3", "en", "web", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.dedupParagraphs(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 0L, shared)), "first occurrence keeps everything")
    assert(out(2L) == ((2L, 1L, own2)), "copied chunk dropped, novel chunk kept")
    assert(out(3L) == ((2L, 1L, rep3)), "in-doc repetition collapses to one copy")
  }

  test("fuzzy decontam flags the near-copy of a benchmark doc, not unrelated text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 97 is "benchmark" (97 % 97 = 0). doc 5 copies it with a small
    // edit (high shingle Jaccard, not exact). doc 6 shares nothing.
    val base = (1 to 40).map(i => s"bench$i").mkString(" ")
    val nearCopy = ((1 to 38).map(i => s"bench$i") ++ Seq("edited", "tail")).mkString(" ")
    val other = (1 to 40).map(i => s"other$i").mkString(" ")
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-decontam").toString)
    Seq(
      (97L, base, "en", "eval", 300L),
      (5L, nearCopy, "en", "web", 300L),
      (6L, other, "en", "web", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.decontamMinhash(spark, tmp).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getLong(0) == 5L && out.head.getLong(1) == 97L)
    assert(out.head.getDouble(2) > 0.8, "near-copy similarity should be high")
    // the real corpus: whatever is flagged must cross the 97-split
    val real = Dedup.decontamMinhash(spark, dir)
      .filter(col("doc_id") % 97 === 0 || col("bench_id") % 97 =!= 0)
    assert(real.count() == 0, "pairs must be corpus-vs-benchmark only")
  }

  test("keep-best retains exactly one doc per cluster and it has the top quality score") {
    val out = Dedup.dedupKeepBest(spark, dir).cache()
    val perCluster = out.groupBy(col("cluster_key"))
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        max(col("quality_score")).as("best"),
        max(when(col("keep"), col("quality_score"))).as("kept_score"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() == 0,
      "exactly one keeper per cluster")
    assert(perCluster.filter(col("kept_score") =!= col("best")).count() == 0,
      "the keeper carries the cluster-max quality score")
    assert(out.filter(!col("keep")).count() > 0, "fixture has clusters to resolve")
  }

  test("semantic dedup drops only the higher id of a same-centroid near-pair") {
    val out = Dedup.dedupSemantic(spark, dir).cache()
    // a dropped vector's shadow must be a smaller id in the SAME centroid
    val bad = out.filter(!col("keep"))
      .join(out.select(col("vec_id").as("dup_of"), col("centroid_id").as("cid2"),
        col("keep").as("keep2")), "dup_of")
      .filter(col("cid2") =!= col("centroid_id") || col("dup_of") >= col("vec_id"))
    assert(bad.count() == 0)
    assert(out.filter(!col("keep")).count() > 0, "fixture has semantic dups")
  }

  test("containment catches a quoted doc that Jaccard-tuned MinHash misses") {
    import spark.implicits._
    // doc 1 (12 tokens) is quoted wholesale inside doc 2 (120 tokens):
    // containment = 1.0 but Jaccard ≈ 0.09 — below the 0.5 MinHash gate
    val quote = (1 to 12).map(i => s"quoted$i").mkString(" ")
    val filler = (1 to 108).map(i => s"host$i").mkString(" ")
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-contain").toString)
    Seq(
      (1L, quote, "en", "web", 100L),
      (2L, s"$filler $quote", "en", "web", 900L),
      (3L, "an unrelated document with entirely different words", "en", "web", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.containmentPairs(spark, tmp).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L && p.getLong(2) == 1L)
    assert(p.getDouble(3) == 1.0, "the quote is fully contained")
    assert(p.getDouble(4) < 0.5, "below the Jaccard gate MinHash bands are tuned for")
    assert(Dedup.minhashLshPairs(spark, tmp).count() == 0,
      "MinHash (Jaccard >= 0.5) must structurally miss this pair")
  }

  test("a clean corpus (no near-dup pairs) yields an empty cluster set, not an NPE") {
    import spark.implicits._
    // unique texts with no shared shingles → zero LSH pairs → the
    // convergence aggregate sums zero rows (NULL) and must read as 0
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-clean").toString)
    (1L to 5L).map { i =>
      (i, s"unique document number $i with entirely distinct content token$i" +
        (1 to 10).map(j => s" filler${i}x$j").mkString, "en", "web", 60L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Dedup.minhashLshPairs(spark, tmp).count() == 0)
    assert(Dedup.dedupClusters(spark, tmp).count() == 0)
  }

  test("embedding LSH schedule: bucket-bounded bits, recall-guarding bands, capped") {
    // avg bucket population stays <= 256: bits grow with the corpus
    assert(Dedup.lshSchedule(500L) == ((2, 16)), "fixture scale keeps the legacy 2x16 shape")
    assert(Dedup.lshSchedule(2000L) == ((3, 24)))
    assert(Dedup.lshSchedule(200000L) == ((10, 64)))
    // never unbounded: a planetary corpus caps at 16 bits x 64 bands
    assert(Dedup.lshSchedule(1L << 40) == ((16, 64)))
    // monotone: more data never narrows the bands
    val scheds = Seq(1L, 1000L, 100000L, 10000000L).map(Dedup.lshSchedule)
    assert(scheds.sliding(2).forall { case Seq(a, b) => a._1 <= b._1 && a._2 <= b._2 })
  }
}
