package graft.scale

import graft.SparkSpec

/** Pins the mapPartitions fake-decode math (rows-only in the driver
  * check) to a direct computation over the same utf-8 bytes. */
class MultimodalSpec extends SparkSpec {

  test("decode features match direct byte-level computation") {
    val got = Multimodal.decodeFeatures(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    val texts = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val (nBytes, meanByte, entropy) = got(id)
      assert(nBytes == bytes.length)
      val expMean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
      assert(math.abs(meanByte - math.rint(expMean * 1e6) / 1e6) < 1e-6)
      val hist = new Array[Long](16)
      bytes.foreach(b => hist((b & 0xff) >> 4) += 1)
      val expEntropy = -hist.filter(_ > 0).map { c =>
        val p = c.toDouble / bytes.length; p * math.log(p)
      }.sum / math.log(2)
      assert(math.abs(entropy - expEntropy) < 1e-5, s"doc $id entropy")
    }
  }

  test("media schema: binary payload + flat typed metadata") {
    val schema = Multimodal.mediaTable(spark, sfDir).schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(schema("format").dataType.typeName == "string")
  }

  test("phash candidates shrink the pair space and keep most true near-dups") {
    import org.apache.spark.sql.functions._
    val cand = Multimodal.phashDedup(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).cache()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val nCand = cand.count()
    assert(nCand < nDocs * (nDocs - 1) / 2 / 10,
      s"candidate set must prune >90% of the pair space ($nCand of ${nDocs * (nDocs - 1) / 2})")
    val truth = Dedup.minhashLshPairs(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val nTruth = truth.count()
    val hit = truth.join(cand, Seq("doc_a", "doc_b")).count()
    assert(hit * 10 >= nTruth * 7,
      s"byte-stat candidates must recall >=70% of MinHash near-dups ($hit of $nTruth)")
  }

  test("frame sampling skips empty payloads instead of throwing on a zero stride") {
    import spark.implicits._
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-mm-empty").toString)
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "x" * 100, "en", "web", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val frames = Multimodal.frameSample(spark, tmp).collect()
    assert(!frames.exists(_.getLong(0) == 1L), "empty doc must emit no frames")
    // 100 bytes → 4 frames, stride 1 → all 4 sampled
    assert(frames.count(_.getLong(0) == 2L) == 4)
  }
}
