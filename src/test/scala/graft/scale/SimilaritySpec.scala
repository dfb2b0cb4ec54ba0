package graft.scale

import graft.SparkSpec

/** K-means fit semantics on a fixture the sf corpus can't pin: empty
  * clusters must drop out of the codebook, and identical points must
  * tie-break to the lowest centroid id (the (dist, cid) rank), so the
  * fit is deterministic across engines and runs. */
class SimilaritySpec extends SparkSpec {

  test("kmeans collapses duplicate seeds and drops empty clusters") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-kmeans").toString
    val a = Array.fill(64)(1.0f)
    val b = Array.fill(64)(-1.0f)
    (0L to 11L).map(i => (i, if (i < 6) a else b, if (i < 6) "a" else "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Similarity.kmeansFit(spark, tmp).collect()
    // seeds 0-5 are copies of blob A, seeds 6-7 copies of blob B; every
    // point ties across its blob's seeds and rank-1 picks the lowest cid,
    // so only clusters 0 and 6 survive all three iterations
    val byCid = out.groupBy(_.getLong(0))
    assert(byCid.keySet == Set(0L, 6L))
    assert(byCid(0L).length == 64 && byCid(6L).length == 64)
    assert(byCid(0L).forall(r => r.getDouble(2) == 1.0 && r.getLong(3) == 6L))
    assert(byCid(6L).forall(r => r.getDouble(2) == -1.0 && r.getLong(3) == 6L))
  }

  test("IVF schedule: list population bounded at 256, floored at 16, capped") {
    // fixture corpora resolve to the k = 16 floor (outputs unchanged)
    assert(Similarity.ivfSchedule(500L) == 16)
    assert(Similarity.ivfSchedule(2000L) == 16)
    assert(Similarity.ivfSchedule(4096L) == 16, "exactly 256 per list still fits")
    // first corpus that overflows the floor doubles k
    assert(Similarity.ivfSchedule(4097L) == 32)
    // the sf1 / sf10 scale points the bench sweeps measure
    assert(Similarity.ivfSchedule(20000L) == 128)
    assert(Similarity.ivfSchedule(200000L) == 1024)
    // never unbounded: planetary corpora cap at 2^20 centroids
    assert(Similarity.ivfSchedule(1L << 40) == (1 << 20))
    // monotone, and the expected list length never exceeds 256 in range
    val ns = Seq(1L, 4096L, 4097L, 100000L, 10000000L, 256L * (1L << 20))
    val ks = ns.map(Similarity.ivfSchedule)
    assert(ks.sliding(2).forall { case Seq(a, b) => a <= b })
    ns.zip(ks).foreach { case (n, k) => assert(n <= 256L * k, s"n=$n k=$k") }
  }
}
