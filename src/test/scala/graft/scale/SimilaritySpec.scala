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
}
