package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `ann_sq8_search` invariants beyond the oracle's content check: the
  * quantizer's range/anchor contract, the exactness of stage-2
  * re-scoring (quantization may reorder CANDIDATES, never the scores
  * of the survivors), and the recall the 10-wide candidate cut buys on
  * the fixture. */
class Sq8Spec extends SparkSpec {

  test("int8 quantizer: every cell in [-127,127], the max-|x| dim hits ±127, zero-safe") {
    val q = Similarity.sq8Corpus(spark, sfDir)
      .select(col("vec_id"), col("q"))
    val stats = q.select(
        max(array_max(transform(col("q"), x => abs(x)))).as("absmax"),
        min(array_max(transform(col("q"), x => abs(x)))).as("anchor"),
        sum(when(forall(col("q"), x => x === floor(x).cast("double")), 0)
          .otherwise(1)).as("nonint"))
      .head()
    assert(stats.getDouble(0) <= 127.0, "no quantized cell may exceed 127")
    // the max-|x| dim lands at ±127 up to floor's 1-ulp double-rounding
    // hazard ((x·127)/x can round to 126.999…, and the negative max to
    // -127-ulp — the clamp catches the latter), so the anchor bound is
    // 126, not an exact 127: corpus-independent, unlike the old ==127
    assert(stats.getDouble(1) >= 126.0, "each vector must anchor its scale near ±127")
    assert(stats.getLong(2) == 0L, "every quantized cell must be an exact integer")
  }

  test("serve path: stored-int8 stage 1 is bit-identical to the inline search") {
    val served = Similarity.annSq8Serve(spark, sfDir)
    val inline = Similarity.annSq8Search(spark, sfDir)
    assert(served.exceptAll(inline).isEmpty && inline.exceptAll(served).isEmpty,
      "TINYINT round-trip must not change a single row")
    // the physical claim: the warm read's stage-1 scan reads the stored
    // quantized table (TINYINT schema over the scratch path), not the
    // embeddings parquet re-quantized inline
    val plan = Similarity.sq8ServeRead(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val tmp = Similarity.sq8ServePath(sfDir)
    assert(plan.contains(tmp), "stage 1 must scan the materialized qtable:\n" + plan)
    graft.util.Scratch.cleanupPath(tmp)
  }

  test("stage-2 re-scoring is exact: surviving (query, neighbor) cosines equal brute force") {
    val sq8 = Similarity.annSq8Search(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    val brute = Similarity.annBruteForce(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bcos"))
    val joined = sq8.join(brute, Seq("query_id", "neighbor_id"))
    // every sq8 winner that brute force also ranked must carry the
    // IDENTICAL exact cosine — stage 2 is not approximate
    assert(joined.filter(col("cosine") =!= col("bcos")).isEmpty,
      "re-scored cosines must be bit-identical to exact search")
    // 10-wide candidates at 127-level resolution: top-3 recall vs
    // exact must be high; on the deterministic fixture pin ≥ 2/3 per
    // query (quantization may legitimately swap a near-tie boundary)
    val perQuery = joined.groupBy(col("query_id")).count()
    assert(perQuery.filter(col("count") < 2).isEmpty,
      "each query must recover at least 2 of the exact top-3")
  }

  test("IVF-SQ8 composition: results come only from probed lists, re-scored exactly") {
    val ivfsq = Similarity.annIvfSqSearch(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    // routing containment: every winner must be a vector the ivf2
    // probed-list scan also saw (same routing, exact vs quantized list
    // scores) — a result from an unprobed list means routing leaked
    val probedPop = Similarity.annIvf2Search(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val exactCand = Similarity.annBruteForce(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bcos"))
    val joined = ivfsq.join(exactCand, Seq("query_id", "neighbor_id"))
    // stage-2 exactness carries through the composition: any ivfsq
    // winner brute force also ranked carries the IDENTICAL cosine
    assert(joined.filter(col("cosine") =!= col("bcos")).isEmpty,
      "IVF-SQ8 re-scored cosines must be bit-identical to exact search")
    // and the top-1 per query must agree with the exact probed scan's
    // top-1 (127-level quantization cannot reorder a clear winner on
    // this fixture; deeper ranks may legitimately swap near-ties)
    val sqTop1 = ivfsq.join(Similarity.annIvfSqSearch(spark, sfDir)
        .filter(col("rank") === 1).select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id"))
    val ivfTop1 = Similarity.annIvf2Search(spark, sfDir)
      .filter(col("rank") === 1).select(col("query_id"), col("neighbor_id"))
    assert(sqTop1.select(col("query_id"), col("neighbor_id"))
      .exceptAll(ivfTop1).isEmpty,
      "per-query top-1 must match the exact probed scan")
    assert(probedPop.count() == 30, "ivf2 probed top-3 population sanity")
  }

  test("IVF-SQ8 serve: stored routing tables + stored int8 corpus, bit-identical") {
    val served = Similarity.annIvfSqServe(spark, sfDir)
    val inline = Similarity.annIvfSqSearch(spark, sfDir)
    assert(served.exceptAll(inline).isEmpty && inline.exceptAll(served).isEmpty,
      "the composed serve path must not change a single row")
    // both stored halves must appear in the warm read's scan set
    val plan = Similarity.ivfSqServeRead(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains(Similarity.ivf2ServePath(sfDir)),
      "routing must read the stored ivf2 index:\n" + plan)
    assert(plan.contains(Similarity.sq8ServePath(sfDir)),
      "the probed-list scan must read the stored int8 corpus:\n" + plan)
    graft.util.Scratch.cleanupPath(Similarity.ivf2ServePath(sfDir))
    graft.util.Scratch.cleanupPath(Similarity.sq8ServePath(sfDir))
  }

  test("the storage claim is physical: a stored int8 table is a fraction of the float table") {
    // the scan-size win the operator's scaladoc claims, measured on
    // disk: the same vectors written as ARRAY<TINYINT> (the stored
    // form a deployment scans in stage 1) vs ARRAY<DOUBLE>. Random
    // doubles are incompressible (~8 B/dim); int8 cells bit-pack.
    val dir = graft.util.Scratch.path("sq8bytes", sfDir)
    val c = Similarity.sq8Corpus(spark, sfDir)
    c.select(col("vec_id"), transform(col("q"), x => x.cast("tinyint")).as("q"))
      .write.mode("overwrite").parquet(s"$dir/q8")
    c.select(col("vec_id"), col("v"))
      .write.mode("overwrite").parquet(s"$dir/f64")
    def bytes(p: String): Long =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (q8b, f64b) = (bytes(s"$dir/q8"), bytes(s"$dir/f64"))
    assert(q8b > 0 && f64b > 0)
    assert(q8b.toDouble / f64b < 0.45,
      f"quantized table must be well under half the float table: " +
        f"$q8b vs $f64b (${q8b.toDouble / f64b}%.2f)")
    graft.util.Scratch.cleanupPath(dir)
  }
}
