package graft.scale

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the feature-engineering suite; exact values are
  * pinned by the DuckDB oracles, these pin the algebraic properties
  * that must survive any refactor. */
class FeatureOpsSpec extends SparkSpec {

  test("time-decay weights are sub-counting and recency is non-negative") {
    val r = FeatureOps.featTimeDecay(spark, sfDir)
      .agg(
        sum(when(col("decayed_count") > col("n_events"), 1).otherwise(0)),
        sum(when(col("recency_days") < 0, 1).otherwise(0)))
      .head()
    // every weight is exp(-x) with x >= 0, so the decayed count can
    // never exceed the raw count, and the anchor postdates every event
    assert(r.getLong(0) == 0, "decayed_count exceeded n_events")
    assert(r.getLong(1) == 0, "event after the scoring anchor")
  }

  test("KS statistic is a probability and the split covers all events") {
    val rows = FeatureOps.driftKs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach { r =>
      val ks = r.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0, s"ks=$ks out of [0,1]")
    }
  }

  test("chunks tile every tokenized document with the declared overlap") {
    val chunks = FeatureOps.chunkDocuments(spark, sfDir).cache()
    // coverage: the last chunk of every doc reaches the doc's end
    val uncovered = chunks.groupBy(col("doc_id"), col("n_tokens"))
      .agg(max(col("start_tok") + col("n_chunk_tokens")).as("covered"))
      .filter(col("covered") < col("n_tokens"))
      .count()
    assert(uncovered == 0, "a document's tail is not covered by any chunk")
    // every chunk is non-empty and no chunk exceeds the window
    assert(chunks.filter(col("n_chunk_tokens") < 1 ||
      col("n_chunk_tokens") > 40).count() == 0)
    // chunk count per doc matches the stride arithmetic
    val badCount = chunks.groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_chunks"))
      .filter(col("n_chunks") =!=
        (ceil(greatest(col("n_tokens") - 40, lit(0)) / 30.0) + 1).cast("long"))
      .count()
    assert(badCount == 0, "chunk count disagrees with stride arithmetic")
    chunks.unpersist()
  }

  test("shard manifest partitions the corpus and skew is centered on 1") {
    val m = FeatureOps.shardManifest(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(m.agg(sum(col("n_docs"))).head().getLong(0) == nDocs)
    assert(m.count() <= 16)
    // mean of bytes_skew over shards is 1 by construction (each row is
    // n_bytes / mean(n_bytes)); allow rounding slack
    val meanSkew = m.agg(avg(col("bytes_skew"))).head().getDouble(0)
    assert(math.abs(meanSkew - 1.0) < 1e-4, s"mean skew $meanSkew")
    m.unpersist()
  }

  test("bootstrap CI brackets the point estimate and is ordered") {
    val rows = FeatureOps.bootstrapCi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"ci_lo $lo > ci_hi $hi")
      // Poisson-weighted replicate means concentrate around the mean;
      // with 32 replicates the 95% band must bracket it
      assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
    }
  }

  test("seasonal anomaly counts are bounded by the current window size") {
    val bad = FeatureOps.anomalySeasonal(spark, sfDir)
      .filter(col("n_anomalies") > col("n_cur") || col("n_anomalies") < 0)
      .count()
    assert(bad == 0)
  }

  test("fixed-point pagerank conserves mass up to truncation and ranks hubs first") {
    val pr = GraphOps.graphPagerank(spark, sfDir).cache()
    val n = pr.count()
    if (n > 0) {
      // each node truncates at most 1 unit per contribution per round;
      // total mass stays within n·4 units of the initial 1e6
      val total = pr.agg(sum(col("pr_units"))).head().getLong(0)
      assert(total <= 1000000L + n, s"mass above initial: $total")
      assert(total >= 1000000L - 6 * n, s"mass leaked: $total for $n nodes")
      // pagerank is monotone in degree for this near-clique graph family:
      // the top-ranked node must have at least the median degree
      val top = pr.orderBy(col("pr_units").desc).head()
      val medianDeg = pr.stat.approxQuantile("deg", Array(0.5), 0.0).head
      assert(top.getLong(1) >= medianDeg.toLong,
        s"top node degree ${top.getLong(1)} below median $medianDeg")
    }
    pr.unpersist()
  }

  test("calibrated scores are vigintiles in [0,1] and monotone in raw score") {
    val c = FeatureOps.qualityCalibrate(spark, sfDir).cache()
    assert(c.filter(col("calibrated_score") < 0 ||
      col("calibrated_score") > 0.95).count() == 0)
    // within a source, a higher raw score can never calibrate lower
    val inversions = c.as("a").join(c.as("b"),
        col("a.source") === col("b.source") &&
          col("a.raw_score") > col("b.raw_score") &&
          col("a.calibrated_score") < col("b.calibrated_score"))
      .count()
    assert(inversions == 0, "calibration is not monotone within a source")
    c.unpersist()
  }
}
