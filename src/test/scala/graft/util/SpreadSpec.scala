package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Spread]] — the r16 shared gate/width policy behind every explicit
  * engine repartition. Pins the scale-safety contract the r15 verdict
  * asked for: an already-wide input keeps its plan (no fact-table
  * shuffle at 100 TB), a narrow input spreads to at least the cluster
  * width, and the width grows with the input's size estimate rather
  * than pinning to the local core count. */
class SpreadSpec extends SparkSpec {

  test("ifNarrow leaves an already-wide frame untouched — same plan, no exchange") {
    val para = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 10000, 1, para * 4).toDF("event_id")
    val out = Spread.ifNarrow(wide, col("event_id"))
    // the SAME DataFrame reference comes back: no repartition node at all
    assert(out eq wide)
  }

  test("ifNarrow spreads a narrow frame to at least the cluster width") {
    val para = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 10000, 1, 1).toDF("event_id")
    val out = Spread.ifNarrow(narrow, col("event_id"))
    assert(out ne narrow)
    assert(out.rdd.getNumPartitions >= para)
    // deterministic hash partitioning on the key, never round-robin
    assert(out.queryExecution.optimizedPlan.toString.contains("event_id"))
  }

  test("width of a checkpointed frame (unknown stats) falls back to cluster width") {
    // a LogicalRDD's size estimate can be defaultSizeInBytes
    // (Long.MaxValue-ish); that must read as UNKNOWN → cluster width,
    // never as "huge" → maxParts (the k1 writer would have shuffled
    // 4695 rows into 65536 partitions)
    val para = spark.sparkContext.defaultParallelism
    val cp = spark.range(100).toDF("id").localCheckpoint()
    assert(Spread.width(cp) <= math.max(para, 2))
  }

  test("width follows the size estimate upward and is capped") {
    val para = spark.sparkContext.defaultParallelism
    val tiny = spark.range(10).toDF("id")
    assert(Spread.width(tiny) == para) // fixture scale: floor = cores
    // a frame whose plan-estimated size is huge must get a bytes-derived
    // width, not the core count (range stats are exact: rows × 8 bytes)
    val big = spark.range(1L << 31).toDF("a")
    assert(Spread.width(big) > para)
    assert(Spread.width(big, maxParts = 64) == 64) // cap holds
  }

  test("width above a join ignores the multiplicative product estimate") {
    // Catalyst multiplies child sizes through joins, so a KB-scale
    // self-join reads as TB-scale; width must follow the SUM of the
    // leaf estimates instead (observed: containment's candidate join
    // drove width to 65536 — a 65k-task shuffle of 50k rows)
    val para = spark.sparkContext.defaultParallelism
    val kb = spark.range(1000).toDF("a")
    val joined = kb.crossJoin(spark.range(1000).toDF("b"))
    assert(Spread.width(joined) == para) // leaf sum is KB → floor = cores
    // but genuinely-large leaves still scale the width up through a join
    val bigLeaves = spark.range(1L << 31).toDF("a")
      .join(spark.range(1L << 31).toDF("b"), col("a") === col("b"))
    assert(Spread.width(bigLeaves) > para)
  }
}
