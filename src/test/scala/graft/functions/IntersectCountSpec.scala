package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd sorted-merge intersect-count expression: value semantics,
  * null propagation, and agreement with `size(array_intersect)` on the
  * real sorted-distinct shingle arrays it replaced in the dedup paths. */
class IntersectCountSpec extends SparkSpec {

  test("graft_intersect_count merges sorted arrays and propagates nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Option(Seq("a", "c", "e")), Option(Seq("b", "c", "e", "f"))),
      (2L, Option(Seq.empty[String]), Option(Seq("a"))),
      (3L, None: Option[Seq[String]], Option(Seq("a"))),
      (4L, Option(Seq("x")), None: Option[Seq[String]]))
      .toDF("id", "a", "b")
      .select(col("id"), GraftFunctions.intersectCount(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).getInt(1) == 2)
    assert(rows(1).getInt(1) == 0)
    assert(rows(2).isNullAt(1) && rows(3).isNullAt(1))
    assert(spark.sql(
      "SELECT graft_intersect_count(array('a','b'), array('b','c'))")
      .head().getInt(0) == 1)
  }

  test("graft_intersect_count equals size(array_intersect) on sorted distinct token arrays") {
    GraftFunctions.register(spark)
    val d = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_sort(array_distinct(split(lower(col("text")), "[^a-z0-9]+"))).as("ts"))
    val pairs = d.limit(40).crossJoin(
      d.limit(40).select(col("doc_id").as("id2"), col("ts").as("ts2")))
      .filter(col("doc_id") < col("id2"))
    val diverged = pairs.select(
      GraftFunctions.intersectCount(col("ts"), col("ts2")).as("fast"),
      size(array_intersect(col("ts"), col("ts2"))).as("builtin"))
      .filter(col("fast") =!= col("builtin"))
    assert(diverged.isEmpty, "merge count must equal the builtin on sorted distinct input")
  }

  test("graft_intersect_count participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val d = graft.Tables.documents(spark, sfDir)
      .select(array_sort(array_distinct(split(lower(col("text")), "[^a-z0-9]+"))).as("ts"))
      .select(GraftFunctions.intersectCount(col("ts"), col("ts")).as("c"))
    d.collect()
    val executed = d.queryExecution.executedPlan.toString
    assert(executed.contains("graft_intersect_count"), executed)
    assert(executed.contains("*("), "expected a whole-stage codegen span:\n" + executed)
  }
}
