package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants the ER stages must hold beyond the value oracle. */
class EntityResolutionSpec extends SparkSpec {

  test("golden records partition the corpus: sizes sum to the record count") {
    val total = graft.Tables.part(spark, sfDir).count()
    val golden = EntityResolution.erGolden(spark, sfDir)
    assert(golden.agg(sum("n_records")).head.getLong(0) === total)
    // a resolved_id is always a real record key
    val keys = graft.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("resolved_id"))
    assert(golden.join(keys, Seq("resolved_id"), "left_anti").count() === 0)
  }

  test("matches are ordered pairs above threshold, drawn from candidates") {
    val m = EntityResolution.erMatches(spark, sfDir)
    assert(m.filter(col("a_id") >= col("b_id")).count() === 0)
    assert(m.filter(col("score") < 120).count() === 0)
    val c = EntityResolution.erCandidates(spark, sfDir)
      .select(col("a_id"), col("b_id"))
    assert(m.select(col("a_id"), col("b_id"))
      .join(c, Seq("a_id", "b_id"), "left_anti").count() === 0)
  }

  test("transitive entity ids: every match edge is intra-entity, ids are component minima") {
    val comps = EntityResolution.erClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val byKey = comps.toMap
    assert(byKey.nonEmpty)
    // every matched pair lands in ONE entity (the clique shorthand can't
    // guarantee this for chains; components must)
    EntityResolution.erMatches(spark, sfDir).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(byKey(a)._1 == byKey(b)._1, s"match $a-$b split across entities")
    }
    // entity_id is the minimum member key; n_members is the component size
    comps.groupBy(_._2._1).foreach { case (eid, members) =>
      assert(members.map(_._1).min == eid, s"entity $eid not the min key")
      members.foreach { case (_, (_, n)) => assert(n == members.length) }
    }
  }

  test("incremental resolution covers exactly the batch, never maps into it") {
    val inc = EntityResolution.erIncremental(spark, sfDir)
    val batch = graft.Tables.part(spark, sfDir)
      .filter(col("p_partkey") % 20 === 0)
    assert(inc.count() === batch.count())
    // a matched record resolves to a CORPUS key; an unmatched one to itself
    assert(inc.filter(col("matched") && col("resolved_id") % 20 === 0)
      .count() === 0)
    assert(inc.filter(!col("matched") && col("resolved_id") =!= col("batch_id"))
      .count() === 0)
  }
}
