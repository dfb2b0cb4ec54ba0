package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HadamardRotate]] — r15 codegen replacement for the HOF OPQ
  * rotation. Pins bit-identity against the HOF form it replaced (the
  * committed oracle shape) on real fixture embeddings, and the null /
  * arity contract. */
class HadamardRotateSpec extends SparkSpec {

  private def hofRotate(v: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(63)), i =>
      aggregate(
        zip_with(v, sequence(lit(0), lit(63)), (x, j) =>
          when((bit_count(i.bitwiseAND(j)) + bit_count(j)) % 2 === 0, x)
            .otherwise(-x)),
        lit(0.0), (a, b) => a + b) / 8.0)

  test("bit-identical to the HOF rotation on fixture embeddings") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = e.select(
      hofRotate(col("v")).as("hof"),
      GraftFunctions.hdRotate64(col("v")).as("fast")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hof = r.getSeq[Double](0)
      val fast = r.getSeq[Double](1)
      assert(hof.size == 64 && fast.size == 64)
      hof.zip(fast).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b), s"dim $i: $a != $b")
      }
    }
  }

  test("wrong arity or null element yields the all-null array") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      Seq.fill(63)(1.0).map(Option(_)),                  // short
      (Seq.fill(63)(1.0).map(Option(_)) :+ None)         // null element
    ).toDF("v")
    val out = df.select(GraftFunctions.hdRotate64(col("v")).as("r")).collect()
    out.foreach { r =>
      val arr = r.getSeq[Any](0)
      assert(arr.size == 64 && arr.forall(_ == null))
    }
  }

  test("arity > 64 yields the all-null array (documented HOF divergence)") {
    // the HOF form returns NON-null sums for a 65-element vector
    // (zip_with pads the sequence side; the null `when` condition
    // falls through to otherwise(-x)) — the expression deliberately
    // fails closed instead of reproducing that accidental arithmetic;
    // the scaladoc documents the divergence and this test pins it
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq.fill(65)(1.0).map(Option(_))).toDF("v")
    val fast = df.select(GraftFunctions.hdRotate64(col("v")).as("r")).collect()(0)
      .getSeq[Any](0)
    assert(fast.size == 64 && fast.forall(_ == null))
    val hof = df.select(hofRotate(col("v")).as("r")).collect()(0).getSeq[Any](0)
    // the divergence is real: the HOF yields at least one non-null cell
    assert(hof.exists(_ != null),
      "HOF no longer diverges at arity > 64 — update the scaladoc/contract")
  }

  test("null array yields null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Option.empty[Seq[Double]]).toDF("v")
    assert(df.select(GraftFunctions.hdRotate64(col("v"))).collect()(0).isNullAt(0))
  }
}
