package graft.scale

import graft.SparkSpec
import graft.functions.{GraftFunctions, LshBuckets}
import org.apache.spark.sql.functions._

/** [[LshBuckets]] — the one-pass sign-LSH hasher: bit-identical to the
  * composed per-plane `when(graft_dot(...))` form it replaced (whose
  * 80-node tree fell out of codegen at sf10 and cost 80 s of the
  * lsh_mp wall), null-propagating, and config-validated. */
class LshBucketsSpec extends SparkSpec {

  private val L = 8
  private val b = 5
  private def flat: Array[Double] =
    Similarity.planes.take(L * b).flatten.toArray

  test("bit-identical to the composed per-plane dot/when form") {
    GraftFunctions.register(spark)
    val c = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), e => e.cast("double")).as("v"))
    // the pre-rewrite shape: b when(dot >= 0, 1<<i) terms per table
    def composed(t: Int) = (0 until b).map { i =>
      when(GraftFunctions.dot(col("v"),
        typedLit(Similarity.planes(t * b + i).toSeq)) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val both = c.select(col("vec_id"),
      GraftFunctions.lshBuckets(col("v"), flat, L, b).as("fast"),
      array((0 until L).map(composed): _*).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty,
      "one-pass buckets must equal the composed form on every vector")
    assert(both.count() > 0)
  }

  test("null vector yields null; interpreted eval matches codegen output") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Some(Array.fill(64)(0.5))), (2L, Option.empty[Array[Double]]))
      .toDF("id", "v")
      .select(col("id"), GraftFunctions.lshBuckets(col("v"), flat, L, b).as("bk"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[Long](1).length == L)
    assert(rows(1).isNullAt(1), "null vector must propagate null")
    // interpreted path (direct eval) agrees with the codegen'd result
    val expr = LshBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(64)(0.5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        flat, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal(L),
      org.apache.spark.sql.catalyst.expressions.Literal(b))
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(interpreted.toSeq == rows(0).getSeq[Long](1))
  }

  test("rejects a plane matrix whose length does not match the shape") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bad = intercept[Exception] {
      Seq((1L, Array.fill(64)(0.5))).toDF("id", "v")
        .select(GraftFunctions.lshBuckets(col("v"), flat.drop(1), L, b))
        .collect()
    }
    assert(bad.getMessage.contains("not a positive multiple") ||
      Option(bad.getCause).exists(_.getMessage.contains("not a positive multiple")))
  }
}
