package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EwmAvg vs a direct Scala implementation of pandas
  * `ewm(span, adjust=True).mean()` — including null skipping and
  * multi-key partitions. */
class EwmAvgSpec extends SparkSpec {

  /** Direct O(n²)-free reference recurrence, identical math to pandas
    * adjust=True with ignore_na handling for leading nulls. */
  private def refEwm(xs: Seq[Option[Double]], span: Int): Seq[Option[Double]] = {
    val alpha = 2.0 / (span + 1)
    var num = 0.0; var den = 0.0; var seen = false
    xs.map {
      case Some(x) =>
        num = num * (1 - alpha) + x
        den = den * (1 - alpha) + 1.0
        seen = true
        Some(num / den)
      case None => if (seen) Some(num / den) else None
    }
  }

  test("ewm_avg matches pandas adjust=True recurrence per key, skipping nulls") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val data = for {
      k <- Seq("a", "b", "c")
      i <- 0 until 200
    } yield (k, i, if (i == 0 || rnd.nextDouble() < 0.05) None else Some(rnd.nextDouble() * 100))
    import spark.implicits._
    val df = data.toDF("k", "i", "x")
    val w = Window.partitionBy($"k").orderBy($"i").rowsBetween(Window.unboundedPreceding, 0)
    val got = df.withColumn("e", GraftFunctions.ewmAvgSpan($"x", 14).over(w))
      .orderBy($"k", $"i").select($"k", $"e").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val expected = Seq("a", "b", "c").flatMap { k =>
      val xs = data.filter(_._1 == k).sortBy(_._2).map(_._3)
      refEwm(xs, 14).map(k -> _)
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((k1, g), (k2, e)) =>
      assert(k1 == k2)
      (g, e) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$a vs $b")
        case (a, b) => assert(a == b)
      }
    }
  }

  test("ewm_avg is registered for SQL text via session extensions") {
    import spark.implicits._
    Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)).toDF("k", "i", "x")
      .createOrReplaceTempView("ewm_t")
    val rows = spark.sql(
      """SELECT ewm_avg(x, 0.5) OVER (PARTITION BY k ORDER BY i
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewm_t ORDER BY i""".stripMargin).collect().map(_.getDouble(0))
    // adjust=True: e2 = (20 + 0.5*10)/(1 + 0.5); e3 = (30 + .5*20 + .25*10)/(1.75)
    assert(math.abs(rows(0) - 10.0) < 1e-12)
    assert(math.abs(rows(1) - 25.0 / 1.5) < 1e-12)
    assert(math.abs(rows(2) - 42.5 / 1.75) < 1e-12)
  }
}
