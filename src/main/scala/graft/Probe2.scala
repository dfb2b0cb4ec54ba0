package graft
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val c = graft.Tables.candles(spark, "/root/testdata/sf0.1")
    try { println("no-filter div count: " + c.select((col("high") / col("low")).as("x")).count()) }
    catch { case e: Throwable => println("no-filter div threw: " + e.getMessage.take(50)) }
    try { println("agg: " + c.select(sum(col("high") / col("low"))).collect().toSeq) }
    catch { case e: Throwable => println("agg threw: " + e.getMessage.take(50)) }
    spark.stop()
  }
}
