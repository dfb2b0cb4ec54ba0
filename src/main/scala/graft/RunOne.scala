package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: run a single named query from [[SparkEntry.queries]] with
  * wall-clock timing; pass `explain` as a third arg to print the formatted
  * physical plan instead of executing twice.
  *
  * Usage: runMain graft.RunOne <name> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm runs measure what Bench's warm pass measures: the build-plan
    // variant for index-serving queries, the public entry otherwise
    val warmFn = SparkEntry.benchImpls.getOrElse(name, fn)
    if (args.contains("explain")) {
      warmFn(spark, sfDir).explain("formatted")
    } else {
      val t0 = System.nanoTime()
      val (n0, _) = BenchAction.consume(fn(spark, sfDir))
      println(f"[runone] $name cold: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n0 rows")
      (1 to 3).foreach { i =>
        val t1 = System.nanoTime()
        val (n, _) = BenchAction.consume(warmFn(spark, sfDir))
        println(f"[runone] $name warm$i: ${(System.nanoTime() - t1) / 1e9}%.2f s, $n rows")
      }
    }
    spark.stop()
  }
}
