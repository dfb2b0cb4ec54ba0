package graft.scale

import org.apache.spark.sql.SparkSession

/** Round-level receipts for the distributed graph loops: runs each
  * named registered query (default: the five loop-driving queries) at
  * `args(0)` and prints the [[GraphTelemetry]] table — one line per
  * loop run (edges, partitions, rounds, wall) and one per round (wall,
  * convergence measure). This is the source of the SCALE.md
  * rounds×wall tables; queries whose graph fits the driver edge cap
  * legitimately report zero distributed runs (the adaptive union-find
  * branch). */
object GraphTelemetryReport {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("graph_deep_chain", "graph_kcore", "graph_core_numbers",
        "er_clusters", "dedup_clusters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = graft.SparkEntry.queries
    val unknown = names.filterNot(registry.contains)
    require(unknown.isEmpty, s"not in the registry: ${unknown.mkString(", ")}")
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    names.foreach { name =>
      GraphTelemetry.clear()
      val t0 = System.nanoTime()
      val rows = registry(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (rounds, runs) = GraphTelemetry.snapshot()
      println(s"[telemetry] $name: ${f(wall)} s, $rows rows, " +
        s"${runs.size} distributed loop run(s)")
      runs.foreach { r =>
        println(s"[telemetry]   ${r.loop}: edges=${r.edges} parts=${r.parts} " +
          s"rounds=${r.rounds} wall=${f(r.wallSec)}s")
      }
      rounds.foreach { r =>
        println(s"[telemetry]     ${r.loop} round ${r.round}: " +
          s"${f(r.wallSec)}s measure=${r.measure}")
      }
    }
    spark.stop()
  }
}
