package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Full-registry materialization gate: run EVERY [[SparkEntry.queries]]
  * entry at the given SF through [[BenchAction.consume]] — every output
  * column of every row is computed, so any per-row error (ANSI divide,
  * overflow, bad cast) surfaces even when the DuckDB oracle scale's
  * data never exercises the edge case. The round-8 defect class: the
  * oracle runs at sf0.01, but sf0.1 is the first SF with zero-price
  * candles, and two queries crashed there undetected by 245 green
  * oracle rows (and undetected by the then-`count()` bench action,
  * which pruned the broken columns away).
  *
  * Usage: runMain graft.MatCheck <sfDir> [outJson]
  * Writes {"sf":…, "n":…, "n_err":…, "queries":{name:{"rows":…,
  * "checksum":…}|{"err":…}}} and exits nonzero on any error.
  */
object MatCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = if (args.length > 1) args(1) else "MATCHECK.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    var nErr = 0
    // optional filter (same contract as ShuffleAudit): a targeted run
    // whose rows are merged into a full artifact notes the merge there
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).map { case (name, fn) =>
      val cell = try {
        val (n, h) = BenchAction.consume(fn(spark, sfDir))
        s"""{"rows":$n,"checksum":$h}"""
      } catch { case e: Throwable =>
        nErr += 1
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        System.err.println(s"[matcheck] $name FAILED: $msg")
        s"""{"err":${esc(msg)}}"""
      }
      s"${esc(name)}: $cell"
    }
    val json = s"""{"sf":${esc(sfDir)},"n":${rows.size},"n_err":$nErr,""" +
      s""""queries":${rows.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(outPath), json)
    System.err.println(s"[matcheck] ${rows.size} queries, $nErr failed -> $outPath")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
