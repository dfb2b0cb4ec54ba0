package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
import org.apache.spark.metrics.source.CodegenMetrics

/** Diagnostic main (r15 optimization round): splits a query's wall time
  * into Catalyst phases (analysis / optimization / physical planning),
  * janino codegen compilation, and execution, so fixed per-query
  * overhead is attributable before it is attacked. Not part of the
  * driver contract; changes nothing a registered query computes.
  *
  * Usage: runMain graft.PhaseProbe <name>[,name...] [sfDir] [reps]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    // experiment hook: SPARK_GRAFT_PROBE_CONF="k=v;k=v" session confs
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[phase] conf $k=$v")
    })
    spark.sparkContext.setLogLevel("ERROR")
    // the exact BenchAction.consume shape, but instrumented on the
    // QueryExecution that actually runs (the select's, not the input's)
    def canonical(df: DataFrame): Seq[Column] =
      df.schema.fields.toSeq.map { f =>
        f.dataType match {
          case _: MapType => array_sort(map_entries(col(f.name)))
          case _          => col(f.name)
        }
      }
    // one throwaway pass to warm JIT/parquet footers so rep timings are
    // steady-state, like Bench's warm sweeps
    names.foreach { n =>
      try BenchAction.consume(SparkEntry.benchImpls.getOrElse(n, SparkEntry.queries(n))(spark, sfDir))
      catch { case e: Throwable => println(s"[phase] $n warmup failed: ${e.getMessage}") }
    }
    def compileStats(): (Long, Double) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getMean)
    }
    // per-stage telemetry: (numTasks, stage wall ms, sum task ms) — the
    // single-task-hot-stage detector (wall ≈ sum ⇒ no parallelism)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        val m = si.taskMetrics
        stageLog.add((si.numTasks, wall, if (m == null) 0L else m.executorRunTime,
          si.name.take(60)))
        ()
      }
    })
    println(f"${"query"}%-26s ${"wall"}%7s ${"analys"}%7s ${"optim"}%7s ${"plan"}%7s ${"ncomp"}%6s ${"cg_est"}%7s ${"exec~"}%7s")
    names.foreach { n =>
      val fn = SparkEntry.benchImpls.getOrElse(n, SparkEntry.queries(n))
      (1 to reps).foreach { _ =>
        val (c0, m0) = compileStats()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val out = df.select(count(lit(1)).as("n"),
          sum(hash(canonical(df): _*).cast("long")).as("h"))
        out.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val (c1, m1) = compileStats()
        val ph = out.queryExecution.tracker.phases
          .map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) / 1e3 }
        def g(k: String) = ph.getOrElse(k, 0.0)
        val nComp = c1 - c0
        val cgEst = (c1 * m1 - c0 * m0) / 1e3 // sec, estimated from histogram mean*count
        val known = g("analysis") + g("optimization") + g("planning")
        Thread.sleep(150) // let trailing stage events land
        val stages = Iterator.continually(stageLog.poll()).takeWhile(_ != null).toList
        val hot = stages.filter(_._2 > 150).sortBy(-_._2).take(4)
          .map { case (nt, w, tt, nm) => s"${nt}t/${w}ms(sum $tt)[$nm]" }.mkString(" ")
        println(f"$n%-26s $wall%7.3f ${g("analysis")}%7.3f ${g("optimization")}%7.3f ${g("planning")}%7.3f $nComp%6d $cgEst%7.3f ${wall - known}%7.3f  nstages=${stages.size}%3d hot: $hot")
      }
    }
    spark.stop()
  }
}
