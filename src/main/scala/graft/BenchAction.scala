package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The benchmark/materialization ACTION shared by [[Bench]], [[RunOne]],
  * [[ShuffleAudit]] and [[MatCheck]]: forces EVERY output column of
  * every row.
  *
  * `count()` is NOT a benchmark action — Catalyst prunes all
  * unreferenced projection columns beneath it, so a pure-projection
  * query benches as a parquet row count, and a per-row error in a
  * pruned column (an ANSI divide-by-zero, say) never fires: round 8
  * shipped a query whose per-row math crashed at sf0.1 while its bench
  * row stayed green. Summing a hash of every column defeats pruning —
  * each cell feeds the hash, each hash feeds the aggregate — so the
  * timed work is the query's real work and any per-row exception
  * surfaces. The extra cost is one codegen'd murmur3 pass plus a
  * map-side-combined scalar agg: negligible against real plans, and
  * paid identically by every query.
  *
  * Returns (rowCount, checksum). The checksum is additionally the
  * MATCHECK gate value: order-insensitive across rows (a sum), covering
  * every cell.
  */
object BenchAction {
  def consume(df: DataFrame): (Long, Long) = {
    // map-typed outputs hash fine for forcing purposes; the legacy gate
    // only guards cross-run map-order hash stability we don't rely on
    df.sparkSession.conf.set("spark.sql.legacy.allowHashOnMapType", "true")
    val cols = df.columns.map(col)
    val row = df.select(count(lit(1)).as("n"),
      sum(hash(cols: _*).cast("long")).as("h")).collect()(0)
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }
}
