package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Pins [[Tables.events]]'s schema adaptivity. The driver's testdata has
  * shipped `events.ts` as TIMESTAMP(NANOS) (readable only as long nanos
  * under the legacy flag) in one generation and TIMESTAMP(MICROS)
  * (reads as TIMESTAMP_NTZ) in another; assuming either shape broke a
  * full verify round (93 events-family queries lost in round 3). The
  * loader must resolve both to the same session-TZ TimestampType values.
  */
class TablesSpec extends SparkSpec {

  private val micros = 1723500000000000L // 2024-08-12T22:40:00Z

  private def load(dir: String): org.apache.spark.sql.DataFrame =
    Tables.events(spark, dir)

  test("events adapts to a long (nanos) ts column") {
    val dir = graft.util.Scratch.register(Files.createTempDirectory("ev_nanos").toString)
    import spark.implicits._
    Seq((1L, micros * 1000L + 999L, 1.5), (2L, micros * 1000L, 2.5))
      .toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = load(dir)
    assert(df.schema("ts").dataType === TimestampType)
    // sub-µs nanos truncate (999 ns → same µs), matching DuckDB ns→µs
    val ts = df.orderBy("user_id").select(unix_micros(col("ts")))
      .as[Long].collect()
    assert(ts.toSeq === Seq(micros, micros))
  }

  test("events adapts to a native timestamp ts column") {
    val dir = graft.util.Scratch.register(Files.createTempDirectory("ev_micros").toString)
    import spark.implicits._
    val raw = Seq((1L, micros, 1.5), (2L, micros + 3600L * 1000000L, 2.5))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    raw.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = load(dir)
    assert(df.schema("ts").dataType === TimestampType)
    val ts = df.orderBy("user_id").select(unix_micros(col("ts")))
      .as[Long].collect()
    assert(ts.toSeq === Seq(micros, micros + 3600L * 1000000L))
  }

  test("events adapts to a TIMESTAMP_NTZ ts column (driver sf dirs)") {
    // The real testdata path: whatever shape the current generation has,
    // the loader must yield TimestampType and candles must aggregate.
    val df = load(sfDir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(Tables.candles(spark, sfDir).limit(1).count() === 1L)
    // And an NTZ-typed file specifically:
    val dir = graft.util.Scratch.register(Files.createTempDirectory("ev_ntz").toString)
    import spark.implicits._
    Seq((1L, micros, 1.5)).toDF("user_id", "us", "value")
      .select(col("user_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ntz = load(dir)
    assert(ntz.schema("ts").dataType === TimestampType)
    assert(ntz.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }
}
