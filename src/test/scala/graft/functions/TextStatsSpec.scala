package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [[TextStats]] — r16 codegen replacement for the quality kernel's
  * regexp_replace / split+HOF statistics. Pins integer-exact identity
  * against the expression forms it replaced, on the real corpus and on
  * adversarial fixtures. */
class TextStatsSpec extends SparkSpec {

  // the r15 forms, verbatim
  private def strippedLen(c: Column, pat: String): Column =
    length(c) - length(regexp_replace(c, pat, ""))
  private val stop = Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")
  private def oldCols(text: Column) = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")
    struct(
      length(text).as("len"),
      size(toks).as("n_tok"),
      size(filter(toks, t => t.isInCollection(stop))).as("n_stop"),
      (length(text) - strippedLen(text, "[^!-/:-@\\[-`{-~]")).as("n_punct"),
      (length(text) - strippedLen(text, "[^0-9]")).as("n_digit"))
  }

  private def assertIdentical(df: org.apache.spark.sql.DataFrame): Unit = {
    GraftFunctions.register(spark)
    val rows = df.select(
      oldCols(col("text")).as("old"),
      GraftFunctions.textStats(col("text")).as("fast"),
      col("text")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val o = r.getStruct(0)
      val f = r.getStruct(1)
      (0 until 5).foreach { i =>
        assert(o.getInt(i) == f.getInt(i),
          s"field $i: ${o.getInt(i)} != ${f.getInt(i)} on ${r.getString(2).take(60)}")
      }
    }
  }

  test("identical to the regex/HOF forms on the real corpus") {
    assertIdentical(graft.Tables.documents(spark, sfDir).select(col("text")))
  }

  test("identical on adversarial fixtures (unicode, empty, punct-only, digits)") {
    import spark.implicits._
    assertIdentical(Seq(
      "", " ", "the quick brown fox is on a log", "THE A OF AND", "a",
      "...!!!???", "12345", "a1b2c3", "  \t\n mixed   WS nbsp ",
      "café touché Über STRAßE", // ß lowercases in place, no split
      "İstanbul Iı", // dotted capital I: 1->2 lowercase expansion
      "emoji 😀 pair 🍕!", // supplementary code points
      "with. for, to; the: of[x]{y}(z)", "at-the-end the",
      "中文文本 no ascii words 99").toDF("text"))
  }

  test("null text yields a null struct") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("text")
    assert(df.select(GraftFunctions.textStats(col("text"))).collect()(0).isNullAt(0))
  }
}
