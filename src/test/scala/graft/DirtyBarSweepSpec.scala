package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Engine-wide dirty-price sweep (round-9 verdict item #5, carried):
  * EVERY `w*` registry entry — the whole indicator family, not just the
  * three queries with deep ZeroBarFixture pins — must survive a
  * zero-price bar in its input without an ANSI runtime error and
  * without leaking a non-finite cell. The fixture reproduces the sf0.1
  * defect class (an `events.value = 0` row collapsing a candle's
  * low/close to 0) through the REAL `Tables.candles` scan path; the
  * engine convention under test is the w44/w50 count-guard/validity-gate
  * one: an indicator term that divides by a price, a range, or a
  * variance must gate the division (nullif / validity predicate) so the
  * dirty bar yields NULL — never NaN, never ±Infinity, never an
  * exception. Deep per-rule value pins for the stateful families stay
  * in `IndicatorPack3Spec` / `ChannelsSpec`; this spec is the breadth
  * gate that keeps a NEW indicator from shipping without the guard. */
class DirtyBarSweepSpec extends SparkSpec {

  /** Non-finite doubles/floats anywhere in a cell, descending into
    * structs, arrays, and maps — indicator packs emit struct columns
    * (bands, signal bundles), so top-level scanning is not enough. */
  private def nonFinite(v: Any): Boolean = v match {
    case null => false
    case d: Double => d.isNaN || d.isInfinite
    case f: Float => f.isNaN || f.isInfinite
    case r: Row => (0 until r.length).exists(i => nonFinite(r.get(i)))
    case s: scala.collection.Seq[_] => s.exists(nonFinite)
    case m: scala.collection.Map[_, _] => m.values.exists(nonFinite)
    case _ => false
  }

  test("every w* indicator survives the zero-price bar: no runtime error, no NaN/Infinity cell") {
    spark.catalog.clearCache()
    val dir = ZeroBarFixture.dir(spark)
    val wNames = SparkEntry.queries.keys.filter(_.matches("""w\d+_.*""")).toSeq.sorted
    // the sweep must actually cover the family — a registry rename that
    // empties the glob should fail loudly, not pass vacuously
    assert(wNames.size >= 50, s"w* glob collapsed: ${wNames.size} entries")
    val bad = wNames.flatMap { name =>
      try {
        val rows = SparkEntry.queries(name)(spark, dir).collect()
        val dirtyCols = rows.iterator.flatMap { r =>
          (0 until r.length).collect { case i if nonFinite(r.get(i)) => r.schema.fields(i).name }
        }.toSet
        if (dirtyCols.isEmpty) Nil
        else Seq(s"$name: non-finite cells in ${dirtyCols.toSeq.sorted.mkString(", ")}")
      } catch {
        case e: Throwable =>
          Seq(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(bad.isEmpty, "dirty-bar failures:\n  " + bad.mkString("\n  "))
  }

  test("aggregation/quality/feature families survive the zero-price bar too") {
    // round-11 verdict item #6: the same fixture through everything
    // else that divides by a price, a range, or a volume — the a*
    // aggregations (stats, resample, validation, outliers, backtest
    // metrics, microstructure), the qc* repair/score pair, the f*
    // filter and feature family (liquidity ratios, winsorize bounds,
    // target encoding), and the vwap. a3_docs_by_lang is excluded on
    // inputs, not nerves: it reads the documents table (no prices),
    // which the events-only fixture deliberately lacks.
    spark.catalog.clearCache()
    val dir = ZeroBarFixture.dir(spark)
    val names = SparkEntry.queries.keys.filter { n =>
      (n.matches("""a\d+_.*""") && n != "a3_docs_by_lang") ||
        n.startsWith("qc_") ||
        (n.startsWith("f") && !n.startsWith("fn_")) ||
        n == "s6_vwap"
    }.toSeq.sorted
    assert(names.size >= 25, s"a*/qc*/f* glob collapsed: ${names.size} entries")
    val bad = names.flatMap { name =>
      try {
        val rows = SparkEntry.queries(name)(spark, dir).collect()
        val dirtyCols = rows.iterator.flatMap { r =>
          (0 until r.length).collect { case i if nonFinite(r.get(i)) => r.schema.fields(i).name }
        }.toSet
        if (dirtyCols.isEmpty) Nil
        else Seq(s"$name: non-finite cells in ${dirtyCols.toSeq.sorted.mkString(", ")}")
      } catch {
        case e: Throwable =>
          Seq(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(bad.isEmpty, "dirty-bar failures:\n  " + bad.mkString("\n  "))
  }
}
