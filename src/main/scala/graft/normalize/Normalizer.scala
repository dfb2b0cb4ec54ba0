package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalization methods (`app/services/preprocessing/normalizer.py`):
  * minmax / zscore / robust fit + apply + invert. Fit is one tiny
  * aggregate broadcast back over the data (`crossJoin(broadcast(...))`)
  * — the scalable fit-then-apply shape; invert restores original units
  * from the same params (`normalizer.py:209-234`).
  */
object Normalizer {

  sealed trait Method { def name: String }
  case object MinMax extends Method { val name = "minmax" }
  case object ZScore extends Method { val name = "zscore" }
  case object Robust extends Method { val name = "robust" }

  /** Fit params for `cols` as a 1-row DataFrame with columns
    * `<col>__p1` / `<col>__p2` (min/max, mean/std, or median/iqr). */
  def fit(df: DataFrame, cols: Seq[String], method: Method): DataFrame = {
    val aggs = cols.flatMap { c =>
      method match {
        case MinMax => Seq(min(col(c)).as(s"${c}__p1"), max(col(c)).as(s"${c}__p2"))
        case ZScore => Seq(avg(col(c)).as(s"${c}__p1"), stddev(col(c)).as(s"${c}__p2"))
        case Robust => Seq(
          expr(s"percentile($c, 0.5)").as(s"${c}__p1"),
          (expr(s"percentile($c, 0.75)") - expr(s"percentile($c, 0.25)")).as(s"${c}__p2"))
      }
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  private def applyOne(c: Column, p1: Column, p2: Column, method: Method): Column =
    method match {
      case MinMax => when(p2 =!= p1, (c - p1) / (p2 - p1))
      case ZScore => when(p2 =!= 0, (c - p1) / p2)
      case Robust => when(p2 =!= 0, (c - p1) / p2)
    }

  private def invertOne(c: Column, p1: Column, p2: Column, method: Method): Column =
    method match {
      case MinMax => c * (p2 - p1) + p1
      case ZScore | Robust => c * p2 + p1
    }

  /** Normalize `cols` in place (fit broadcast-joined). */
  def apply(df: DataFrame, cols: Seq[String], method: Method): DataFrame = {
    val params = fit(df, cols, method)
    val joined = df.crossJoin(broadcast(params))
    cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, applyOne(col(c), col(s"${c}__p1"), col(s"${c}__p2"), method))
    }.drop(params.columns: _*)
  }

  /** Invert normalized columns given the fit params (broadcast join). */
  def invert(df: DataFrame, params: DataFrame, cols: Seq[String], method: Method): DataFrame = {
    val joined = df.crossJoin(broadcast(params))
    cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, invertOne(col(c), col(s"${c}__p1"), col(s"${c}__p2"), method))
    }.drop(params.columns: _*)
  }
}
