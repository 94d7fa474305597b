package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality analytics (reference `src/quality_report.py`).
  *
  * Each section is a small aggregate query; all are single-pass scans or
  * one join + aggregate. At scale the inputs should be cached once and the
  * ~6 sections run over the cached frames (the reference re-fetches from
  * Mongo per run).
  */
object Quality {

  /** §1 completeness: null/zero counts as one row
    * (reference `src/quality_report.py:45-48`).
    */
  def completeness(df: DataFrame, nullCols: Seq[String], zeroCols: Seq[String]): DataFrame = {
    val nulls = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    val zeros = zeroCols.map(c =>
      sum(when(col(c) === 0, 1L).otherwise(0L)).as(s"${c}_zeros"))
    val aggs = nulls ++ zeros
    require(aggs.nonEmpty, "completeness needs at least one null or zero column")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** §2 orphans: rows of `child` whose key has no match in `parent`
    * (reference `src/quality_report.py:61-66`). Left-anti join — at scale
    * Spark plans a broadcast or shuffled hash anti join.
    */
  def orphans(child: DataFrame, parent: DataFrame, key: String): DataFrame =
    child.join(parent.select(key).distinct(), Seq(key), "left_anti")

  /** §3 lateness: day-deltas between a parent event time and child event
    * time after an inner equi-join (reference `src/quality_report.py:77-94`).
    * Returns one row: counts over thresholds + mean delay.
    */
  def lateness(joined: DataFrame, deltaDays: Column,
               thresholds: Seq[Int]): DataFrame = {
    val counts = thresholds.map(t =>
      sum(when(deltaDays > t, 1L).otherwise(0L)).as(s"over_${t}_days"))
    val aggs = counts :+ round(avg(deltaDays), 4).as("avg_delay_days")
    joined.agg(aggs.head, aggs.tail: _*)
  }

  /** §5/§6 frequency breakdown with percentage (value_counts analogue,
    * reference `src/quality_report.py:131-143`). The percentage divides by
    * the global count via a scalar subquery-style cross join of a 1-row
    * aggregate — broadcastable, no extra shuffle of the main data.
    */
  def valueCounts(df: DataFrame, keyCol: String): DataFrame = {
    val total = df.select(count(lit(1)).as("__total"))
    df.groupBy(keyCol).agg(count(lit(1)).as("count"))
      .crossJoin(broadcast(total))
      .withColumn("pct", round(col("count") / col("__total") * 100, 4))
      .drop("__total")
      .orderBy(desc("count"), col(keyCol))
  }
}
