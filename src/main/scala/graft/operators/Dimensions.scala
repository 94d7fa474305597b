package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-table generation (reference `src/populate_dimensions.py`). */
object Dimensions {

  /** dim_date spine: one row per day in [start, end], with calendar
    * attributes (reference `src/populate_dimensions.py:19-29`).
    *
    * pandas `dayofweek in (5,6)` means Sat/Sun; Spark `dayofweek` is
    * 1=Sunday..7=Saturday, so weekend is (1,7) (SURVEY §7 risk 3).
    * `weekofyear` is ISO in both Spark and pandas `isocalendar().week`.
    *
    * Generated on the driver as a single `sequence` then exploded —
    * a few thousand rows; broadcast-join it against facts.
    */
  def dateSpine(spark: SparkSession, start: String, end: String): DataFrame =
    spark.range(1).select(
        explode(sequence(
          to_date(lit(start)), to_date(lit(end)),
          expr("interval 1 day"))).as("date_key"))
      .select(
        col("date_key"),
        date_format(col("date_key"), "EEEE").as("day_of_week"),
        weekofyear(col("date_key")).cast("long").as("week_number"),
        month(col("date_key")).cast("long").as("month"),
        quarter(col("date_key")).cast("long").as("quarter"),
        year(col("date_key")).cast("long").as("year"),
        dayofweek(col("date_key")).isin(1, 7).as("is_weekend"))

  /** dim_customer: distinct non-null customers with first-seen timestamp
    * (reference `src/populate_dimensions.py:50-54`). One shuffle (groupBy).
    */
  def firstSeen(df: DataFrame, key: String, tsCol: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(key)
      .agg(min(col(tsCol)).as("first_seen"))
}
