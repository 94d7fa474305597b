package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's star-schema testdata (TESTDATA.md).
  *
  * Every operator query receives an `sfDir` like `/root/testdata/sf0.01`
  * and reads single-file parquet tables from it. At cluster scale these
  * would be partitioned directories; the API is identical.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as a nanosecond
    * Long (legacy conf) and truncate to a microsecond TimestampType —
    * the exact same truncation DuckDB applies when it reads TIMESTAMP_NS
    * into its microsecond TIMESTAMP, so oracle comparisons agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
