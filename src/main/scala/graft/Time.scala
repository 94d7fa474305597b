package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a query N times. `sbt "runMain graft.Time <query> <sfDir> [n]"`. */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      // noop write like Bench: count() would prune the measured work
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name run$i: $dt%.2f s (${df.count()} rows)")
    }
    spark.stop()
  }
}
