package graft

/** Dev tool: print the executed plan of named queries at sf0.001 —
  * `sbt "runMain graft.PlanPeek pipe_rag ds_shuffle"`. The .explain
  * feedback loop behind PlanShapeSpec's locks.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
