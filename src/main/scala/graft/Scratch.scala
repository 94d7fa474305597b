package graft

import org.apache.spark.sql.SparkSession

/** Scratch directories for staged intermediates (checkpointed pair lists,
  * shingle sets, format round-trips).
  *
  * Cluster-safety contract: every executor must be able to read what any
  * executor wrote, so scratch must live on storage shared by the whole
  * application — not the driver JVM's temp dir. The root resolves, in
  * order:
  *
  *   1. `spark.graft.scratchDir` (runtime conf) — point this at the shared
  *      filesystem (HDFS/S3A/...) on a real cluster;
  *   2. the SparkContext checkpoint dir, if one was set (it carries the
  *      same must-be-shared contract);
  *   3. the local JVM temp dir — correct for local[*] master where driver
  *      and executors share one machine.
  *
  * Every directory is unique per (JVM run, call): a run id plus an atomic
  * sequence, so two concurrent sessions — or two concurrent queries in one
  * session — can never interleave files. Cleanup goes through the Hadoop
  * FileSystem API (works for any scheme) in a shutdown hook registered at
  * a priority above the FileSystem-cache close.
  */
object Scratch {
  private val runId: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkSession)]()

  // Hadoop closes cached FileSystems in its own hook at priority 10; ours
  // must run first or remote deletes would hit a closed FS.
  org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
    new Runnable {
      def run(): Unit = created.forEach { case (path, spark) =>
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(p, true); ()
        } catch { case _: Throwable => () } // best-effort: scratch, not data
      }
    }, 30)

  /** The scratch root for this session (no directory is created). */
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratchDir")
      .orElse(spark.sparkContext.getCheckpointDir)
      .getOrElse("file:" + System.getProperty("java.io.tmpdir"))

  /** A fresh, collision-free scratch directory under the shared root,
    * registered for shutdown cleanup. Returns the path as a string usable
    * by both `df.write` and `spark.read`.
    */
  def dir(spark: SparkSession, prefix: String): String = {
    val p = new org.apache.hadoop.fs.Path(
      root(spark), s"$prefix${runId}_${seq.incrementAndGet()}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val q = fs.makeQualified(p).toString
    created.add((q, spark))
    q
  }
}
