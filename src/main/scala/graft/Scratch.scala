package graft

/** Scratch directories for staged intermediates (checkpointed pair lists,
  * shingle sets). Created under the JVM temp dir and recursively deleted
  * by a shutdown hook — `File.deleteOnExit` silently fails on non-empty
  * directories, which would leak a parquet copy per operator call.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(); ()
  }

  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(f => deleteRec(f))
  }))

  /** A fresh scratch directory, registered for shutdown cleanup. */
  def dir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    created.add(d)
    d
  }
}
