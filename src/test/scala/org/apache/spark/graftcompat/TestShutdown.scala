package org.apache.spark.graftcompat

import org.apache.spark.util.ShutdownHookManager

/** Test-harness access to Spark's priority-ordered shutdown hooks
  * (`private[spark]`, hence this package): registers a hook that runs
  * BEFORE SparkContext's own stop hook (priority 50), so the test
  * JVM's exit path can stop any still-active streaming query while
  * the executor pool is alive. Without the ordering, a query leaked
  * to JVM exit (or alive when an external timeout SIGTERMs the run)
  * races the executor-pool shutdown and storms
  * `RejectedExecutionException` / lost-task warnings — the exact red
  * tail of the r20 driver verify. */
object TestShutdown {
  def beforeSparkStops(f: () => Unit): Unit = {
    ShutdownHookManager.addShutdownHook(60)(f)
    ()
  }
}
