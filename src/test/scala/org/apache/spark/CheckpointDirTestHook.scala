package org.apache.spark

/** Test-only: reset the global checkpoint dir so a reliable-checkpoint
  * test doesn't flip every later suite in the shared JVM onto the
  * reliable path (`SparkContext.checkpointDir` is a package-private var
  * with no public unset). */
object CheckpointDirTestHook {
  def clear(sc: SparkContext): Unit = { sc.checkpointDir = None }
}
