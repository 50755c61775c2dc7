package org.apache.spark

/** Test-only escape hatch: SparkContext exposes setCheckpointDir but no
  * unset, and MaterializeSpec must not leak the reliable-checkpoint flavor
  * into every later suite sharing the JVM-wide session. `checkpointDir` is
  * `private[spark]`, so this one-liner lives in the spark package.
  */
object CheckpointDirReset {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
