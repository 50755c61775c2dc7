package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** [[graft.operators.Materialize.once]] routes every compute-once site
  * through reliable `checkpoint()` when the session has a checkpoint dir
  * (the fault-tolerant cluster path, VERDICT r9 #3) and `localCheckpoint`
  * otherwise. The rest of the suite exercises the local flavor; this spec
  * pins the reliable flavor to identical results on the heaviest
  * checkpoint user (connected components: iterative fixpoint + edge
  * materialization + driver fast path all behind Materialize.once).
  */
class MaterializeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("reliable-checkpoint flavor produces identical dedup components") {
    val spark = TestSpark.spark
    def labels(): Map[Long, Long] =
      Dedup.queries("dedup_components")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLocal = labels()
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val viaReliable = labels()
      assert(viaReliable == viaLocal)
      // The reliable path actually ran: checkpoint PART FILES landed under
      // the dir. A bare listFiles() non-empty check is vacuous —
      // setCheckpointDir itself pre-creates a UUID subdirectory before any
      // checkpoint happens (self-review r10) — so walk for regular files
      // (rdd-*/part-*), which only a real checkpoint write produces.
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val wrote =
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close() // walk streams hold directory handles open
      assert(wrote > 0, "no checkpoint part files written — reliable flavor did not run")
    } finally {
      // restore the default local flavor for the rest of the shared JVM
      org.apache.spark.CheckpointDirReset.clear(spark.sparkContext)
    }
  }
}
