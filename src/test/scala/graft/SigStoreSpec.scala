package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SigStore}

/** The persisted signature store serves dedup_incremental's exact rows
  * without re-reading the base corpus: build once (crash-safe publish),
  * serve many (store files untouched across serves), and the serving
  * plan's only parquet scan is the store itself.
  */
class SigStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fileSet(root: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root)).map(f => (f.getAbsolutePath, f.lastModified)).toSet
  }

  test("stored incremental == recomputed incremental; store reused, not rebuilt") {
    SigStore.deleteStore(spark, sf)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3))).toSet

    val stored = canon(SigStore.queries("dedup_incremental_stored")(spark, sf))
    val recomputed = canon(Dedup.queries("dedup_incremental")(spark, sf))
    assert(stored == recomputed && stored.nonEmpty)
    assert(stored.exists(!_._4), "the sf corpus has duplicate deltas")

    // second serve: same answer, store files byte-identical (no rebuild)
    val before = fileSet(SigStore.storeRoot(sf))
    assert(canon(SigStore.queries("dedup_incremental_stored")(spark, sf)) == stored)
    assert(fileSet(SigStore.storeRoot(sf)) == before,
      "a second serve must not touch the published store")
  }

  test("serving plan scans the store, not the base documents") {
    val df = SigStore.queries("dedup_incremental_stored")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sigstore"), s"expected a store scan:\n$plan")
    // the delta side is localCheckpointed during construction — the
    // SERVING plan itself reads no document payloads at all
    assert(!plan.contains("documents.parquet"),
      s"base documents must not be rescanned at serve time:\n$plan")
  }
}
