package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmStore, PercStore}
import graft.streaming.Percolate

/** Persisted standing-query registration (PercStore): reloading from
  * disk must reproduce the ephemeral freeze exactly — the "restart the
  * JVM and keep serving" property — with O(delta) registration writes,
  * exactly-once replay, and tombstone/resurrect semantics. loadFrozen
  * consults NOTHING in memory (every input is a parquet read of the
  * store), so equality with the ephemeral freeze is precisely what a
  * process restart observes.
  */
class PercStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("perc_store").toString + "/store"
    BmStore.buildFrom(spark,
      r, spark.read.parquet(s"$sf/documents.parquet"))
    r
  }

  /** Synthetic standing queries with a per-prefix id offset —
    * syntheticStandingQueries numbers every set from 1000000, and these
    * tests need DISTINCT populations (same ids would exercise the
    * latest-wins replacement instead).
    */
  private def standing(prefix: String, n: Int, idOffset: Long = 0L) =
    BmStore.syntheticStandingQueries(spark, root, prefix, n, termsPerQuery = 6)
      .map { case (id, ts) => (id + idOffset, ts) }

  test("reload == ephemeral freeze; persisted verdicts identical, no rebuild") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val qs = standing("percA", 40)
    PercStore.registerBatch(spark, root, qs, 0L)
    val persisted = PercStore.loadFrozen(spark, root)
    val ephemeral = BmStore.frozenStatsForQueries(spark, root, qs)
    assert(persisted.nDocs === ephemeral.nDocs)
    assert(persisted.sumDl === ephemeral.sumDl)
    assert(persisted.unionTerms === ephemeral.unionTerms)
    assert(persisted.queries === ephemeral.queries)
    val arrivals = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(100)
    val a = Percolate.scoreIndexed(arrivals, persisted)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Percolate.scoreIndexed(arrivals, ephemeral)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("registration is exactly-once per batch and O(delta) on disk") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    PercStore.registerBatch(spark, root, standing("percA", 40), 0L)
    def listing(): Seq[(String, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        if (f.isDirectory) kids.flatMap(walk) else Seq(f)
      }
      walk(new java.io.File(root, "standing.parquet"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length)).sortBy(_._1)
    }
    val base = listing()
    assert(base.nonEmpty && base.forall(_._1.contains("batch_id=0")))
    // a later batch lands under its own dir, leaving batch 0 untouched
    PercStore.registerBatch(spark, root, standing("percB", 10, 1000L), 1L)
    val grown = listing()
    assert(grown.filter(_._1.contains("batch_id=0")) === base)
    assert(grown.exists(_._1.contains("batch_id=1")))
    // replaying batch 1 rewrites exactly its own dir (same dir sizes)
    PercStore.registerBatch(spark, root, standing("percB", 10, 1000L), 1L)
    def dirSizes(l: Seq[(String, Long)]) =
      l.map(t => (t._1.substring(0, t._1.lastIndexOf('/')), t._2)).sorted
    assert(dirSizes(listing()) === dirSizes(grown))
    val frozen = PercStore.loadFrozen(spark, root)
    assert(frozen.queries.size === 50)
  }

  test("tombstones remove; later re-registration resurrects with the new term set") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    PercStore.registerBatch(spark, root, standing("percA", 40), 0L)
    PercStore.registerBatch(spark, root, standing("percB", 10, 1000L), 1L)
    val victims = standing("percA", 40).take(5).map(_._1)
    PercStore.removeBatch(spark, root, victims, 2L)
    val afterRemove = PercStore.loadFrozen(spark, root)
    assert(victims.forall(id => !afterRemove.queries.exists(_.query_id == id)))
    assert(afterRemove.queries.size === 45)
    // resurrect one victim in a later batch with a DIFFERENT term set:
    // latest registration wins, replacement not union
    val resurrectTerms = standing("percC", 1).head._2
    PercStore.registerBatch(spark, root,
      Seq((victims.head, resurrectTerms)), 3L)
    val afterRes = PercStore.loadFrozen(spark, root)
    val q = afterRes.queries.find(_.query_id == victims.head)
    assert(q.nonEmpty)
    assert(q.get.terms.map(_.term).sorted ===
      resurrectTerms.distinct.sorted.filter(afterRes.unionTerms.contains))
    assert(afterRes.queries.size === 46)
    // an id tombstoned in the same batch cadence later stays gone
    PercStore.removeBatch(spark, root, Seq(victims.head), 4L)
    assert(PercStore.loadFrozen(spark, root).queries.size === 45)
  }

  test("steady-state serve loads from cache: zero store reads until a batch bumps the high-water") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    // private store: the shared `root`'s standing dirs are mutated by the
    // other tests in suite-order-dependent ways
    val r = java.nio.file.Files.createTempDirectory("perc_cache").toString + "/store"
    BmStore.buildFrom(spark, r, spark.read.parquet(s"$sf/documents.parquet"))
    val qs = BmStore.syntheticStandingQueries(spark, r, "percD", 30, termsPerQuery = 6)
    PercStore.registerBatch(spark, r, qs, 0L)
    PercStore.clearLoadedCache()
    val l0 = PercStore.loadCount.get()
    val f1 = PercStore.loadFrozenCached(spark, r)
    assert(PercStore.loadCount.get() === l0 + 1) // cold: one real load
    // steady state (the per-micro-batch serve shape): SAME object back,
    // no load, no parquet read — validity is two directory listings
    val f2 = PercStore.loadFrozenCached(spark, r)
    val f3 = PercStore.loadFrozenCached(spark, r)
    assert(PercStore.loadCount.get() === l0 + 1)
    assert(f2.eq(f1) && f3.eq(f1))
    // a REGISTRATION batch bumps the high-water -> next serve DELTA-
    // MERGES the appended dir (VERDICT r14 #7): no full store load
    val m0 = PercStore.deltaMergeCount.get()
    PercStore.registerBatch(spark, r,
      Seq((9999L, qs.head._2)), 1L)
    val f4 = PercStore.loadFrozenCached(spark, r)
    assert(PercStore.loadCount.get() === l0 + 1)
    assert(PercStore.deltaMergeCount.get() === m0 + 1)
    assert(f4.queries.size === f1.queries.size + 1)
    // a REMOVAL batch is tombstone churn -> full reload (the safe path)
    PercStore.removeBatch(spark, r, Seq(9999L), 2L)
    val f5 = PercStore.loadFrozenCached(spark, r)
    assert(PercStore.loadCount.get() === l0 + 2)
    assert(PercStore.deltaMergeCount.get() === m0 + 1)
    assert(f5.queries.size === f1.queries.size)
    // and the cached load equals a fresh uncached one exactly
    val fresh = PercStore.loadFrozen(spark, r)
    assert(f5.queries === fresh.queries && f5.unionTerms === fresh.unionTerms)
  }

  test("delta merge == full reload: burst, replacement, and resurrection all value-identical") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val r = java.nio.file.Files.createTempDirectory("perc_delta").toString + "/store"
    BmStore.buildFrom(spark, r, spark.read.parquet(s"$sf/documents.parquet"))
    val base = BmStore.syntheticStandingQueries(spark, r, "percE", 30, termsPerQuery = 6)
    PercStore.registerBatch(spark, r, base, 0L)
    // tombstone two ids at batch 1 so the delta path must respect the
    // latest-wins ordering across tombstones it does NOT re-read
    PercStore.removeBatch(spark, r, base.take(2).map(_._1), 1L)
    PercStore.clearLoadedCache()
    val cached = PercStore.loadFrozenCached(spark, r)
    assert(cached.queries.size === 28)
    // burst: 20 new monitors + 1 replacement + 1 resurrection, two dirs
    val fresh1 = BmStore.syntheticStandingQueries(spark, r, "percF", 20,
      termsPerQuery = 6).map { case (id, ts) => (id + 5000L, ts) }
    PercStore.registerBatch(spark, r, fresh1, 2L)
    val replTerms = BmStore.syntheticStandingQueries(spark, r, "percG", 2,
      termsPerQuery = 6)
    PercStore.registerBatch(spark, r,
      Seq((base(5)._1, replTerms(0)._2), (base(0)._1, replTerms(1)._2)), 3L)
    val l0 = PercStore.loadCount.get()
    val merged = PercStore.loadFrozenCached(spark, r)
    assert(PercStore.loadCount.get() === l0, "burst must not full-reload")
    val full = PercStore.loadFrozen(spark, r)
    assert(merged.nDocs === full.nDocs && merged.sumDl === full.sumDl)
    assert(merged.unionTerms === full.unionTerms)
    assert(merged.queries === full.queries)
    // resurrected id live with the replacement terms; other tombstone dead
    assert(merged.queries.exists(_.query_id == base(0)._1))
    assert(!merged.queries.exists(_.query_id == base(1)._1))
    assert(merged.queries.size === 28 + 20 + 1)
    // out-of-order appended batch id (below the tombstone high-water)
    // must NOT take the delta path — correctness over cleverness
    PercStore.clearLoadedCache()
    val c2 = PercStore.loadFrozenCached(spark, r)
    assert(c2.queries === full.queries)
  }
}
