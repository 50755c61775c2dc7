package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** embedding_prototypicality invariants on the real sf0.001 fixture:
  * assignments agree with embedding_kmeans, every cluster's ranks are a
  * dense 1..size permutation ordered by cosine, and the integer-space
  * keep rule prunes exactly the floor(size/10) most-prototypical head.
  */
class PrototypicalitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val rows =
    Similarity.queries("embedding_prototypicality")(spark, sf).collect()

  test("cluster assignment and size agree with embedding_kmeans") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val km = Similarity.queries("embedding_kmeans")(spark, sf)
      .select("vec_id", "cluster_id", "cluster_size")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.nonEmpty && rows.length === km.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert((r.getAs[Int]("cluster_id"), r.getAs[Long]("cluster_size")) === km(id), s"vec $id")
    }
  }

  test("per-cluster ranks are dense, cosine-ordered, and keep prunes the decile head") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    rows.groupBy(_.getAs[Int]("cluster_id")).foreach { case (c, rs) =>
      val size = rs.head.getAs[Long]("cluster_size")
      assert(rs.length.toLong === size, s"cluster $c")
      val byRank = rs.sortBy(_.getAs[Int]("rank_in_cluster"))
      assert(byRank.map(_.getAs[Int]("rank_in_cluster")).toSeq === (1 to rs.length), s"cluster $c")
      // cosine non-increasing along the rank order, and within [-1, 1]
      val cs = byRank.map(_.getAs[Double]("cos_centroid"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"cluster $c")
      assert(cs.forall(x => x >= -1.0 && x <= 1.0), s"cluster $c")
      // keep = 10*rank > size: exactly floor(size/10) pruned, all at the head
      val pruned = byRank.filter(!_.getAs[Boolean]("keep"))
      assert(pruned.length.toLong === size / 10, s"cluster $c")
      assert(pruned.forall(_.getAs[Int]("rank_in_cluster") <= size / 10), s"cluster $c")
    }
  }
}
