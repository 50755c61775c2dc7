package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Dedup + ANN semantics against the planted near-duplicates in the
  * sf0.001 testdata (28 pairs with 3-gram Jaccard ≥ 0.8).
  */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    Dedup.queries(name)(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH finds exactly the planted near-dup pairs (vs exact jaccard >= 0.8)") {
    val exact = Dedup.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairs("dedup_minhash_pairs")
    assert(exact.nonEmpty)
    assert(lsh == exact, s"lsh-only=${lsh -- exact}, missed=${exact -- lsh}")
  }

  test("simhash hamming pairs cover the planted near-dups") {
    val planted = pairs("dedup_minhash_pairs")
    val simhash = pairs("dedup_simhash_pairs")
    val covered = planted.intersect(simhash)
    assert(covered.size >= (planted.size * 0.9).toInt,
      s"simhash covered ${covered.size}/${planted.size}")
  }

  test("connected components: chain graph needs >1 iteration, labels = component min") {
    import spark.implicits._
    // path 1-2-3-4 (diameter 3 forces multiple propagation rounds),
    // pair 10-11, singleton 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("dedup_components clusters the planted near-dups around min doc_id") {
    val comp = Dedup.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // every simhash pair must land in one cluster
    pairs("dedup_simhash_pairs").foreach { case (d1, d2) =>
      val c1 = comp.find(_._1 == d1).get._2
      val c2 = comp.find(_._1 == d2).get._2
      assert(c1 == c2, s"pair ($d1,$d2) split across clusters $c1/$c2")
    }
    // exactly one canonical per cluster, and it is the min doc_id
    comp.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._4) == 1)
      assert(members.filter(_._4).head._1 == members.map(_._1).min)
      assert(cid == members.map(_._1).min)
      assert(members.forall(_._3 == members.length))
    }
  }

  test("exact dedup marks exactly one canonical doc per hash group") {
    val df = Dedup.queries("dedup_exact")(spark, sf)
    val byHash = df.groupBy("text_hash")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .collect()
    assert(byHash.forall(_.getLong(1) == 1L))
  }

  test("brute-force ANN matches a locally computed top-1") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expTop1 = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(emb(0L), v)) }
      .maxBy { case (id, c) => (c, -id) }._1
    val got = Similarity.queries("ann_bruteforce_topk")(spark, sf)
      .filter("query_id = 0 AND rank = 1").collect().head.getLong(2)
    assert(got == expTop1)
  }

  test("kmeans: total coverage, bounded clusters, deterministic, locally optimal") {
    val rows = Similarity.queries("embedding_kmeans")(spark, sf).collect()
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == corpus) // every vector assigned exactly once
    val clusters = rows.map(_.getAs[Int]("cluster_id")).toSet
    assert(clusters.nonEmpty && clusters.size <= Similarity.KmeansK)
    // sizes are consistent with the actual partition
    rows.groupBy(_.getAs[Int]("cluster_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("cluster_size")).toSet == Set(g.length.toLong))
    }
    // deterministic: a second full run yields the identical assignment
    val again = Similarity.queries("embedding_kmeans")(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq)
  }

  test("LSH ANN reaches useful recall vs brute force") {
    def topSets(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, sf)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = topSets("ann_bruteforce_topk")
    val lsh = topSets("ann_lsh_topk")
    val recalls = brute.map { case (q, bs) =>
      lsh.get(q).map(ls => ls.intersect(bs).size.toDouble / bs.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@5 = $mean")
  }
}
