package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Retrieval operators vs a naive in-memory reimplementation on the real
  * sf0.001 fixture: the distributed BM25 (pruned postings, broadcast
  * scalars, salted two-stage top-k) and the RRF fusion must emit exactly
  * what a straightforward nested-loop scorer computes from the same texts
  * and embeddings — formula, quantization, tie-breaks and all. 500 docs,
  * so the naive side is trivially affordable in-process.
  */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  // --- naive reference implementation (plain Scala, no Spark) ---

  private lazy val texts: Map[Long, Array[String]] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }.toMap
  }

  private lazy val embs: Map[Long, Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (query_id, doc_id) -> (n_terms, sum_q), every candidate pair. */
  private lazy val naiveBm: Map[(Long, Long), (Int, Long)] = {
    val n = texts.size.toLong
    val sumDl = texts.values.map(_.length.toLong).sum
    val avgdl = sumDl.toDouble / n
    val df = texts.toSeq.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    val tf = texts.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong } }
    (for {
      qid <- Retrieval.QueryDocIds.map(_.toLong) if texts.contains(qid)
      qterms = texts(qid).distinct
      did <- texts.keys if did != qid
      qs = qterms.flatMap { t =>
        tf(did).get(t).map { f =>
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val tfw = f * 2.2 / (f + 1.2 * (0.25 + 0.75 * texts(did).length / avgdl))
          math.round(idf * tfw * 1e6)
        }
      } if qs.nonEmpty
    } yield (qid, did) -> (qs.length, qs.sum)).toMap
  }

  private def naiveBmRanked(k: Int): Seq[(Long, Int, Long, Int, Long)] =
    naiveBm.toSeq.groupBy(_._1._1).toSeq.flatMap { case (qid, cands) =>
      cands.sortBy { case ((_, did), (_, sq)) => (-sq, did) }.take(k)
        .zipWithIndex.map { case (((_, did), (nt, sq)), i) => (qid, i + 1, did, nt, sq) }
    }

  private lazy val naiveCosRanked: Map[(Long, Long), Int] = {
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    (for {
      qid <- Retrieval.QueryDocIds.map(_.toLong) if embs.contains(qid)
      ranked = embs.keys.filter(_ != qid).toSeq
        .map(did => (did, round4(dot(embs(qid), embs(did)) /
          (math.sqrt(dot(embs(qid), embs(qid))) * math.sqrt(dot(embs(did), embs(did)))))))
        .sortBy { case (did, c) => (-c, did) }.take(Retrieval.FuseDepth)
      ((did, _), i) <- ranked.zipWithIndex
    } yield (qid, did) -> (i + 1)).toMap
  }

  // --- specs ---

  test("text_bm25_topk equals the naive scorer exactly (ranks, counts, scores)") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val got = Retrieval.queries("text_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSet
    // integer HALF_UP in 1e-6 space, matching the operator (sum_q > 0)
    val want = naiveBmRanked(Retrieval.BmTopK)
      .map { case (q, r, d, nt, sq) => (q, r, d, nt, ((sq + 50) / 100) / 1e4) }.toSet
    assert(got.nonEmpty && got == want)
  }

  test("ann_hybrid_rrf equals the naive fusion of the two naive rankers") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val bmDepth = naiveBmRanked(Retrieval.FuseDepth)
      .map { case (q, r, d, _, _) => (q, d) -> r }.toMap
    val want = (bmDepth.keySet ++ naiveCosRanked.keySet).toSeq
      .map { case (q, d) =>
        val rb = bmDepth.getOrElse((q, d), 0)
        val rc = naiveCosRanked.getOrElse((q, d), 0)
        val rrf = round6(
          (if (rb > 0) 1.0 / (Retrieval.RrfK + rb) else 0.0) +
            (if (rc > 0) 1.0 / (Retrieval.RrfK + rc) else 0.0))
        (q, d, rb, rc, rrf)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, cands) =>
        cands.sortBy { case (_, d, _, _, rrf) => (-rrf, d) }.take(Retrieval.RrfTopK)
          .zipWithIndex.map { case ((q, d, rb, rc, rrf), i) => (q, i + 1, d, rb, rc, rrf) }
      }.toSet
    val got = Retrieval.queries("ann_hybrid_rrf")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getDouble(5)))
      .toSet
    assert(got.nonEmpty && got == want)
  }

  test("bm25 plan prunes the corpus token stream with a broadcast join before the tf shuffle") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    val plan = Retrieval.queries("text_bm25_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
