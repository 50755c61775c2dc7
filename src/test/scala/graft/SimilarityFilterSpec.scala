package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Filtered ANN contract: the metadata predicate is a PRE-filter pushed
  * into the corpus scan (not a post-ranking discard), results honor it,
  * and it genuinely changes what gets served.
  */
class SimilarityFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("label predicate is pushed to the corpus parquet scan") {
    val df = Similarity.queries("ann_ivfpq_filtered_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*LessThan\\(label,3\\)".r.findFirstIn(plan).isDefined,
      s"label filter must reach the scan:\n$plan")
  }

  test("every served neighbor satisfies the predicate; ranking is pre-filtered") {
    val filtered = Similarity.queries("ann_ivfpq_filtered_topk")(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      assert(labels(r.getLong(2)) < 3, s"neighbor ${r.getLong(2)} breaks the filter")
    }
    // pre- vs post-filter must differ: taking the UNFILTERED top-5 and
    // discarding label>=3 rows afterwards loses neighbors the filtered
    // search keeps (rank-5 sets differ for at least one query)
    val unfiltered = Similarity.queries("ann_ivfpq_topk")(spark, sf).collect()
    val postFiltered = unfiltered.filter(r => labels(r.getLong(2)) < 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val pre = filtered.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(pre.exists { case (q, vs) => postFiltered.getOrElse(q, Set.empty) != vs },
      "filtered search should recover neighbors post-filtering loses")
  }
}
