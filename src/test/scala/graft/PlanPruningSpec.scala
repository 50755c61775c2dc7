package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}

/** Physical-plan checks that the 100 TB contract holds at the scan: a
  * parquet read that drags unreferenced columns (the 500-char text
  * payload, the embedding arrays) through a 2-column pipeline is wrong
  * regardless of wall time at test scale. Asserts the `ReadSchema` of
  * every parquet scan in representative queries is a subset of the
  * columns the operator actually consumes.
  */
class PlanPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def readSchemas(df: org.apache.spark.sql.DataFrame): List[Set[String]] = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val schemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(s).map(_.group(1)).toList
    assert(schemas.nonEmpty, "no parquet scan found in plan")
    schemas.map(_.split(",").map(_.split(":")(0).trim).filter(_.nonEmpty).toSet)
  }

  test("text_tokens scans documents with only (doc_id, text)") {
    readSchemas(TextOps.queries("text_tokens")(spark, sf))
      .foreach(cols => assert(cols.subsetOf(Set("doc_id", "text")), cols))
  }

  test("text_entropy scans documents with only (doc_id, text)") {
    readSchemas(TextOps.queries("text_entropy")(spark, sf))
      .foreach(cols => assert(cols.subsetOf(Set("doc_id", "text")), cols))
  }

  // dedup_substring / the pair queries localCheckpoint their narrow scan
  // (the checkpoint's own plan prunes, but it executes eagerly and leaves
  // no scan in the final df) — assert the un-checkpointed signature query
  test("dedup_minhash_sig scans documents with only (doc_id, text)") {
    readSchemas(Dedup.queries("dedup_minhash_sig")(spark, sf))
      .foreach(cols => assert(cols.subsetOf(Set("doc_id", "text")), cols))
  }

  test("dedup_exact never reads lang/source/n_chars") {
    readSchemas(Dedup.queries("dedup_exact")(spark, sf))
      .foreach(cols => assert(cols.subsetOf(Set("doc_id", "text")), cols))
  }
}
