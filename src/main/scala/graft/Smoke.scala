package graft

import org.apache.spark.sql.SparkSession

import graft.gen.TxGen
import graft.operators.FraudRules

/** Dev smoke runner: drives the flagship entry pipeline and prints the
  * detection-vs-ground-truth crosstab. `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entry = SparkEntry.entry(spark).cache()
    println(s"ENTRY_ROWS=${entry.count()}")
    entry.show(8, truncate = false)

    println("--- status x event_type (detection vs injected ground truth) ---")
    FraudRules
      .scoreTransactions(TxGen.dataset(spark, 5000).toDF())
      .groupBy("event_type", "status")
      .count()
      .orderBy("event_type", "status")
      .show(20, truncate = false)
    spark.stop()
  }
}
