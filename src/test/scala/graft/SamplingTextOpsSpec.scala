package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SamplingOps, TextOps, TrainingPipeline}

/** Invariant checks for the corpus-mixture / repetition / PII / window
  * operators (exact values are pinned by the DuckDB oracle gate; these
  * assert the semantic properties the oracle cannot express).
  */
class SamplingTextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("corpus_mixture: weights sum to 1 and up-sample rare languages") {
    val rows = SamplingOps.queries("corpus_mixture")(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4)
    // temperature < 1 compresses the distribution: the rarest language
    // gets the largest up-sampling factor, the most common the smallest
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    assert(byN.head.getAs[Double]("upsample") >= byN.last.getAs[Double]("upsample"))
  }

  test("sample_manifest: deterministic and rate-consistent per language") {
    val m1 = SamplingOps.queries("sample_manifest")(spark, sf)
    val m2 = SamplingOps.queries("sample_manifest")(spark, sf)
    // stable across runs: same keep set
    assert(m1.filter(col("keep")).agg(sum("doc_id")).head.getLong(0) ==
      m2.filter(col("keep")).agg(sum("doc_id")).head.getLong(0))
    // every rate is a valid probability
    val rates = m1.select("rate").distinct().collect().map(_.getDouble(0))
    assert(rates.forall(r => r > 0.0 && r <= 1.0))
  }

  test("sample_manifest_upsampled: repeats realize the mixture mass") {
    val m = SamplingOps.queries("sample_manifest_upsampled")(spark, sf)
      .localCheckpoint(true)
    val nTotal = m.count()
    // expected total repeats = Σ_l rate_l · n_l = Σ_l weight_l · n_total
    // = n_total; the bernoulli realization must land within a few percent
    val repeats = m.agg(sum("n_repeats")).head.getLong(0)
    assert(math.abs(repeats - nTotal).toDouble / nTotal < 0.05,
      s"repeats $repeats vs corpus $nTotal")
    // rare languages upsample (rate > 1 → every doc kept at least once)
    val rates = m.select("lang", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates.values.exists(_ > 1.0), s"no language upsampled: $rates")
    assert(m.filter(col("rate") > 1.0 && col("n_repeats") < 1).count() == 0,
      "an upsampled language must never drop a document")
    // deterministic across runs
    val again = SamplingOps.queries("sample_manifest_upsampled")(spark, sf)
      .agg(sum("n_repeats")).head.getLong(0)
    assert(again == repeats)
  }

  test("corpus_mixture_tokens: token-mass weights sum to 1, rare langs upsample") {
    val rows = SamplingOps.queries("corpus_mixture_tokens")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    val byT = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byT.head.getAs[Double]("upsample") >= byT.last.getAs[Double]("upsample"))
  }

  test("split_assign_leakage_safe: one split per cluster, and it closes a real leak") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val rows = TrainingPipeline.queries("split_assign_leakage_safe")(spark, sf)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // THE safety property: every near-dup cluster maps to exactly one split
    rows.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.map(_._3).distinct.length === 1, s"cluster $c split across sets")
    }
    // non-vacuous: the per-doc hash split really separates at least one
    // same-cluster pair (the leak this operator exists to close)
    val perDoc = TrainingPipeline.queries("split_assign")(spark, sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val leaked = rows.groupBy(_._2).values.exists { rs =>
      rs.map(r => perDoc(r._1)).distinct.length > 1
    }
    assert(leaked, "fixture has no pair the per-doc split separates — vacuous")
    // thresholds agree with split_assign's convention
    val buckets = TrainingPipeline.queries("split_assign_leakage_safe")(spark, sf)
      .select("split_bucket", "split").as[(Long, String)].collect()
    buckets.foreach { case (b, sp) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp === want, s"bucket $b")
    }
  }

  test("text_repetition: ratios bounded and consistent with distinct counts") {
    val rows = TextOps.queries("text_repetition")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_ratio")
      val top = r.getAs[Double]("top_share")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_words"))
    }
  }

  test("text_bigram_logprob matches a naive interpolated bigram LM") {
    assume(TestSpark.fixturesPresent, TestSpark.fixturesHint)
    import spark.implicits._
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1) }
    val bigrams = texts.map { case (id, ws) => id -> ws.dropRight(1).zip(ws.drop(1)) }
    val bcnt = bigrams.flatMap(_._2).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val ccnt = bcnt.toSeq.groupBy(_._1._1).map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    val ucnt = texts.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val total = ucnt.values.sum
    val want = bigrams.filter(_._2.nonEmpty).map { case (id, bs) =>
      val qs = bs.map { case (w1, w2) =>
        math.round(math.log(
          0.8 * bcnt((w1, w2)) / ccnt(w1) + 0.2 * ucnt(w2) / total.toDouble) * 1e6)
      }
      id -> ((bs.length.toLong, qs.sum))
    }.toMap
    val got = TextOps.queries("text_bigram_logprob")(spark, sf)
      .select("doc_id", "n_bigrams", "sum_q").as[(Long, Long, Long)].collect()
      .map { case (id, n, q) => id -> ((n, q)) }.toMap
    assert(got === want)
    // low = stereotypical text; the score must vary across the corpus
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("text_pii_scrub: planted PII is found and fully redacted") {
    val rows = TextOps.queries("text_pii_scrub")(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") == (id % 3).toInt)
      assert(r.getAs[Int]("n_phones") == (id % 2).toInt)
      assert(r.getAs[Int]("n_ips") == 1)
      val scrubbed = r.getAs[String]("scrubbed")
      assert(!scrubbed.contains("@mail.example") && !scrubbed.contains(" 555-"))
    }
  }

  test("pack_windows: windows tile every document with the configured stride") {
    val rows = TrainingPipeline.queries("pack_windows")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.getAs[Long]("tok_start"))
      val n = sorted.head.getAs[Long]("n_tokens")
      assert(sorted.head.getAs[Long]("tok_start") == 0L)
      assert(sorted.last.getAs[Long]("tok_end") == n)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("tok_start") - a.getAs[Long]("tok_start") ==
            TrainingPipeline.WinStride)
          // consecutive windows overlap (no token gap)
          assert(b.getAs[Long]("tok_start") < a.getAs[Long]("tok_end"))
        case _ => ()
      }
    }
  }

  test("corpus_train_manifest: internally consistent and agrees with its component operators") {
    val sf = TestSpark.sf0001
    val rows = TrainingPipeline.queries("corpus_train_manifest")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (split, q, ex, cl, contam, keep) = (r.getString(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))
      // keep_train is exactly its definition, row by row
      assert(keep == (split == "train" && q >= 0.5 && ex && cl && !contam))
      // only the train side can carry the contamination flag
      if (split != "train") assert(!contam)
    }
    // the flagged-train set is the transpose of decontam_neardup's pair set
    val flagged = rows.filter(_.getBoolean(5)).map(_.getLong(0)).toSet
    val pairs = graft.operators.Dedup.trainEvalNearDup(spark, sf)._2
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(flagged == pairs)
    // quality/canonical columns agree with training_decisions
    val td = TrainingPipeline.queries("training_decisions")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    rows.foreach { r =>
      val (q2, ex2, cl2) = td(r.getLong(0))
      assert(r.getDouble(2) == q2 && r.getBoolean(3) == ex2 && r.getBoolean(4) == cl2)
    }
  }

  test("corpus_train_manifest_stored: identical rows to the one-shot, labels from the persisted store") {
    // VERDICT r14 #1: the deployment-shape manifest composes persisted
    // SigStore labels instead of re-running the components fixpoint; the
    // two forms must be row-identical (the store's labels ARE the
    // clustering). Sorting by doc_id gives a total order (ids unique).
    val sf = TestSpark.sf0001
    val oneShot = TrainingPipeline.queries("corpus_train_manifest")(spark, sf)
      .orderBy("doc_id").collect()
    val stored = TrainingPipeline.queries("corpus_train_manifest_stored")(spark, sf)
      .orderBy("doc_id").collect()
    assert(oneShot.length == 500 && stored.length == 500)
    assert(oneShot.map(_.toString).toSeq == stored.map(_.toString).toSeq)
    // warm serve reads ONLY persisted label state: no cold store build
    // may fire on a repeat invocation (the ColdBuilds attribution seam)
    val mark = graft.ColdBuilds.mark()
    TrainingPipeline.queries("corpus_train_manifest_stored")(spark, sf).count()
    assert(graft.ColdBuilds.since(mark).isEmpty)
  }
}
