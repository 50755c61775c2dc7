package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** BPE merge-rule TRAINING (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the
  * public-knowledge byte-pair-encoding recipe): iteratively find the
  * most frequent adjacent symbol pair in the corpus and merge it, N
  * times. The applier half of the family ([[graft.functions.BpeMerges]] /
  * `text_bpe_tokens`) consumes a FIXED merge list; this operator is
  * where such a list comes from — the real tokenizer-training step of
  * an LLM data pipeline.
  *
  * == The word-frequency dictionary trick (the 100 TB shape) ==
  *
  * BPE statistics depend only on the WORD-FREQUENCY DICTIONARY, not the
  * raw corpus: every occurrence of "the" contributes the same pairs, so
  * one distributed pass builds (word, freq) and the N merge rounds run
  * over the dictionary alone — exactly how production tokenizer
  * trainers work. The dictionary is Zipf-bounded; [[DictCap]] caps it
  * to the top (freq DESC, word) entries (the kmeansTrainCap idiom: at
  * every oracle scale the cap covers the full vocabulary, so results
  * are identical to the uncapped trainer there; at 100 TB the tail of
  * hapax words it drops contributes ~nothing to pair counts). The
  * rounds themselves are bounded driver work over the collected
  * dictionary — the same bounded-model-update classification as the
  * Lloyd trainer's K×dims collect.
  *
  * == Determinism (the oracle contract) ==
  *
  * Pair counts are integer sums (order-independent); the winning pair
  * breaks count ties lexicographically. Merging applies the SQL-replace
  * semantics LITERALLY: each round rewrites every word's spaced-symbol
  * string via `replace(" x y ", " xy ")` repeated
  * [[graft.functions.BpeMerges.SqlFixpointPasses]] times — Java
  * `String.replace` and DuckDB `replace` share left-to-right
  * non-overlapping semantics exactly (the applier's documented
  * equivalence), so the trained rules are bit-identical across engines
  * by construction, not by numeric luck. The oracle unrolls the N
  * rounds as CTE chains with the winning pattern CROSS JOINed in
  * (data-dependent replace patterns are plain SQL).
  */
object BpeTrain {

  /** Merge rounds to learn. 16 exercises the interesting structure
    * (later rules referencing symbols formed by earlier ones) while the
    * unrolled oracle stays comfortably under DuckDB's binder limits.
    */
  val TrainMerges = 16

  /** Dictionary cap (freq DESC, word tie-break): full-vocabulary at
    * every oracle scale (fixture vocab « 100k), the Zipf-tail lever at
    * 100 TB.
    */
  val DictCap = 100000

  /** The collected (word, freq) dictionary, deterministic order. */
  private def dict(s: SparkSession, d: String): Array[(String, Long)] =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "") // empty tokens carry no pairs
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(DictCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** " c1 c2 … cn " spaced form — the applier's sentinel convention
    * (leading+trailing space keeps patterns from matching across word
    * symbol boundaries). (?s) so '.' matches any char, like DuckDB's
    * 's' regex flag.
    */
  private def spaced(w: String): String = " " + w.replaceAll("(?s)(.)", "$1 ")

  /** Train [[TrainMerges]] rules over a dictionary; returns
    * (rank, pair, merged, freq) rows.
    */
  private[graft] def trainRules(d: Array[(String, Long)])
      : Seq[(Int, String, String, Long)] = {
    var words = d.map { case (w, f) => (f, spaced(w)) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to TrainMerges) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (f, sp) =>
        val syms = sp.trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + " " + syms(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.nonEmpty) {
        // max count, lexicographically smallest pair on ties — the SQL
        // ORDER BY cnt DESC, pair LIMIT 1
        val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        val pat = " " + pair + " "
        val rep = " " + pair.replace(" ", "") + " "
        words = words.map { case (f, sp) =>
          var t = sp
          var k = 0
          while (k < graft.functions.BpeMerges.SqlFixpointPasses) {
            t = t.replace(pat, rep); k += 1
          }
          (f, t)
        }
        out += ((r, pair, pair.replace(" ", ""), cnt))
      }
    }
    out.result()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_train_merges" -> ((s, d) => {
      import s.implicits._
      trainRules(dict(s, d)).toDF("rank", "pair", "merged", "freq")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "bpe_train_merges" -> {
      val passes = graft.functions.BpeMerges.SqlFixpointPasses
      val rounds = (1 to TrainMerges).map { r =>
        val prev = if (r == 1) "w0" else s"w${r - 1}p$passes"
        // AS MATERIALIZED on every chain link: DuckDB inlines
        // single-reference CTEs, and with each b$r referenced by all 8
        // pass CTEs the inlined chain-of-chains re-expands the whole
        // prefix per reference — exponential plan size and one parquet
        // open per expansion (measured: "Too many open files")
        val passCtes = (1 to passes).map { p =>
          val src = if (p == 1) prev else s"w${r}p${p - 1}"
          s"""w${r}p$p AS MATERIALIZED (SELECT w.freq, replace(w.s, ' ' || b.pair || ' ',
             |  ' ' || replace(b.pair, ' ', '') || ' ') s FROM $src w CROSS JOIN b$r b)""".stripMargin
        }.mkString(",\n")
        s"""p$r AS MATERIALIZED (SELECT syms[i] || ' ' || syms[i+1] pair, sum(freq)::BIGINT cnt
           |  FROM (SELECT freq, string_split(trim(s), ' ') syms FROM $prev),
           |       unnest(range(1, len(syms))) t(i)
           |  GROUP BY 1),
           |b$r AS MATERIALIZED (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
           |$passCtes""".stripMargin
      }.mkString(",\n")
      val union = (1 to TrainMerges)
        .map(r =>
          s"SELECT CAST($r AS INT) rank, pair, replace(pair, ' ', '') merged, cnt freq FROM b$r")
        .mkString("\nUNION ALL ")
      s"""WITH wd AS (SELECT word, count(*)::BIGINT freq FROM (
         |    SELECT unnest(string_split(text, ' ')) word FROM documents)
         |  WHERE word <> '' GROUP BY 1),
         |dict AS MATERIALIZED (SELECT word, freq FROM wd ORDER BY freq DESC, word LIMIT $DictCap),
         |w0 AS MATERIALIZED (SELECT freq, ' ' || regexp_replace(word, '(.)', '\\1 ', 'gs') s FROM dict),
         |$rounds
         |$union""".stripMargin
    }
  )
}
