package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-merge subword tokenizer (public-knowledge BPE:
  * start from characters, apply an ordered merge list) with a FIXED tiny
  * merge table, shared between the Spark expression and its DuckDB oracle
  * twin so the count is hash-checkable cross-engine.
  *
  * Tokenization of one word:
  *   1. spaced character form `" c1 c2 … cn "` (leading+trailing space —
  *      the sentinel that keeps merge patterns from matching across
  *      symbol boundaries);
  *   2. for each merge rule `x y → xy` IN ORDER, replace `" x y "` with
  *      `" xy "` repeatedly until the pattern no longer occurs (global
  *      left-to-right non-overlapping replace per pass — Java
  *      `String.replace` and DuckDB `replace` share these semantics
  *      exactly, which is what makes the oracle twin sound);
  *   3. token count = remaining spaces − 1.
  *
  * Later rules reference symbols formed by earlier ones ("th e" needs
  * "t h" first) — the structure of a real learned BPE merge list.
  */
object BpeMerges {

  /** Ordered merge list (pattern in spaced-symbol form → merged symbol).
    * Tiny on purpose: the operator under test is the tokenizer plumbing
    * and its cross-engine determinism, not linguistic coverage.
    */
  val merges: Seq[(String, String)] = Seq(
    "t h", "i n", "a n", "e r", "o n", "r e", "e n", "a t", "o r",
    "e s", "s t", "a r", "o u", "th e", "in g", "an d", "e d", "o f",
    "t o", "i s").map(p => (p, p.replace(" ", "")))

  /** Replace passes per rule — BOTH engines apply exactly this many, so
    * the tokenizer is the same total function on every input by
    * construction (no reachable-divergence class for exotic words). One
    * pass merges at least half of a rule's remaining occurrences (a
    * match can only shield its immediate right neighbor by consuming the
    * shared boundary space), so 8 passes IS the fixpoint for words up to
    * ~128 chars — far beyond the corpus; longer merge-dense words get
    * the identical bounded tokenization on both sides.
    */
  val SqlFixpointPasses = 8

  /** DuckDB CTE chain applying the merge passes — the oracle twin of
    * [[BpeTokenCount]], generated from the same merge table. One CTE per
    * (rule, pass) keeps every expression depth-1 (a single nested
    * formulation blows DuckDB's 128-level binder recursion cap). Input
    * CTE `src` must expose (doc_id, s) with `s` in spaced-char form; the
    * returned (cteSql, finalName) chain ends with `s` fully merged.
    */
  def duckdbMergeCtes(src: String): (String, String) = {
    val steps = for {
      ((pat, rep), r) <- merges.zipWithIndex
      p <- 1 to SqlFixpointPasses
    } yield (s"bpe_${r}_$p", s" $pat ", s" $rep ")
    val ctes = steps.zipWithIndex.map { case ((name, pat, rep), i) =>
      val prev = if (i == 0) src else steps(i - 1)._1
      s"$name AS (SELECT doc_id, replace(s, '$pat', '$rep') s FROM $prev)"
    }
    (ctes.mkString(",\n"), steps.last._1)
  }
}

/** `bpe_token_count(text)`: total subword token count over the
  * whitespace-split words of `text` under [[BpeMerges]] — LongType, never
  * null for non-null input. Codegen calls straight into [[count]]
  * (the SimHash48 idiom): no interpreted fallback in the hot path.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bpe_token_count(string)")

  // spaced patterns precomputed once per expression instance
  private val patterns: Array[(String, String)] =
    BpeMerges.merges.map { case (p, r) => (s" $p ", s" $r ") }.toArray

  private def tokensOfWord(w: String): Long = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    var r = 0
    while (r < patterns.length) {
      val (pat, rep) = patterns(r)
      // bounded passes, NOT while-contains: the SQL twin applies exactly
      // SqlFixpointPasses nested replaces, and parity must hold for any
      // input — including words long enough that 8 passes is not yet the
      // fixpoint
      var pass = 0
      while (pass < BpeMerges.SqlFixpointPasses && s.contains(pat)) {
        s = s.replace(pat, rep)
        pass += 1
      }
      r += 1
    }
    var spaces = 0L
    var j = 0
    while (j < s.length) { if (s.charAt(j) == ' ') spaces += 1; j += 1 }
    spaces - 1L
  }

  def count(input: UTF8String): Long = {
    val words = input.toString.split(" ", -1)
    // per-row word cache: corpus text repeats words heavily and the merge
    // loop is the expensive part (the SimHash48 md5-cache idiom)
    val cache = new java.util.HashMap[String, Long]()
    var total = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var c = cache.getOrDefault(w, -1L)
      if (c == -1L) { c = tokensOfWord(w); cache.put(w, c) }
      total += c
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeTokenCount", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
