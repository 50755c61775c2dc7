package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** dedup_substring's content-defined window sampler as a native Catalyst
  * expression (r20, the WinnowFps treatment applied to its sibling):
  * hash every `winLen`-codepoint window of the input with the module's
  * portable `int(md5(window)[:8 hex])`, keep hashes ≡ 0 (mod `modSel`),
  * and return the distinct survivors in first-occurrence order.
  *
  * Semantically identical to the pure-SQL form it replaces —
  * {{{
  *   array_distinct(filter(
  *     transform(sequence(1, length(text) - (winLen-1)),
  *       i -> cast(conv(substring(md5(substring(text, i, winLen)), 1, 8), 16, 10) as bigint)),
  *     h -> h % modSel = 0))
  * }}}
  * (which remains the DuckDB oracle) — but that form is a higher-order
  * lambda chain, so Spark evaluates it INTERPRETED per window: expression
  * tree-walk, a 32-char hex string, a substring, and a base-16 parse for
  * every window of every document. This form hashes each window's UTF-8
  * bytes once into a reused digest buffer and reads the first 4 bytes as
  * the unsigned big-endian value — the same integer `conv(substring(hex,
  * 1, 8), 16, 10)` parses, with zero intermediate strings.
  *
  * Windows are CODEPOINT-indexed (like Spark's `substring` / DuckDB's
  * `substr`) and hashed over raw UTF-8 bytes, so all engines agree on any
  * input (same convention as [[WinnowFps]]).
  */
case class ContentWindows(child: Expression, winLen: Int, modSel: Int)
    extends UnaryExpression {

  require(winLen >= 1 && modSel >= 1, "winLen and modSel must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"content_windows requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_windows"

  override def nullSafeEval(input: Any): Any =
    ContentWindows.compute(input.asInstanceOf[UTF8String], winLen, modSel)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.ContentWindows.compute($c, $winLen, $modSel);"
    })

  override protected def withNewChildInternal(newChild: Expression): ContentWindows =
    copy(child = newChild)
}

object ContentWindows {

  /** Distinct sampled window hashes, first-occurrence order (matching
    * `array_distinct` over the filtered transform). Empty array when the
    * string is shorter than winLen codepoints.
    */
  def compute(u: UTF8String, winLen: Int, modSel: Int): ArrayData = {
    val bytes = u.getBytes
    // codepoint starts (UTF-8 continuation bytes carry the 10xxxxxx
    // prefix) + terminal offset — windows are codepoint-indexed but
    // hashed over their raw UTF-8 bytes (the WinnowFps convention)
    var nCp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nCp += 1
      i += 1
    }
    val nWins = nCp - winLen + 1
    if (nWins < 1) return ArrayData.toArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = bytes.length

    val md = MessageDigest.getInstance("MD5")
    val digest = new Array[Byte](16) // reused across windows
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < nWins) {
      val from = starts(w)
      md.update(bytes, from, starts(w + winLen) - from)
      md.digest(digest, 0, 16) // resets for the next window
      // first 8 hex chars = first 4 bytes, big-endian, unsigned — the
      // exact value conv(substring(md5_hex, 1, 8), 16, 10) parses
      val h = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      if (h % modSel == 0) seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    ArrayData.toArrayData(out)
  }

  /** Register `content_windows(str, winLen, modSel)` (literal int params)
    * for use from `expr(...)`.
    */
  /** Require a foldable integral literal before eval'ing a builder
    * parameter (ADVICE r20: `content_windows(text, col, 4)` or a string
    * literal otherwise fails with an obscure eval/ClassCastException at
    * registration-expansion time).
    */
  private def literalInt(e: Expression, what: String): Int = {
    require(e.foldable,
      s"content_windows: $what must be a literal integer, got ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"content_windows: $what must be a literal integer, got ${e.sql} = $other")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("content_windows"))) {
      reg.createOrReplaceTempFunction(
        "content_windows",
        exprs => ContentWindows(exprs.head,
          literalInt(exprs(1), "winLen"), literalInt(exprs(2), "modSel")),
        "scala_udf"
      )
    }
  }
}
