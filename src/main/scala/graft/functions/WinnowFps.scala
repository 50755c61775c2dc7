package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003) as a
  * native Catalyst expression: the distinct minima of a sliding
  * `winSize`-window over the `int(md5(gram)[:8 hex])` hashes of every
  * `gramLen`-codepoint gram of the input string.
  *
  * Semantically identical to the pure-SQL form
  * {{{
  *   array_distinct(transform(sequence(1, n_windows),
  *     j -> array_min(slice(gh, j, w))))       -- gh = transform(..., md5...)
  * }}}
  * (which remains the DuckDB oracle), but evaluated as ONE tight JVM loop:
  * higher-order SQL functions never enter whole-stage codegen, so the SQL
  * form pays interpreted-eval tree-walk + boxing for every gram and every
  * window slice — measured ~140 ms/doc on the fixture corpus, which
  * serialized the whole bench behind a single 700-s task. This form hashes
  * each gram once (one reused MessageDigest, no intermediate strings) and
  * takes window minima with a monotonic deque — O(grams) total, ~0.2 ms/doc,
  * and the per-row work itself lives inside codegen via a single static
  * call (the loop is compiled Scala either way; nothing to gain from
  * emitting it as Java source).
  *
  * Grams are CODEPOINT-indexed (like Spark's `substring` and DuckDB's
  * `substr`) and hashed over their UTF-8 bytes (like `md5(cast(s as
  * binary))`), so the three engines agree on any input, not just ASCII.
  */
case class WinnowFps(child: Expression, gramLen: Int, winSize: Int)
    extends UnaryExpression {

  require(gramLen >= 1 && winSize >= 1, "gramLen and winSize must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], gramLen, winSize)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WinnowFps.compute($c, $gramLen, $winSize);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  /** Distinct window minima of the gram-hash sequence, first-occurrence
    * order (matching `array_distinct` over the window-min transform).
    * Empty array when the string is shorter than gramLen + winSize − 1
    * codepoints (no complete window exists).
    */
  def compute(u: UTF8String, gramLen: Int, winSize: Int): ArrayData = {
    val bytes = u.getBytes
    // byte offset of each codepoint start (UTF-8 continuation bytes have
    // the 10xxxxxx prefix), plus the terminal offset — grams are
    // codepoint-indexed but hashed over their raw UTF-8 bytes
    var nCp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nCp += 1
      i += 1
    }
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = bytes.length

    val nGrams = nCp - gramLen + 1
    val nWindows = nGrams - winSize + 1
    if (nWindows < 1) return ArrayData.toArrayData(Array.emptyLongArray)

    val md = MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused digest buffer (r20: digest()
    // allocated a fresh 16-byte array per gram — one per input character)
    val gh = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      md.update(bytes, from, starts(g + gramLen) - from)
      md.digest(d, 0, 16) // resets for the next gram
      gh(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }

    // monotonic deque of candidate-min indices; ties keep the earlier
    // index (>{}, not >=) — irrelevant to the distinct VALUE set, but it
    // mirrors array_min's scan order exactly
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nGrams) {
      while (tail > head && gh(dq(tail - 1)) > gh(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - winSize) head += 1
      if (i >= winSize - 1) seen.add(gh(dq(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    ArrayData.toArrayData(out)
  }

  /** Register `winnow_fps(str, gramLen, winSize)` (literal int params) in
    * the session's function registry for use from `expr(...)`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fps"))) {
      reg.createOrReplaceTempFunction(
        "winnow_fps",
        exprs => WinnowFps(exprs.head,
          exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
        "scala_udf"
      )
    }
  }
}
