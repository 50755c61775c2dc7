package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash
  * `h = (h * 31 + codepoint) mod 1e9+7` over the string's Unicode code
  * points — NOT UTF-16 units, so supplementary-plane characters (emoji,
  * rare CJK) hash as one value, matching the DuckDB oracle's per-character
  * `ascii(substr(s, i, 1))` iteration.
  *
  * A native Catalyst `Expression` with `doGenCode` so the per-character
  * loop runs inside whole-stage codegen — no UDF boxing, no lambda
  * allocation per row (the same hash is SQL-expressible via
  * aggregate/split, but that materializes a per-character array; this is
  * the hot-path form for 100 TB text scans). The modulus keeps every
  * intermediate below 2^63 so the identical recurrence is expressible in
  * DuckDB (`list_reduce`) for the oracle.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  private final val Mod = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $s.length();) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value}Acc = (${ev.value}Acc * 31L + $cp) % ${Mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Register `rolling_hash(str)` in the session's function registry so it
    * is usable from `expr(...)` / `spark.sql(...)`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"))) {
      reg.createOrReplaceTempFunction(
        "rolling_hash",
        exprs => RollingHash(exprs.head),
        "scala_udf"
      )
    }
  }
}
