package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for Spark's extension mechanism: register the graft
  * expression family in ANY session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` — no code
  * changes in the user's application, functions resolve in SQL and
  * `expr(...)` like built-ins. (`GraftFunctions.register` remains the
  * per-session programmatic alternative.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(str) - distinct 3-word shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head, 3)))
    ext.injectFunction((FunctionIdentifier("dot_double"),
      info("dot_double", "dot_double(a, b) - double-array dot product"),
      (exprs: Seq[Expression]) => DotDouble(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash48"),
      info("simhash48", "simhash48(str) - 48-bit SimHash of a space-separated string"),
      (exprs: Seq[Expression]) => SimHash48(exprs.head)))
  }
}
