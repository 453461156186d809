package graft.expressions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, LessThan, And, Greatest, Least, CreateNamedStruct, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** Column wrappers + SQL registration for the native expressions.
  *
  * Register on the session builder:
  * {{{ SparkSession.builder().withExtensions(new GraftExtensions) }}}
  * or via config: `spark.sql.extensions=graft.expressions.GraftExtensions`,
  * then `SELECT dot_product(a, b)`, `interval_overlaps(x, y)`,
  * `interval_intersect(x, y)` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
}

object GraftExtensions {

  /** Codegen'd dot product as a Column (drop-in for the interpreted
    * zip_with/aggregate fold — same element order, same double math). */
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  private def startOf(e: Expression) = UnresolvedExtractValue(e, Literal("start"))
  private def stopOf(e: Expression) = UnresolvedExtractValue(e, Literal("stop"))

  /** A Column-composed function lifted into a SQL expression builder via
    * the Bridge round-trip — the registered function expands to the SAME
    * expression tree the Scala API builds (codegen status included). */
  private def lift1(f: Column => Column): Seq[Expression] => Expression =
    exprs => Bridge.resolvableExpression(f(Bridge.column(exprs(0))))

  /** Same functions, resolvable from SQL text. Interval helpers compose
    * built-ins (already codegen'd); dot_product is the native expression;
    * the text/dedup scalars expand to their Column-path expression trees,
    * so SQL users get identical (oracle-parity) values. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { exprs => DotProduct(exprs(0), exprs(1)) },
    "interval_overlaps" -> { exprs =>
      And(
        LessThan(startOf(exprs(0)), stopOf(exprs(1))),
        LessThan(startOf(exprs(1)), stopOf(exprs(0))))
    },
    "interval_intersect" -> { exprs =>
      CreateNamedStruct(Seq(
        Literal("start"), Greatest(Seq(startOf(exprs(0)), startOf(exprs(1)))),
        Literal("stop"), Least(Seq(stopOf(exprs(0)), stopOf(exprs(1))))))
    },
    "interval_duration" -> lift1(graft.intervals.IntervalCols.duration),
    "token_count" -> lift1(graft.functions.TextFunctions.tokenCount),
    "bpe_token_count" -> lift1(graft.functions.TextFunctions.bpeTokenCount),
    "token_hash" -> lift1(graft.functions.TextFunctions.tokenHash),
    "lang_id" -> lift1(graft.functions.TextFunctions.langId),
    "quality_score" -> lift1(graft.functions.TextFunctions.qualityScore),
    "doc_fingerprint" -> lift1(graft.functions.TextFunctions.fingerprint),
    "simhash32" -> lift1(graft.functions.Dedup.simhash32))
}
