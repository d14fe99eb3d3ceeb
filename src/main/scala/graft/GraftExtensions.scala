package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftfns.DotProduct

/** Session extension wiring: exposes the engine's custom Catalyst
  * expressions to SQL users.
  *
  * Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; afterwards
  * `SELECT dot_product(a, b)` resolves like a built-in (parsed,
  * analyzed, codegen'd — no UDF registry indirection). No custom
  * optimizer rules or strategies are injected: the operator inventory is
  * expressible in declarative plans Catalyst already optimizes
  * (SURVEY.md §4.1). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        // arity-checked here: raw args(1) indexing would surface as an
        // IndexOutOfBoundsException during resolution instead of an
        // analysis error naming the function
        if (args.length != 2) throw new IllegalArgumentException(
          s"dot_product requires exactly 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }))
  }
}
