package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{DotProduct, HyperplaneSig}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available from SQL. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions`):
  *
  * {{{ SELECT graft_dot(a.v, b.v) FROM ... }}}
  * {{{ SELECT graft_hyperplane_sig(v, 42, 8, 10) FROM ... }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectFunction(GraftExtensions.hyperplaneSigFunction)
  }
}

object GraftExtensions {
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case _ => throw new IllegalArgumentException(
      s"graft_hyperplane_sig: $what must be an integer literal, got $e")
  }

  /** Banded hyperplane-LSH signature as a SQL function:
    * graft_hyperplane_sig(vec, seed, bands, bits) — seed/bands/bits must be
    * literals (they parameterize the generated code, like the DataFrame API).
    */
  val hyperplaneSigFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
    (children: Seq[Expression]) => {
      require(children.size == 4,
        "graft_hyperplane_sig takes (vec, seed, bands, bits)")
      HyperplaneSig(children.head, litLong(children(1), "seed"),
        litLong(children(2), "bands").toInt, litLong(children(3), "bits").toInt)
    })
}
