package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{ArrayDotProduct, KmvEstimate, KmvIntersect, KmvSketchAgg, KmvUnion}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT graft_dot(a, b)")` works for SQL-first users.
  *
  * Activate via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type FunctionEntry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def entry(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): FunctionEntry =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  private val functions: Seq[FunctionEntry] = Seq(
    entry("graft_dot", classOf[ArrayDotProduct]) { children =>
      require(children.length == 2, "graft_dot expects exactly 2 arguments")
      ArrayDotProduct(children.head, children(1))
    },
    // bottom-k (KMV) distinct sketches: aggregate + estimate/intersect/
    // union scalars (see org.apache.spark.sql.graft.KmvSketch)
    entry("graft_kmv", classOf[KmvSketchAgg]) { children =>
      children match {
        case Seq(c) => KmvSketchAgg(c).toAggregateExpression()
        case Seq(c, Literal(k: Int, _)) => KmvSketchAgg(c, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_kmv expects (col) or (col, k literal)")
      }
    },
    entry("graft_kmv_estimate", classOf[KmvEstimate]) { children =>
      require(children.length == 1, "graft_kmv_estimate expects exactly 1 argument")
      KmvEstimate(children.head)
    },
    entry("graft_kmv_intersect", classOf[KmvIntersect]) { children =>
      require(children.length == 2, "graft_kmv_intersect expects exactly 2 arguments")
      KmvIntersect(children.head, children(1))
    },
    entry("graft_kmv_union", classOf[KmvUnion]) { children =>
      require(children.length == 2, "graft_kmv_union expects exactly 2 arguments")
      KmvUnion(children.head, children(1))
    })

  /** Register on an already-built session (test/driver convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
