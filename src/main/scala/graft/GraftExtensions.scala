package graft

import graft.functions.FixedPointDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-install surface for the engine's custom Catalyst pieces —
  * the `SparkSessionExtensions` path: set
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session on the cluster (including SQL-only users who never
  * touch the Scala API) gets `fixed_dot` resolved by the analyzer, with
  * codegen, no runtime `register()` call needed. This is the deployment
  * story for the 1000-executor cluster: extensions ship in the jar and
  * are active from the first query, instead of depending on each
  * notebook calling a registration helper.
  *
  * `VectorFunctions.register` remains as the per-session fallback for
  * environments that can't set cluster conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fixed_dot"),
      new ExpressionInfo(
        classOf[FixedPointDot].getName,
        null,
        "fixed_dot",
        "fixed_dot(a, b) - exact fixed-point dot product of two float arrays " +
          "(sum of floor(a[i]*b[i]*1e15) as BIGINT)",
        "", "", "", "math_funcs", "", "", "built-in"),
      (exprs: Seq[Expression]) => FixedPointDot(exprs.head, exprs(1))))

    // the custom AS-OF JOIN operator's planner strategy (the per-session
    // fallback is AsofJoinOps.asofJoin appending to extraStrategies)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
