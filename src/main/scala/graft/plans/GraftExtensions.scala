package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSim

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions into every session built with
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * This is the deployment-grade registration path (cluster-wide via config,
  * no driver code changes); `VectorExpressions.register(spark)` remains for
  * ad-hoc per-session registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    // post-hoc resolution (not optimizer): SQL layout routing must see
    // session views while they are still SubqueryAlias nodes
    ext.injectPostHocResolutionRule(s => SqlLayoutRouting(s))
    // CollapseCellEdits is deliberately NOT injected here: inside the
    // operator-optimization fixed-point batch it re-walks every large
    // projection on each iteration (a measured ~15% planning-time cost
    // on the 1k-edit burst), while the engine's own edit paths already
    // collapse their edit log before planning — the rule pays off only
    // for ad-hoc user-authored withColumn chains, which opt in via
    // CollapseCellEdits.install (a once-per-plan extraOptimizations
    // batch, not the fixed point).
  }
}

object GraftExtensions {
  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getCanonicalName, "graft_cosine"),
    (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1)))
}
