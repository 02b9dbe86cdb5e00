package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, CaseWhen, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.core.Positional.POS

/** Optimizer rule for the stacked-cell-edit pathology (SURVEY.md §4, last
  * table row): API users who apply [[graft.ops.CellOps.setCell]] repeatedly
  * build `CASE WHEN __pos=p THEN v ELSE <previous> END` towers. Catalyst's
  * own `CollapseProject` merges the projections but leaves one deeply
  * *nested* CaseWhen per column — codegen then emits nesting-depth-deep
  * branches (split or abandoned past JVM method limits), and every dead
  * overwrite of the same cell survives as a live branch.
  *
  * This rule flattens a nested single-cell-edit chain into one flat
  * multi-branch CaseWhen and drops overwritten branches. Order is
  * preserved — the newest edit is the outermost CASE, so it becomes the
  * first branch and CaseWhen's first-match-wins keeps last-write-wins
  * semantics; dedup only removes branches that could never fire.
  *
  * (The interactive [[graft.core.EditorSession]] never creates these towers
  * — its edit log compacts before planning. The rule protects the
  * plain-DataFrame API path.)
  */
object CollapseCellEdits extends Rule[LogicalPlan] {

  /** Peel `CASE WHEN __pos = <lit> THEN <lit> ELSE tail END` chains. All
    * branches must test the SAME `__pos` attribute (by exprId): a plan over
    * a join of two positioned tables carries two attributes named `__pos`,
    * and deduping across them would drop live branches.
    */
  private def peel(e: Expression): (Seq[(Expression, Expression)], Expression) = {
    def loop(e: Expression, attrId: Option[Long])
        : (Seq[(Expression, Expression)], Expression) = e match {
      case CaseWhen(Seq((cond @ EqualTo(attr: AttributeReference, _: Literal),
          v: Literal)), Some(tail))
          if attr.name == POS && attrId.forall(_ == attr.exprId.id) =>
        val (branches, base) = loop(tail, Some(attr.exprId.id))
        ((cond, v) +: branches, base)
      case other => (Nil, other)
    }
    loop(e, None)
  }

  private def posOf(branch: (Expression, Expression)): Any = branch._1 match {
    case EqualTo(_, Literal(p, _)) => p
    case _ => null
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(list, _) =>
      var changed = false
      val newList = list.map {
        case a @ Alias(cw: CaseWhen, name) =>
          val (branches, base) = peel(cw)
          if (branches.length >= 2) {
            // first occurrence (newest edit) of each position wins
            val deduped = branches.foldLeft(
              (Vector.empty[(Expression, Expression)], Set.empty[Any])) {
              case ((acc, seen), b) =>
                val k = posOf(b)
                if (seen(k)) (acc, seen) else (acc :+ b, seen + k)
            }._1
            if (deduped.length < branches.length || isNested(cw)) {
              changed = true
              Alias(CaseWhen(deduped, Some(base)), name)(
                a.exprId, a.qualifier, a.explicitMetadata)
            } else a
          } else a
        case other => other
      }
      if (changed) p.copy(projectList = newList) else p
  }

  private def isNested(cw: CaseWhen): Boolean = cw.elseValue match {
    case Some(_: CaseWhen) => true
    case _ => false
  }

  /** Per-session installation into the once-per-plan extraOptimizations
    * batch. This is the ONLY registration path (GraftExtensions stopped
    * injecting it into the operator-optimization fixed point, where its
    * re-walks of large projections cost more planning time than the
    * collapse saves — the engine's edit paths pre-collapse their edit
    * log, so the rule exists for ad-hoc user-authored withColumn
    * chains).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
