package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  Expression, GetJsonObject, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Cross-operator common-subexpression elimination for JSON path
  * extraction: `SELECT get_json_object(props, '$.k') ... WHERE
  * get_json_object(props, '$.k') ...` parses the JSON document twice per
  * row (Catalyst's subexpression elimination is per-operator; the Filter
  * and the Project each evaluate their own copy). The transpiled
  * `col:path` form (reference auto_router.py:358-364) hits this shape
  * constantly, and a JSON parse is the most expensive scalar in such
  * queries.
  *
  * Rewrite: `Project(p, Filter(c, child))` where the same
  * [[GetJsonObject]] appears in both `p` and `c` becomes
  * `Project(p', Filter(c', Project(child.* + extraction, child)))` — the
  * extraction is computed once per input row in the lower projection and
  * both the predicate and the output reference the attribute. The extra
  * projection is narrow (no shuffle) and fuses into the same whole-stage
  * codegen.
  */
object JsonPathCse extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, f @ Filter(cond, child))
        if child.resolved && sharedJsonPaths(projList, cond).nonEmpty =>
      val shared = sharedJsonPaths(projList, cond)
      val aliased = shared.zipWithIndex.map { case (e, i) =>
        Alias(e, s"__json_cse_$i")()
      }
      val byCanon = shared.map(_.canonicalized).zip(aliased).toMap
      def sub(expr: Expression): Expression = expr.transformDown {
        case e if byCanon.contains(e.canonicalized) =>
          byCanon(e.canonicalized).toAttribute
      }
      val lower = Project(child.output ++ aliased, child)
      val newCond = sub(cond)
      val newProj = projList
        .map(ne => sub(ne).asInstanceOf[NamedExpression])
      Project(newProj, Filter(newCond, lower))
  }

  /** Deterministic JSON extractions present in BOTH the projection and
    * the predicate (by canonicalized equality), rooted at attributes so
    * hoisting below the filter is always safe. */
  private def sharedJsonPaths(projList: Seq[NamedExpression],
      cond: Expression): Seq[GetJsonObject] = {
    def collect(e: Expression): Seq[GetJsonObject] = e.collect {
      case g: GetJsonObject
          if g.deterministic && g.references.nonEmpty &&
            g.children.forall(c => c.foldable || c.isInstanceOf[Attribute]) =>
        g
    }
    val inFilter = collect(cond).map(_.canonicalized).toSet
    projList.flatMap(collect).filter(g => inFilter(g.canonicalized))
      .groupBy(_.canonicalized).map(_._2.head).toSeq
  }
}
