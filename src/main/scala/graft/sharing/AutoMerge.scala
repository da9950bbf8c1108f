package graft.sharing

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col

/** Automatic detection + merge of same-shape aggregate jobs from their
  * ANALYZED Catalyst plans — the reference's hybrid/MultiplePipelines slot
  * (§2.1 #18/#19), done declaratively.
  *
  * The reference pattern-matched serialized RDD DAGs and rewired them with a
  * mutable-lineage fork (reference: .../rewriter/rules/scan/MultiplePipelines
  * .scala — core commented out; .../rewriter/rules/hybrid left a stub). Here
  * the detector pattern-matches `Aggregate [- Filter] - LogicalRelation`
  * plans; compatible jobs (same relation fingerprint, same grouping keys)
  * collapse into ONE Aggregate over the UNFILTERED relation where every
  * job's row filter moves into its aggregates' FILTER clause
  * (`AggregateExpression.filter`) — one scan, one shuffle, zero tuple
  * tagging, evaluated inside codegen. Jobs that don't match the shape run
  * unmerged and still benefit from scan caching — that combination is the
  * hybrid rewrite.
  *
  * Rebinding: each job's DataFrame instantiates the relation with fresh
  * attribute exprIds, so expressions are remapped onto the canonical (first)
  * job's relation output by column name before merging.
  */
object AutoMerge {

  /** One job's recognized shape: scan fingerprint, grouping key names (in
    * output order), optional row filter, and the aggregate aliases. */
  final case class Shape(rel: LogicalRelation, fp: String, keyNames: Seq[String],
                         cond: Option[Expression], aggs: Seq[Alias])

  /** Recognize `relation [- Filter] - Aggregate(attr keys, key refs ++
    * aliased aggregates)`; anything else → None (runs unmerged). */
  def shapeOf(plan: LogicalPlan): Option[Shape] = plan match {
    case Aggregate(groupExprs, aggExprs, child, _) =>
      val relAndCond = child match {
        case Filter(c, lr: LogicalRelation) => Some((lr, Some(c)))
        case lr: LogicalRelation => Some((lr, None))
        case _ => None
      }
      relAndCond.flatMap { case (lr, cond) =>
        val keyAttrs = groupExprs.map {
          case a: AttributeReference => Some(a)
          case _ => None
        }
        val keys = keyAttrs.flatten
        val aggAliases = aggExprs.collect {
          case al @ Alias(ae: AggregateExpression, _)
            if ae.filter.isEmpty && ae.deterministic => al
        }
        val keyRefs = aggExprs.collect { case a: AttributeReference => a }
        val allAccounted =
          keys.size == groupExprs.size &&
          aggAliases.size + keyRefs.size == aggExprs.size &&
          keyRefs.forall(k => keys.exists(_.exprId == k.exprId))
        if (allAccounted && ShareDetector.scanLeaves(lr).nonEmpty)
          Some(Shape(lr, ShareDetector.scanLeaves(lr).head._1,
            keys.map(_.name), cond, aggAliases))
        else None
      }
    case _ => None
  }

  /** Rewrite `e` onto `target` attributes (by name); None if any referenced
    * column is missing there. */
  private def remap(e: Expression, target: Map[String, Attribute]): Option[Expression] = {
    var ok = true
    val out = e.transformUp {
      case a: AttributeReference =>
        target.get(a.name) match {
          case Some(t) => t
          case None => ok = false; a
        }
    }
    if (ok) Some(out) else None
  }

  /** Build the merged Aggregate for a compatible group: keys ++ per-job
    * FILTERed aggregates ++ per-job presence counts, over the canonical
    * job's unfiltered relation. */
  def mergedPlan(spark: SparkSession, group: Seq[(String, Shape)]): DataFrame = {
    val canon = group.head._2
    val byName = canon.rel.output.map(a => a.name -> a).toMap
    val keys: Seq[Attribute] = canon.keyNames.map(byName)
    val aggCols: Seq[NamedExpression] = group.flatMap { case (job, sh) =>
      val cond = sh.cond.map(c => remap(c, byName).getOrElse(
        sys.error(s"unmappable filter in $job")))
      val perJob: Seq[NamedExpression] = sh.aggs.map { al =>
        val ae = remap(al.child, byName).get.asInstanceOf[AggregateExpression]
        val filtered = ae.copy(filter = (ae.filter, cond) match {
          case (Some(f), Some(c)) => Some(And(f, c))
          case (f, c) => f.orElse(c)
        })
        Alias(filtered, s"__agg_${job}_${al.name}")()
      }
      perJob :+ Alias(
        AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false,
          filter = cond, resultId = NamedExpression.newExprId),
        s"__n_$job")()
    }
    org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      Aggregate(keys, (keys: Seq[NamedExpression]) ++ aggCols, canon.rel))
  }

  /** Project one job's result back out of the merged meta-result, restoring
    * its original output schema (keys then aggregate aliases). */
  def split(merged: DataFrame, job: String, shape: Shape): DataFrame =
    merged
      .filter(col(s"__n_$job") > 0)
      .select(shape.keyNames.map(col) ++
        shape.aggs.map(al => col(s"__agg_${job}_${al.name}").as(al.name)): _*)

  /** Partition a window into mergeable groups (>= 2 jobs sharing relation
    * fingerprint + grouping keys) and the unmerged rest. */
  def detect(built: Seq[(String, DataFrame)])
      : (Seq[Seq[(String, Shape)]], Seq[String]) = {
    val shaped = built.map { case (name, df) =>
      name -> shapeOf(df.queryExecution.analyzed)
    }
    val groups = shaped.collect { case (n, Some(s)) => (n, s) }
      .groupBy { case (_, s) => (s.fp, s.keyNames) }
      .values.toSeq.filter(_.size >= 2)
    val mergedNames = groups.flatten.map(_._1).toSet
    (groups, shaped.collect { case (n, _) if !mergedNames.contains(n) => n })
  }
}
