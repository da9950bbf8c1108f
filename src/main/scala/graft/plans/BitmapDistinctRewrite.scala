package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Opt-in optimizer rule: rewrite an integer `COUNT(DISTINCT x)` aggregate
  * into the two-level bitmap shape
  *
  * {{{
  *   Aggregate(G, sum(bitmap_count(bm)) + max(min_flag))
  *     Aggregate(G ++ (sign, bitmap_bucket_number(mapped)),
  *               bitmap_construct_agg(bitmap_bit_position(mapped)) AS bm,
  *               max(x = Long.MinValue) AS min_flag)
  * }}}
  *
  * Spark's stock planning of distinct aggregates keeps per-key distinct
  * state through the shuffle; the bitmap form pre-aggregates map-side into
  * fixed-size 4 KiB bitmaps that merge associatively — at 100 TB the
  * difference between shuffling every distinct value and shuffling one
  * bitmap per (group, 32k-id bucket). Same contract q114 demonstrates by
  * hand; this rule makes the engine apply it to ordinary `COUNT(DISTINCT)`
  * SQL automatically.
  *
  * Spark's bitmap functions are defined on POSITIVE ids only (position is
  * (x-1) mod 32768, asserted non-negative at runtime), so the full long
  * range is first mapped through the sign-split bijection
  * `x >= 1 ? x : 1 - x` with the sign in the grouping key — exact for every
  * value except the two bottom ones (Long.MinValue and Long.MinValue+1,
  * whose images overflow ANSI long arithmetic), which are excluded by an
  * aggregate FILTER and counted once each via presence flags instead.
  * Nulls are skipped by both forms.
  *
  * Enabled per-session with `SET spark.graft.bitmapDistinct=true` (default
  * off). Deliberately narrow: fires only when every output of the aggregate
  * is a grouping key or THE single filter-free integral `COUNT(DISTINCT x)`
  * — anything else keeps Spark's plan. The rewrite preserves the original
  * output exprIds so downstream references bind unchanged.
  */
case class BitmapDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!session.conf.get("spark.graft.bitmapDistinct", "false").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        val groupAttrs = groupExprs.collect { case a: AttributeReference => a }
        val distincts = aggExprs.collect {
          case al @ Alias(AggregateExpression(Count(Seq(c)), _, true, None, _), _)
              if integral(c.dataType) => (al, c)
        }
        val passThrough = aggExprs.collect { case a: AttributeReference => a }
        val shapeOk =
          groupAttrs.size == groupExprs.size &&
          distincts.size == 1 &&
          passThrough.size + 1 == aggExprs.size &&
          passThrough.forall(p => groupAttrs.exists(_.exprId == p.exprId))
        if (!shapeOk) agg
        else {
          val (origAlias, col) = distincts.head
          val x = if (col.dataType == LongType) col else Cast(col, LongType)
          val one = Literal(1L)
          val isPos = GreaterThanOrEqual(x, one)
          // sign-split bijection into [1, 2^63): x>=1 keeps x, x<=0 maps to
          // 1-x. There are two more non-positives than positives, so the two
          // bottom values (MinValue, whose image is undefined, and
          // MinValue+1, whose image 2^63 overflows ANSI arithmetic) are
          // excluded from the bitmap by the FILTER below and counted by one
          // presence flag each; their mapped value is a harmless 1. For
          // narrower integral inputs (Byte/Short/Int) those two values are
          // unreachable, so the bijection alone is exact — no filter and no
          // presence flags carried through the shuffle.
          val narrow = col.dataType != LongType
          val isSpecial = LessThanOrEqual(x, Literal(Long.MinValue + 1))
          val mapped =
            if (narrow) If(isPos, x, Subtract(one, x))
            else If(isSpecial, one, If(isPos, x, Subtract(one, x)))
          // the bitmap_* scalar fns are RuntimeReplaceable and the optimizer's
          // ReplaceExpressions batch has already run — inline the replacements
          val bucket = BitmapBucketNumber(mapped).replacement
          val bm = Alias(
            AggregateExpression(
              BitmapConstructAgg(BitmapBitPosition(mapped).replacement),
              Complete, isDistinct = false,
              filter = if (narrow) None else Some(Not(isSpecial))),
            "graft_bm")()
          def presenceFlag(v: Long, name: String): Alias = Alias(
            AggregateExpression(
              Max(If(EqualTo(x, Literal(v)), one, Literal(0L))),
              Complete, isDistinct = false),
            name)()
          val flags =
            if (narrow) Seq.empty
            else Seq(presenceFlag(Long.MinValue, "graft_minflag"),
              presenceFlag(Long.MinValue + 1, "graft_min1flag"))
          val inner = Aggregate(
            groupExprs ++ Seq(isPos, bucket),
            (groupAttrs: Seq[NamedExpression]) ++
              Seq(Alias(isPos, "graft_sign")(), Alias(bucket, "graft_bkt")(), bm) ++
              flags,
            child)
          def outerMax(a: Attribute): Expression = Coalesce(Seq(
            AggregateExpression(Max(a), Complete, isDistinct = false),
            Literal(0L)))
          val bmSum: Expression = Coalesce(Seq(
            AggregateExpression(Sum(BitmapCount(bm.toAttribute).replacement),
              Complete, isDistinct = false),
            Literal(0L)))
          val total = Alias(
            flags.foldLeft(bmSum)((acc, f) => Add(acc, outerMax(f.toAttribute))),
            origAlias.name)(exprId = origAlias.exprId)
          val outerAggs: Seq[NamedExpression] = aggExprs.map {
            case a: AttributeReference => a
            case _ => total
          }
          Aggregate(groupExprs, outerAggs, inner)
        }
    }
}
