package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.Segments

/** Metadata-only aggregation: a global `count(*)` / `min` / `max` over an
  * unfiltered manifest-backed scan is answered from the manifest's per-file
  * row counts and column bounds — no file is opened. This is the reference's
  * InfoSegment fast path (segment metadata answers the aggregate without
  * touching packs, SURVEY.md §4.2) made native as an optimizer rule.
  *
  * Rewrites `Aggregate(Nil, [count(*)|min(c)|max(c)…], scan)` into a
  * one-row LocalRelation when EVERY aggregate is answerable:
  *   - count must be a plain count(non-null literal) — count(col) skips
  *     nulls, which metadata can't see, so it does not match;
  *   - min/max columns must be indexed in the manifest with an exactly
  *     string-round-trippable type (integral, float/double via Java's
  *     round-tripping toString, string, date, timestamp);
  *   - no filter, grouping, DISTINCT, or agg-filter anywhere.
  * Any other shape is left untouched. The manifest is the scan's source of
  * truth for file listing (listFiles intersects manifest ∩ disk), so the
  * rewrite returns exactly what the scan would have.
  *
  * Install per-session via `spark.experimental.extraOptimizations` or for
  * every session through GraftExtensions (spark.sql.extensions).
  */
case class ManifestAggregates(spark: SparkSession) extends Rule[LogicalPlan] {

  private object ManifestScan {
    def unapply(plan: LogicalPlan): Option[ManifestFileIndex] = plan match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case idx: ManifestFileIndex => Some(idx)
          case _ => None
        }
        case _ => None
      }
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
      case _ => None
    }
  }

  // TimestampType (TZ-aware) is deliberately absent: manifest stat strings
  // were rendered under the BUILD session's timezone, so casting them back
  // under a different current session timezone would yield silently shifted
  // min/max. Date and TimestampNTZ render timezone-independently and stay;
  // TZ timestamps fall back to the scan (which is always correct).
  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, ManifestScan(idx), _)
        if answerable(aggExprs, idx) =>
      val stats = idx.effectiveStats
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      def bound(c: AttributeReference, isMin: Boolean): Any = {
        val vals = stats
          .flatMap(fs => fs.stats.get(c.name).flatMap(b => if (isMin) b._1 else b._2))
          .map(s => Cast(Literal(UTF8String.fromString(s), StringType), c.dataType, tz)
            .eval(InternalRow.empty))
          .filter(_ != null)
        if (vals.isEmpty) null
        else {
          val ord = TypeUtils.getInterpretedOrdering(c.dataType)
          if (isMin) vals.min(ord) else vals.max(ord)
        }
      }
      val values = aggExprs.map { case Alias(ae: AggregateExpression, _) =>
        ae.aggregateFunction match {
          case _: Count => stats.map(_.rows).sum
          case Min(a: AttributeReference) => bound(a, isMin = true)
          case Max(a: AttributeReference) => bound(a, isMin = false)
        }
      }
      LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))
  }

  private def answerable(aggExprs: Seq[NamedExpression],
      idx: ManifestFileIndex): Boolean = {
    val indexed = idx.indexedColumns
    aggExprs.nonEmpty && aggExprs.forall {
      case Alias(ae: AggregateExpression, _)
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) => l.value != null
          case Min(a: AttributeReference) => supported(a.dataType) && indexed(a.name)
          case Max(a: AttributeReference) => supported(a.dataType) && indexed(a.name)
          case _ => false
        }
      case _ => false
    }
  }
}
