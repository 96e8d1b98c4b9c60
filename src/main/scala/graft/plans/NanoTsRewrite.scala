package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Folds literal comparisons over the engine's epoch-nano normalization back
  * to native timestamp predicates, restoring parquet pushdown.
  *
  * [[graft.storage.Tables.normalizeTs]] projects an external `timestamp[us]`
  * column to the engine's epoch-nano LongType as `unix_micros(ts) * 1000`.
  * Any literal time filter a query stacks on top — the `[since, until)`
  * range operator, the limit-aware block prefilter's threshold, equality
  * accuracy expansion — then reads `unix_micros(ts#n) * 1000 >= L` at the
  * scan after predicate pushdown, which parquet cannot use: no
  * `PushedFilters`, no row-group pruning, full-table decode. At 100 TB that
  * turns the reference's "scan one day" (`block_list` time pruning,
  * SURVEY §2 rows 2/4) into "scan a decade".
  *
  * This rule rewrites, inside `Filter` conditions only (null → false is
  * indistinguishable there, so dropping an always-false equality branch is
  * safe):
  *
  *   `unix_micros(ts) * 1000  cmp  Literal(L: Long)`   →   `ts cmp' lit(µs)`
  *
  * with the bound divided by 1000 in the direction that preserves integer
  * semantics exactly (x·1000 ≥ v ⟺ x ≥ ⌈v/1000⌉, x·1000 > v ⟺ x ≥
  * ⌊v/1000⌋+1, duals for and <, ≤; equality only when 1000 | v). The
  * inner expression may be a bare `TimestampType` column or a
  * UTC-zoned cast of a `TIMESTAMP_NTZ` one — both carry µs-since-epoch
  * internally, so the rewritten literal is `Literal(q, innerType)`. Casts
  * zoned to anything but UTC are left alone (the engine pins the session
  * to UTC via `Tables.configure`, but a foreign plan might not).
  *
  * Registered two ways, matching [[graft.GraftExtensions]]' function story:
  * `injectOptimizerRule` for sessions built with the extension, and
  * `spark.experimental.extraOptimizations` (idempotent, via [[install]])
  * for sessions that weren't — `Tables.configure` calls [[install]] on
  * every read path, so any session reading engine tables gets the rewrite.
  */
object NanoTsRewrite extends Rule[LogicalPlan] {

  /** Idempotently register with a session built without the extension. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  private def isUtc(tz: Option[String]): Boolean =
    tz.exists(id => java.time.ZoneId.of(id).normalized() == java.time.ZoneOffset.UTC)

  /** The µs-carrying expression inside `unix_micros(e) * 1000`, if the
    * whole expression is exactly that shape. */
  private def microSource(e: Expression): Option[Expression] = e match {
    case Multiply(UnixMicros(inner), Literal(1000L, LongType), _) =>
      inner match {
        case t if t.dataType == TimestampType => Some(t)
        case c @ Cast(t, TimestampType, tz, _)
            if t.dataType == TimestampNTZType && isUtc(c.timeZoneId.orElse(tz)) =>
          Some(t)
        case _ => None
      }
    case _ => None
  }

  private def floorQ(v: Long): Long = Math.floorDiv(v, 1000L)
  private def ceilQ(v: Long): Long =
    Math.floorDiv(v, 1000L) + (if (Math.floorMod(v, 1000L) == 0L) 0L else 1L)

  private def tsLit(t: Expression, micros: Long): Literal =
    Literal(micros, t.dataType) // Timestamp{,NTZ}Type store Long µs

  /** Rewrite one comparison if it matches the shape; None otherwise. */
  private def rewriteCmp(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(l, Literal(v: Long, LongType)) =>
      microSource(l).map(t => GreaterThanOrEqual(t, tsLit(t, ceilQ(v))))
    case GreaterThan(l, Literal(v: Long, LongType)) =>
      microSource(l).map(t => GreaterThanOrEqual(t, tsLit(t, floorQ(v) + 1)))
    case LessThanOrEqual(l, Literal(v: Long, LongType)) =>
      microSource(l).map(t => LessThanOrEqual(t, tsLit(t, floorQ(v))))
    case LessThan(l, Literal(v: Long, LongType)) =>
      microSource(l).map(t => LessThan(t, tsLit(t, ceilQ(v))))
    case EqualTo(l, Literal(v: Long, LongType))
        if Math.floorMod(v, 1000L) == 0L =>
      microSource(l).map(t => EqualTo(t, tsLit(t, floorQ(v))))
    // literal-on-left mirrors: v cmp x·1000 ⟺ x·1000 cmp' v with cmp flipped
    case GreaterThanOrEqual(Literal(v: Long, LongType), r) => // v ≥ x ⟺ x ≤ v
      microSource(r).map(t => LessThanOrEqual(t, tsLit(t, floorQ(v))))
    case GreaterThan(Literal(v: Long, LongType), r) =>
      microSource(r).map(t => LessThan(t, tsLit(t, ceilQ(v))))
    case LessThanOrEqual(Literal(v: Long, LongType), r) =>
      microSource(r).map(t => GreaterThanOrEqual(t, tsLit(t, ceilQ(v))))
    case LessThan(Literal(v: Long, LongType), r) =>
      microSource(r).map(t => GreaterThanOrEqual(t, tsLit(t, floorQ(v) + 1)))
    case EqualTo(Literal(v: Long, LongType), r)
        if Math.floorMod(v, 1000L) == 0L =>
      microSource(r).map(t => EqualTo(t, tsLit(t, floorQ(v))))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transformUp {
        case cmp: BinaryComparison => rewriteCmp(cmp).getOrElse(cmp)
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
