package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, DecimalDivideWithOverflowCheck, EqualTo, EvalMode, Expression, If, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** ClickHouse-projection-style materialized-view routing, Spark-first: a
  * pre-aggregated MV registered against a base table path, and a Catalyst
  * optimizer rule that TRANSPARENTLY rewrites a matching `Aggregate` over
  * the base scan into a re-aggregation of the MV — the query text never
  * changes, exactly how MergeTree projections / aggregate materialized
  * views are picked in ClickHouse's analyzer.
  *
  * Soundness: the MV stores decimal partial sums (the house Det.dsum
  * pattern) plus a per-group row count, both of which form a commutative
  * monoid — re-aggregating partials over any grouping SUBSET is exact,
  * never approximate. A query is routed only when
  *   - its grouping columns ⊆ the MV's grouping columns,
  *   - every aggregate is `sum(cast(col as decimal(30,6)))` over a column
  *     the MV covers, `count(1)`, `min(col)`/`max(col)` over a column the
  *     MV stores min/max partials for (idempotent monoids — subset
  *     re-aggregation exact), or `avg(cast(col as decimal(30,6)))`
  *     (rewritten to the routed sum/count through Average's OWN decimal
  *     divide tree, so the result is bit-identical) — no DISTINCT, no
  *     FILTER clause on any of them,
  *   - the aggregate sits on the base scan through at most column-pruning
  *     Projects and Filters whose predicates reference MV GROUPING columns
  *     only (`WHERE grouping_col = x GROUP BY …`, the most common real
  *     projection query — such a predicate filters whole groups, so it
  *     commutes with re-aggregation and is applied to the MV instead;
  *     a row-level predicate on any NON-grouping column still blocks,
  *     because it can't be answered post-aggregation).
  * Anything else falls through to the base table untouched.
  *
  * At 100 TB this is the difference between scanning the fact table and
  * scanning |groups| rows; the rewrite itself is O(plan) driver work.
  */
object MvRouting {

  /** @param basePath  base table path (as passed to spark.read.parquet)
    * @param mvPath    pre-aggregated MV parquet path
    * @param groupCols MV grouping columns (same names as base)
    * @param sumMap    base column → MV column holding
    *                  sum(cast(base as decimal(30,6))) per group
    * @param countCol  MV column holding count(*) per group
    * @param minMap    base column → MV column holding min(base) per group
    *                  (min-of-mins over any grouping subset is exact —
    *                  min is an idempotent commutative monoid)
    * @param maxMap    base column → MV column holding max(base) per group
    * @param sumLongMap base column (integral type) → MV column holding
    *                  sum(cast(base as bigint)) per group — routes the
    *                  PLAIN `sum(col)` spelling (Sum over byte/short/int/
    *                  long evaluates in LongType, an exact monoid, so
    *                  subset re-aggregation of bigint partials is
    *                  bit-identical; double columns never belong here)
    * @param notNullCols base columns the registration DECLARES non-null
    *                  (the NOT NULL DDL contract): `count(col)` over one
    *                  equals `count(*)` per group and routes to
    *                  sum(countCol); columns that may hold nulls must
    *                  never be declared or the routed count overcounts
    */
  case class MvDef(basePath: String, mvPath: String, groupCols: Set[String],
      sumMap: Map[String, String], countCol: String,
      minMap: Map[String, String] = Map.empty,
      maxMap: Map[String, String] = Map.empty,
      sumLongMap: Map[String, String] = Map.empty,
      notNullCols: Set[String] = Set.empty)

  private val registry = new PathRegistry[MvDef]

  def register(d: MvDef): Unit = registry.put(d.basePath, d)

  def forPath(p: String): Option[MvDef] = registry.forPath(p)

  /** Drop the registration for a base path (the [[Routing]] freshness
    * hub calls this from the mutation machinery): routed queries fall
    * through to the mutated base until the MV is rebuilt + re-registered.
    */
  def invalidate(basePath: String): Unit = registry.remove(basePath)

  /** Install the routing rule into a session at runtime (extraOptimizations
    * runs after the main optimizer batches; extensions-based injection is
    * static-conf-only and absent in driver sessions).
    */
  /** Per-session activation flag. The MV REGISTRY is JVM-global (like a
    * metastore) and the extensions-injected rule rides every session of
    * an extensions-configured JVM — without a session-scoped gate, one
    * stageMv call would arm transparent rewriting of the real base path
    * in EVERY session, making plan shapes run-order-dependent across
    * suites. Registration declares the MV; only enable() opts a session
    * into routing.
    */
  private[graft] val EnabledKey = "spark.graft.mv.routing.enabled"

  def enable(s: SparkSession): Unit = {
    s.conf.set(EnabledKey, "true")
    val cur = s.experimental.extraOptimizations
    if (!cur.contains(RouteAggregateToMv))
      s.experimental.extraOptimizations = cur :+ RouteAggregateToMv
  }

  /** Opt the session back out (the EnabledKey gate makes the installed
    * rule inert). Tests that enable routing on a SHARED session must
    * disable in a finally — the flag otherwise outlives the test and
    * makes every later suite's plan shapes run-order-dependent.
    */
  def disable(s: SparkSession): Unit = s.conf.set(EnabledKey, "false")
}

object RouteAggregateToMv extends Rule[LogicalPlan] {
  import MvRouting._

  /** The base scan under an Aggregate, peeling column-pruning Projects
    * and collecting Filter conditions on the way down; anything else
    * (Join, Window, non-attr Project, …) blocks routing. The collected
    * conditions are vetted by [[routableFilter]] — a filter is only
    * sound to route when it references MV GROUPING columns exclusively
    * (it then filters whole groups identically on base and MV; a
    * row-level predicate can't be answered post-aggregation).
    */
  private def baseScan(p: LogicalPlan)
      : Option[(Seq[Expression], HadoopFsRelation)] = p match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => Some((Nil, fs))
      case _ => None
    }
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      baseScan(child)
    case Filter(cond, child) =>
      baseScan(child).map { case (conds, fs) => (cond +: conds, fs) }
    case _ => None
  }

  /** A filter condition is routable iff it is deterministic, contains
    * no subquery (a PlanExpression's INTERNAL attributes could collide
    * by name with MV grouping columns and be remapped wrongly), and
    * every attribute it references is an MV grouping column.
    */
  private def routableFilter(cond: Expression, mv: MvDef): Boolean =
    cond.deterministic &&
      !cond.exists(_.isInstanceOf[PlanExpression[_]]) &&
      cond.references.forall(a => mv.groupCols(a.name))

  /** The Det.dsum shape: cast(col as decimal(30,6)) summed. */
  private def dsumSource(e: Expression): Option[String] = e match {
    case c: Cast if c.dataType == DecimalType(30, 6) => c.child match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // session opt-in gate (MvRouting.EnabledKey): the statically
    // injected copy of this rule is present in every session of an
    // extensions-configured JVM, but must stay inert until THIS
    // session called MvRouting.enable
    if (conf.getConfString(MvRouting.EnabledKey, "false") != "true")
      return plan
    applyRouting(plan)
  }

  private def applyRouting(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // EXACTLY one root path, and it is the registered base: a multi-root
    // scan (read.parquet(base, other)) only partially overlaps the MV —
    // re-targeting it would silently drop the other roots' rows
    // mvPath must still EXIST: the JVM-global registry can briefly point
    // at a root that Scratch.versionedRoot's supersession GC already
    // deleted (testdata swap re-fingerprints the root before stageMv
    // re-registers). Routing then would crash the query at the rewritten
    // scan; falling through to the base table is merely unrouted and
    // always correct. One driver-side stat per candidate rewrite.
    case agg: Aggregate
        if baseScan(agg.child).exists { case (conds, fs) =>
          fs.location.rootPaths.length == 1 &&
            forPath(fs.location.rootPaths.head.toString)
              .exists(d => PathRegistry.targetExists(d.mvPath) &&
                conds.forall(routableFilter(_, d))) } =>
      val (conds, fs) = baseScan(agg.child).get
      val mv = forPath(fs.location.rootPaths.head.toString).get
      rewrite(agg, agg.groupingExpressions, agg.aggregateExpressions,
          conds, mv)
        .getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], filterConds: Seq[Expression],
      mv: MvDef): Option[Aggregate] = {
    val groupNames = groupExprs.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (!groupNames.forall(mv.groupCols)) return None

    // fresh resolved MV scan; exprIds are new, output aliases keep the
    // ORIGINAL exprIds so parent operators still resolve
    val mvPlan = SparkSession.active.read.parquet(mv.mvPath)
      .queryExecution.analyzed
    val mvAttr: Map[String, AttributeReference] =
      mvPlan.output.map(a => a.name -> a.asInstanceOf[AttributeReference]).toMap

    def rewriteAggFn(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      def bareAttr(e: Expression): Option[String] = e match {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      ae.aggregateFunction match {
        case s: Sum =>
          dsumSource(s.child).flatMap(mv.sumMap.get)
            .flatMap(mvAttr.get)
            .map(a => ae.copy(aggregateFunction = s.copy(child = a)))
            .orElse {
              // PLAIN sum over an integral base column (the r11 verdict
              // gap: a user's bare `sum(bigint_col)` full-scanned the
              // fact table). Sum over byte/short/int/long evaluates in
              // LongType — exactly the MV's bigint partial type — so
              // the routed Sum(partial) keeps the original result type
              // and exact-monoid re-aggregation is bit-identical. The
              // partial attr's type is CHECKED, not assumed: a
              // mis-registered decimal partial would silently widen the
              // result type and break parent resolution.
              s.child match {
                case a: AttributeReference
                    if Seq(ByteType, ShortType, IntegerType, LongType)
                      .contains(a.dataType) =>
                  mv.sumLongMap.get(a.name).flatMap(mvAttr.get)
                    .filter(_.dataType == LongType)
                    .map(p => ae.copy(aggregateFunction = s.copy(child = p)))
                case _ => None
              }
            }
        // min-of-mins / max-of-maxes over a grouping subset is exact
        // (idempotent commutative monoid), and the MV stores the base
        // column's NATIVE type, so the rewritten Min/Max's result type
        // is identical to the original's — parent exprIds keep resolving
        case m: Min =>
          bareAttr(m.child).flatMap(mv.minMap.get).flatMap(mvAttr.get)
            .map(a => ae.copy(aggregateFunction = Min(a)))
        case m: Max =>
          bareAttr(m.child).flatMap(mv.maxMap.get).flatMap(mvAttr.get)
            .map(a => ae.copy(aggregateFunction = Max(a)))
        // NON-NULL arguments only: count(x) skips rows where ANY child
        // is null, so it equals the group row count exactly when every
        // child is provably non-null — a non-null literal, or a base
        // column the registration DECLARED not-null (the NOT NULL DDL
        // contract; nullable columns never route because the MV stores
        // no per-column non-null counts). And only under a GROUP BY: a
        // grouping-less count over an empty base is 0 unrouted but NULL
        // routed (Sum over the empty MV).
        case c: Count
            if groupExprs.nonEmpty && c.children.forall {
              case Literal(v, _) => v != null
              case a: AttributeReference => mv.notNullCols(a.name)
              case _ => false
            } =>
          mvAttr.get(mv.countCol)
            .map(a => ae.copy(aggregateFunction = Sum(a)))
        // avg over the dsum shape routes as the sum/count ratio — but
        // REPLICATING Average's own evaluation tree bit-for-bit (Spark
        // 4.1 Average.evaluateExpression for DecimalType is
        // If(count=0, null, DecimalDivideWithOverflowCheck(sum,
        // count.cast(LongDecimal), resultType, ctx, !ansi)) — the
        // quotient is produced directly at the result scale, HALF_UP).
        // The routed Sum of MV partials equals the base sum exactly
        // (decimal addition is associative-exact) and Sum(n_rows)
        // equals the base count, so feeding the SAME divide expression
        // the same operand values yields a bit-identical average. A
        // plain Divide would round at a different intermediate scale.
        case av: Average =>
          for {
            base <- dsumSource(av.child)
            sumCol <- mv.sumMap.get(base)
            sumAttr <- mvAttr.get(sumCol)
            cntAttr <- mvAttr.get(mv.countCol)
            resType <- av.dataType match {
              case d: DecimalType => Some(d)
              case _ => None
            }
          } yield {
            val sumAgg =
              AggregateExpression(Sum(sumAttr), ae.mode, isDistinct = false)
            // ONE count instance shared by the zero-guard and the divide
            // (same resultId → one physical buffer)
            val cntAgg =
              AggregateExpression(Sum(cntAttr), ae.mode, isDistinct = false)
            If(EqualTo(cntAgg, Literal(0L)), Literal(null, resType),
              DecimalDivideWithOverflowCheck(sumAgg,
                Cast(cntAgg, DecimalType(20, 0)), resType, null,
                nullOnOverflow = av.evalMode != EvalMode.ANSI))
          }
        case _ => None
      }
    }

    // explicit recursion, NOT transformUp/Down: an AggregateExpression is
    // rewritten as a whole (its internal base attributes disappear with
    // it), a bare attribute is only legal if it is a grouping column, and
    // any shape we can't prove equivalent aborts the whole rewrite
    def rw(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAggFn(ae)
      case a: AttributeReference =>
        if (mv.groupCols(a.name)) mvAttr.get(a.name) else None
      case other =>
        val kids = other.children.map(rw)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    val newAggExprs = aggExprs.map {
      case a: AttributeReference if mv.groupCols(a.name) && mvAttr.contains(a.name) =>
        Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
      case al: Alias =>
        rw(al.child).map(c => Alias(c, al.name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None

    // grouping-column filters route as a pre-aggregation filter on the
    // MV: p references only grouping columns (vetted by routableFilter),
    // so σ_p commutes with the re-aggregation — γ_G(σ_p(base)) =
    // γ_G(σ_p(MV partials)). Remap base attrs to the fresh MV attrs;
    // an unmappable attribute (MV parquet missing the column) aborts.
    val newChild: LogicalPlan =
      if (filterConds.isEmpty) mvPlan
      else {
        val remapped = filterConds.map { c =>
          var ok = true
          val r = c.transform {
            case a: AttributeReference =>
              mvAttr.get(a.name) match {
                case Some(ma) => ma
                case None => ok = false; a
              }
          }
          if (ok) Some(r) else None
        }
        if (remapped.exists(_.isEmpty)) return None
        Filter(remapped.map(_.get)
          .reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)),
          mvPlan)
      }

    val newGroup = groupNames.map(mvAttr)
    Some(agg.copy(groupingExpressions = newGroup,
      aggregateExpressions = newAggExprs.map(_.get), child = newChild))
  }
}
