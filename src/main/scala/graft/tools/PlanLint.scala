package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan LINT — the 100 TB plan-review checklist as code. Every
  * rule here is a scale failure mode this engine designs against; the
  * lint makes the review mechanical for user-written compositions:
  *
  *  - `single-partition-window` (error): a window with no PARTITION BY
  *    moves every row to one task — the classic silent scale killer.
  *    Exempt when the window's input is bounded by a plan-constant
  *    LIMIT (or ≤1-row aggregate): one task over k rows is the seed-rank
  *    / top-N-re-rank shape, not a corpus funnel.
  *  - `cartesian` (error): CartesianProduct / BroadcastNestedLoopJoin —
  *    usually a missing join condition.
  *  - `scala-udf` (warn): opaque to codegen AND to pushdown/pruning.
  *  - `missed-pushdown` (warn): a Filter directly above a parquet scan
  *    with NO pushed filters — the predicate shape defeated the source
  *    (e.g. a cast or UDF around the column).
  *  - `codegen-fallback` (info): interpreted expressions; fine for
  *    heavy kernels (this library's fused md5/geometry expressions are
  *    deliberate fallbacks — dispatch is not their cost), a smell in
  *    arithmetic-heavy projections.
  *  - `serial-source-planning` (warn) / `unaudited-source-planning`
  *    (info): a custom DSv2 scan whose `planInputPartitions` performs
  *    per-file I/O SERIALLY on the driver stalls a 100k-file lake
  *    before the first task launches (the bag source's pre-pool
  *    shape); graft scans certify via
  *    [[graft.sources.v2.PlanningAudit]], and a graft scan with no
  *    audit is flagged so a new source can't regress silently.
  *  - `exchange` (info): shuffle count — the number to watch as data
  *    grows.
  *
  * Works on executed AND adaptive plans (query stages included).
  */
object PlanLint extends AdaptiveSparkPlanHelper {

  final case class Finding(severity: String, kind: String, detail: String)

  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    val nodes = collectWithSubqueries(plan) { case p => p }
    lintNodes(nodes)
  }

  /** Conservatively: can this subtree emit more than one row? A global
    * aggregate (no grouping expressions) emits exactly one; projections,
    * filters, limits ≤ 1, and exchange/codegen wrappers preserve the
    * bound. Anything unrecognized counts as many-rowed.
    */
  /** A no-grouping aggregate bounds rows GLOBALLY only in Final /
    * Complete mode — a Partial one emits one row per PARTITION, so
    * treating it as ≤1-row would wrongly exempt a window (or bless a
    * broadcast) fed O(partitions) rows. Function-less aggregates carry
    * no mode; there the required AllTuples child distribution is what
    * separates the global (single-partition) stage from the partial.
    */
  private def globallyBoundedAgg(
      a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final}
    a.groupingExpressions.isEmpty && (
      if (a.aggregateExpressions.nonEmpty)
        a.aggregateExpressions.forall(ae => ae.mode == Final || ae.mode == Complete)
      else a.requiredChildDistribution
        .contains(org.apache.spark.sql.catalyst.plans.physical.AllTuples))
  }

  private def maxOneRow(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      globallyBoundedAgg(a)
    case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => maxOneRow(e.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => maxOneRow(r.child)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => maxOneRow(q.plan)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => maxOneRow(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => maxOneRow(i.child)
    case c: org.apache.spark.sql.execution.ColumnarToRowExec => maxOneRow(c.child)
    case pr: org.apache.spark.sql.execution.ProjectExec => maxOneRow(pr.child)
    case f: FilterExec => maxOneRow(f.child)
    case g: org.apache.spark.sql.execution.GlobalLimitExec =>
      g.limit <= 1 || maxOneRow(g.child)
    case _ => false
  }

  /** True when the subtree's row count is bounded by a plan-constant
    * LIMIT (or a ≤1-row aggregate): a partition-less window above it
    * runs its one task over a constant number of rows — the k-row seed
    * rank, a top-N re-rank — not the corpus, so it is not the
    * single-task scale killer the window rule hunts.
    */
  private def limitBounded(p: SparkPlan): Boolean = p match {
    // GLOBAL bounds only: a bare LocalLimit caps rows per PARTITION, so
    // O(partitions · k) could still funnel into the one window task —
    // the global operator above it (GlobalLimit / TakeOrdered) is what
    // makes the bound plan-constant. Same mode rule for aggregates:
    // a Partial no-grouping agg is one row per partition, not one row.
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      globallyBoundedAgg(a)
    case s: org.apache.spark.sql.execution.SortExec => limitBounded(s.child)
    case e: ShuffleExchangeExec => limitBounded(e.child)
    case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      limitBounded(e.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      limitBounded(r.child)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      limitBounded(q.plan)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => limitBounded(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => limitBounded(i.child)
    case c: org.apache.spark.sql.execution.ColumnarToRowExec => limitBounded(c.child)
    case pr: org.apache.spark.sql.execution.ProjectExec => limitBounded(pr.child)
    case f: FilterExec => limitBounded(f.child)
    case _ => false
  }

  /** Skip the row-format adapters between an operator and its scan. */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case c: org.apache.spark.sql.execution.ColumnarToRowExec => unwrap(c.child)
    case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec => unwrap(w.child)
    case other => other
  }

  private def lintNodes(nodes: Seq[SparkPlan]): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]

    nodes.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w.child) =>
        findings += Finding("error", "single-partition-window",
          s"window [${w.windowExpression.map(_.sql).mkString(", ")}] has no PARTITION BY — " +
            "all rows move to ONE task")
      // a conditionless join against a provably ≤1-row side is the
      // attach-the-corpus-statistics pattern (crossJoin(broadcast(agg)))
      // — row multiplication is impossible, so it is not a scale error
      case c: CartesianProductExec
          if !maxOneRow(c.left) && !maxOneRow(c.right) =>
        findings += Finding("error", "cartesian",
          "CartesianProduct — usually a missing join condition")
      case j: BroadcastNestedLoopJoinExec
          if !maxOneRow(j.left) && !maxOneRow(j.right) =>
        findings += Finding("error", "cartesian",
          s"BroadcastNestedLoopJoin (${j.joinType}) — non-equi or conditionless join")
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        findings ++= auditScan(b.scan)
      case f: FilterExec => unwrap(f.child) match {
        // IsNotNull rides along for free; pushdown only HELPS when a
        // comparison reaches the source, so IsNotNull-only counts as
        // defeated (the common cast-around-the-column shape pushes
        // IsNotNull and nothing else)
        case scan: FileSourceScanExec if {
          val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
            .stripPrefix("[").stripSuffix("]").split(",").map(_.trim).filter(_.nonEmpty)
          pushed.forall(_.startsWith("IsNotNull"))
        } =>
          findings += Finding("warn", "missed-pushdown",
            s"Filter [${f.condition.sql.take(120)}] sits on a parquet scan with no " +
              "effective pushed filters — the predicate shape defeats the source " +
              "(cast/UDF around the column?)")
        case _ =>
      }
      case _ =>
    }

    val exchanges = nodes.collect { case e: ShuffleExchangeExec => e }
    if (exchanges.nonEmpty) {
      findings += Finding("info", "exchange",
        s"${exchanges.size} shuffle exchange(s): " +
          exchanges.map(_.outputPartitioning.toString.take(60)).mkString("; "))
    }

    val udfs = nodes.flatMap(_.expressions.flatMap(_.collect { case u: ScalaUDF => u }))
    udfs.foreach { u =>
      findings += Finding("warn", "scala-udf",
        s"ScalaUDF ${u.udfName.getOrElse("<anon>")} — invisible to codegen, pushdown, and pruning")
    }

    val fallbacks = nodes.flatMap(_.expressions.flatMap(_.collect {
      case e: CodegenFallback if e.getClass.getName.startsWith("graft") => e
    })).map(_.prettyName).distinct
    if (fallbacks.nonEmpty) {
      findings += Finding("info", "codegen-fallback",
        s"interpreted kernels in plan: ${fallbacks.mkString(", ")} (deliberate for " +
          "md5/geometry-heavy kernels; a smell in light arithmetic)")
    }

    findings.result()
  }

  /** Audit one DSv2 scan's PLANNING shape (unit-testable; the plan walk
    * applies it to every BatchScanExec). Third-party scans are not
    * judged — only graft's own, which all carry the audit contract.
    */
  def auditScan(scan: org.apache.spark.sql.connector.read.Scan): Option[Finding] =
    scan match {
      case a: graft.sources.v2.PlanningAudit =>
        if (a.planningDoesPerFileIO && !a.planningParallel)
          Some(Finding("warn", "serial-source-planning",
            s"${scan.getClass.getSimpleName}: planInputPartitions does per-file " +
              "I/O serially on the driver — a 100k-file lake serializes 100k " +
              "round trips before the first task; pool or distribute it " +
              "(see BagScan.planMany)"))
        else None
      case _ if scan.getClass.getName.startsWith("graft") =>
        Some(Finding("info", "unaudited-source-planning",
          s"${scan.getClass.getSimpleName} declares no PlanningAudit — if its " +
            "planInputPartitions does per-file I/O, pool or distribute it and " +
            "certify via PlanningAudit"))
      case _ => None
    }

  /** Human-readable report, worst first; "clean" when nothing fired. */
  def report(df: DataFrame): String = {
    val sevRank = Map("error" -> 0, "warn" -> 1, "info" -> 2)
    val fs = lint(df).sortBy(f => sevRank(f.severity))
    if (fs.isEmpty) "plan lint: clean"
    else fs.map(f => s"[${f.severity}] ${f.kind}: ${f.detail}").mkString("\n")
  }
}
