package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, DeleteFromTable, LocalRelation, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.SnapshotStore

/** Deletion-vector read rewrite: a snapshot table whose live set carries
  * any merge-on-read deletion vector cannot be served by the bare
  * parquet-file-list delegate (the files still PHYSICALLY hold the
  * deleted rows). This analyzer rule swaps such a
  * [[DataSourceV2Relation]] for the DV-filtered logical plan
  * ([[SnapshotStore.snapshot]]: plain scan of dv-less files unioned with
  * an anti-join of dv'd files against their log-pointed position sets),
  * aliased back onto the relation's own attribute ids so everything
  * above resolves unchanged. Delta does this inside its FileFormat
  * reader; delegating to Spark's own [[org.apache.spark.sql.execution
  * .datasources.v2.parquet.ParquetTable]] means the filter must land in
  * the LOGICAL plan instead — same observable semantics, and Catalyst
  * still pushes filters/pruning into both branch scans.
  *
  * Tables WITHOUT deletion vectors never match — their reads keep the
  * existing delegate path (log-answered aggregates, runtime file
  * pruning) at zero cost. Sessions without the graft extensions cannot
  * hit wrong results either: the scan builders themselves refuse DV'd
  * tables loudly (SnapshotReadTable/SnapshotCatalogTable.newScanBuilder).
  *
  * Positional care: relations under DML and write commands are LEFT
  * ALONE — those verbs resolve the table handle themselves (MERGE's
  * rule extracts the path; AppendData writes through the commit
  * protocol) and rewriting their target would break them. Only the
  * QUERY side of a write and the SOURCE side of a MERGE are read
  * positions and rewrite like any other read.
  */
object RewriteDvReads extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewriteReads(plan)

  /** Rewrite every DV-carrying snapshot relation in READ position. */
  private[graft] def rewriteReads(plan: LogicalPlan): LogicalPlan = {
    val structural = plan match {
      // write commands: the target table handle stays; the query side is
      // a read position
      case w: V2WriteCommand => w.withNewQuery(rewriteReads(w.query))
      // DML targets stay (their own rules/capabilities consume them);
      // MERGE's source side is a read position
      case m: MergeIntoTable =>
        m.copy(sourceTable = rewriteReads(m.sourceTable))
      case u: UpdateTable => u
      case d: DeleteFromTable => d
      // unfiltered global count(*) straight over a dv'd relation: the
      // LOG already knows the answer (Σ visibleRows = rows − dv
      // cardinality per live file) — the dv twin of the dv-less path's
      // IndexAggScan, which this rewrite would otherwise forfeit by
      // replacing the relation before aggregate pushdown sees it.
      // count(col) stays a scan: dv positions carry no nullness.
      case agg @ Aggregate(Nil, exprs, child, _)
          if agg.resolved && exprs.forall(isCountStar) &&
            bareRelation(child).exists(dvTarget(_).isDefined) =>
        val (path, version) = dvTarget(bareRelation(child).get).get
        val n = SnapshotStore.state(SparkSession.active, path, Some(version))
          .live.map(_.visibleRows).sum
        LocalRelation(agg.output.map(_.toAttribute),
          Seq(InternalRow.fromSeq(exprs.map(_ => n))))
      case r: DataSourceV2Relation =>
        dvTarget(r).fold(r: LogicalPlan) { case (path, version) =>
          replaced(r, path, version)
        }
      case other => other.mapChildren(rewriteReads)
    }
    // subquery expressions hold whole plans — IN (SELECT ...) over a
    // DV'd table must filter too (THIS node's expressions only; child
    // plans were handled by the recursion above)
    structural.transformExpressions {
      case s: SubqueryExpression => s.withNewPlan(rewriteReads(s.plan))
    }
  }

  // transformExpressions on the returned node must not descend into
  // children (they are already rewritten) — QueryPlan.transformExpressions
  // operates on the node's own expressions only, which is exactly that.

  /** `count(*)`-shaped aggregate expression: a (possibly aliased)
    * non-distinct, non-filtered Count over literals. */
  private def isCountStar(e: NamedExpression): Boolean = {
    def countExpr(x: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = x match {
      case AggregateExpression(Count(children), Complete, false, None, _) =>
        children.forall(_.isInstanceOf[Literal])
      case _ => false
    }
    e match {
      case Alias(c, _) => countExpr(c)
      case other => countExpr(other)
    }
  }

  /** The relation under pure pass-through wrappers (subquery aliases,
    * attribute-only projects) — the shapes between `FROM t` and the
    * aggregate that cannot change the row count. */
  private def bareRelation(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation => Some(r)
    case SubqueryAlias(_, child) => bareRelation(child)
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      bareRelation(child)
    case _ => None
  }

  /** (table path, resolved version) when the relation reads a snapshot
    * table whose live set carries any deletion vector. */
  private def dvTarget(r: DataSourceV2Relation): Option[(String, Long)] =
    r.table match {
      case t: graft.sources.v2.SnapshotReadTable if t.hasDv =>
        Some((t.tablePath, t.resolvedVersion))
      case t: graft.sources.v2.SnapshotCatalogTable if t.hasDv =>
        Some((t.tablePath, t.resolvedVersion))
      case _ => None
    }

  /** The DV-filtered plan, projected onto the relation's attribute ids
    * (matched by name — snapshot schemas have unique column names). */
  private def replaced(r: DataSourceV2Relation, path: String,
                       version: Long): LogicalPlan = {
    val spark = SparkSession.active
    val child = SnapshotStore.snapshot(spark, path, Some(version))
      .queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    val out: Seq[NamedExpression] = r.output.map { a =>
      val c = child.output.find(o => resolver(o.name, a.name)).getOrElse(
        throw new IllegalStateException(
          s"graft DV rewrite: column ${a.name} missing from the snapshot " +
            s"read of $path@v$version"))
      Alias(c, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    Project(out, child)
  }
}
