package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.graftbridge.GraftShim
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, count, lit, max, sum}
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.SnapshotStore

/** SQL `MERGE INTO` over [[graft.sources.SnapshotStore]] tables — the
  * third row-level SQL verb next to the catalog's INSERT and DELETE,
  * and the SQL surface of the reference's per-scene `put_item` upsert
  * loop (detect_scenes.py:167 — DynamoDB's put-or-replace IS
  * matched-update / not-matched-insert):
  *
  * {{{
  *   MERGE INTO graft.`/path/t` t USING updates s
  *   ON t.doc_id = s.doc_id
  *   WHEN MATCHED [AND cond] THEN UPDATE SET n = s.n | DELETE
  *   WHEN NOT MATCHED [AND cond] THEN INSERT (doc_id, n) VALUES (...)
  *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE ... | DELETE
  * }}}
  *
  * Spark's analyzer fully resolves and column-aligns [[MergeIntoTable]]
  * regardless of the target's DSv2 write capabilities; this rule then
  * replaces the node with a runnable command BEFORE the built-in
  * row-level rewrite would reject the table — the same interception
  * point Delta uses for its MERGE (an analyzer rule swapping in a
  * custom command), chosen over DSv2 `SupportsRowLevelOperations`
  * because the copy-on-write machinery (touched-file pruning, staged
  * files, put-if-absent commit, conflict re-validation) already exists
  * in [[SnapshotStore]] and a group-based DSv2 rewrite would force a
  * second executor-side parquet write path for zero new semantics.
  *
  * Execution is [[SnapshotStore.upsert]]'s shape generalized:
  *
  *  1. TOUCHED-FILE PRUNE: the first `target.k = <source expr>`
  *     equi-conjunct of ON drives the same log-stats broadcast range
  *     join as upsert — only files whose harvested [min,max] can hold a
  *     source key are read or rewritten. No equi key (or a
  *     NOT MATCHED BY SOURCE clause, which must see every unmatched
  *     target row) widens to the full live set, Delta's behavior too.
  *  2. ONE full-outer join of the touched rows with the source on the
  *     complete ON condition classifies every row (matched /
  *     target-only / source-only); a single CASE picks the FIRST
  *     applicable action clause per row (SQL's first-match rule),
  *     deletes drop via one filter, and per-column CASEs apply the
  *     analyzer-aligned assignments. Inserts ride the same pass —
  *     pruning makes them complete: a source key whose box matches no
  *     touched file matches nothing in the table.
  *  3. The rewrite stages invisibly and ONE commit (`op = merge`) swaps
  *     it for the touched files, `mustBeLive`-re-validated — a racing
  *     writer on a touched file fails the merge loudly.
  *
  * Multiple source rows matching one target row: one inner-join probe
  * on (file, row_index) counts matches per target row on the ON
  * condition ALONE. More than one copy APPLYING a matched clause is
  * the ANSI cardinality violation — rejected, as Delta does. Legal
  * multi-matches (at most one copy applies) are collapsed back to one
  * row per target row with a window before the delete filter, so the
  * applied clause wins and non-applying copies never duplicate the
  * target row. Matched-insert (`WHEN NOT MATCHED BY TARGET`)
  * and schema evolution are not supported; both fail loudly.
  *
  * Assignments may target NESTED struct fields (`SET a.b.c = v`) — the
  * reference's per-scene correction shape (detect_scenes.py:162-171)
  * against typed extraction stores, whose schema is one nullable
  * struct per topic (Containers.scala `typedExtractTo`). The column
  * rebuilds via [[UpdateFields]] so sibling fields carry over and a
  * NULL struct stays NULL; overlapping keys in one clause are refused.
  */
object RewriteSnapshotMerge extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // gate on resolved only, NOT m.aligned: Spark's assignment aligner
    // skips tables without DSv2 row-level-operation support, so aligned
    // stays false here for update clauses — execute() aligns by column
    // name and casts values itself (assigned()/castTo)
    case m: MergeIntoTable if m.resolved
        && snapshotTarget(m.targetTable).isDefined =>
      val (path, asOf) = snapshotTarget(m.targetTable).get
      if (asOf.isDefined) throw new UnsupportedOperationException(
        "graft MERGE: cannot merge into a VERSION/TIMESTAMP AS OF read")
      // WITH SCHEMA EVOLUTION needs no special handling HERE: Spark's
      // analyzer already applied the source's new columns through the
      // catalog's ALTER TABLE (a metadata-only schema commit) and
      // reloaded the target relation, so targetOutput below is the
      // evolved schema and old files null-fill through the recorded-
      // schema read
      // the source is captured into a LEAF command (no later analyzer
      // rule sees inside), so DV-carrying snapshot reads in it must be
      // rewritten NOW — RewriteSnapshotMerge runs before RewriteDvReads
      // in the resolution batch and would otherwise swallow them raw
      MergeSnapshotCommand(path, RewriteDvReads.rewriteReads(m.sourceTable),
        unwrap(m.targetTable).output,
        m.mergeCondition, m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions)

    // SQL UPDATE — the fourth DML verb (INSERT/DELETE/MERGE/UPDATE all
    // land in the same copy-on-write commit protocol). Same interception
    // point and rationale as MERGE above.
    case u: UpdateTable if u.resolved
        && snapshotTarget(u.table).isDefined =>
      val (path, asOf) = snapshotTarget(u.table).get
      if (asOf.isDefined) throw new UnsupportedOperationException(
        "graft UPDATE: cannot update a VERSION/TIMESTAMP AS OF read")
      UpdateSnapshotCommand(path, unwrap(u.table).output,
        u.assignments, u.condition)
  }

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => unwrap(child)
    case other => other
  }

  private def snapshotTarget(target: LogicalPlan): Option[(String, Option[Long])] =
    unwrap(target) match {
      case r: DataSourceV2Relation => r.table match {
        case t: graft.sources.v2.SnapshotCatalogTable =>
          Some((t.tablePath, t.timeTravel))
        case _ => None
      }
      case _ => None
    }
}

/** The executable MERGE: holds the RESOLVED source plan, target
  * attributes, condition, and aligned actions (leaf command — nothing
  * inside is re-analyzed). All heavy lifting in [[SnapshotMerge]].
  */
case class MergeSnapshotCommand(path: String, source: LogicalPlan,
                                targetOutput: Seq[Attribute],
                                cond: Expression,
                                matched: Seq[MergeAction],
                                notMatched: Seq[MergeAction],
                                notMatchedBySource: Seq[MergeAction])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotMerge.execute(spark, path, source, targetOutput, cond,
      matched, notMatched, notMatchedBySource)
    Seq.empty
  }
}

/** The executable UPDATE: copy-on-write single-table rewrite. */
case class UpdateSnapshotCommand(path: String,
                                 targetOutput: Seq[Attribute],
                                 assignments: Seq[Assignment],
                                 condition: Option[Expression])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotMerge.executeUpdate(spark, path, targetOutput, assignments, condition)
    Seq.empty
  }
}

object SnapshotMerge {
  private val Keep = -1 // no clause applied: target row carries over
  private val Drop = -2 // source-only row with no insert clause

  /** SQL UPDATE over a snapshot table: [[SnapshotStore.delete]]'s
    * touched-file shape with assignments instead of removal — ONE scan
    * with the predicate pushed down finds the files holding matching
    * rows (parquet footer stats skip clean files at the scan layer),
    * untouched files survive BY PATH, touched files rewrite with a
    * per-column `CASE WHEN cond THEN value ELSE old END`, and one
    * commit (`op = update`, `mustBeLive`-re-validated) swaps them.
    * A NULL condition keeps the row (SQL UPDATE semantics); the
    * condition must be deterministic (it evaluates in two scans — the
    * same rule delete enforces).
    */
  def executeUpdate(spark: SparkSession, path: String,
                    targetOutput: Seq[Attribute],
                    assignments: Seq[Assignment],
                    condition: Option[Expression]): Long = {
    import org.apache.spark.sql.functions.col
    requireNoReservedCols(targetOutput, "target", "UPDATE")
    validateAssignmentKeys(assignments, "UPDATE", spark)
    val snap = SnapshotStore.state(spark, path)
    if (snap.live.isEmpty) return snap.version
    // DV-aware tagged read: __file is the FILE NAME (staged names are
    // uuid-fresh, so names key live entries — same identity delete()
    // uses) and rows a deletion vector hides never reach the rewrite
    val all = SnapshotStore.readFilesTagged(spark, snap.meta, snap.live)
    val withFp = all.withColumnRenamed("__file", "__fp")
      .withColumnRenamed("__pos", "__ri")
    val plan0 = withFp.queryExecution.analyzed
    def rw(e: Expression): Expression = substitute(e, targetOutput, plan0.output)
    val cond2 = condition.map(rw).getOrElse(Literal(true))
    require(cond2.deterministic,
      s"update condition must be deterministic (it evaluates in two scans): $condition")
    require(assignments.map(_.value).forall(a => rw(a).deterministic),
      "update assignments must be deterministic (they evaluate per touched file)")

    // ---- merge-on-read UPDATE: with the dv property set, mask the
    // matched positions behind a deletion vector and append the updated
    // rows — ONE commit, O(matched rows) written instead of a rewrite
    // of every touched file (Delta's DV-backed UPDATE)
    if (snap.meta.get(SnapshotStore.DvProperty).contains("true")) {
      val matchedPlan = Filter(cond2, plan0)
      val idOut: Seq[NamedExpression] = Seq(
        Alias(plan0.output.find(_.name == "__fp").get, "__file")(),
        Alias(plan0.output.find(_.name == "__ri").get, "__pos")())
      val masked = GraftShim.ofRows(spark, Project(idOut, matchedPlan))
      val updatedCols: Seq[NamedExpression] = targetOutput.map { orig =>
        val attr = pairAttr(plan0.output, orig).get
        assignedValue(assignments, orig, attr, rw, spark) match {
          case Some(v) => Alias(castTo(v, orig.dataType, spark), orig.name)()
          case None => Alias(attr, orig.name)()
        }
      }
      val updated = GraftShim.ofRows(spark, Project(updatedCols, matchedPlan))
      val staged = SnapshotStore.stageRewrite(updated, path,
        SnapshotStore.statedCols(snap.live))
      return SnapshotStore.commitDvRepoint(spark, path, snap, masked,
        extraAdds = staged, op = "update_dv")
    }

    val touched = GraftShim.ofRows(spark,
        Project(plan0.output.filter(_.name == "__fp"), Filter(cond2, plan0)))
      .distinct().collect().map(_.getString(0))
      .map(p => new org.apache.hadoop.fs.Path(p))
    val touchedPaths = snap.live.map(_.path).filter(p =>
      touched.exists(t => t.getName == new org.apache.hadoop.fs.Path(p).getName))
    if (touchedPaths.isEmpty) return snap.version
    val tgt = SnapshotStore.readFiles(spark, path, touchedPaths)
    val tgtPlan = tgt.queryExecution.analyzed
    def rwT(e: Expression): Expression = substitute(e, targetOutput, tgtPlan.output)
    val condT = condition.map(rwT).getOrElse(Literal(true))
    val outCols: Seq[NamedExpression] = targetOutput.map { orig =>
      val attr = pairAttr(tgtPlan.output, orig).get
      assignedValue(assignments, orig, attr, rwT, spark) match {
        case Some(v) =>
          Alias(castTo(CaseWhen(Seq((condT, v)), Some(attr)), orig.dataType, spark),
            orig.name)()
        case None => Alias(attr, orig.name)()
      }
    }
    val rewrite = GraftShim.ofRows(spark, Project(outCols, tgtPlan))
    SnapshotStore.commitRewrite(spark, path, rewrite,
      removes = touchedPaths, op = "update",
      statsCols = SnapshotStore.statedCols(snap.live),
      expectDv = snap.live.filter(a => touchedPaths.contains(a.path))
        .map(a => a.path -> a.dv).toMap)
  }

  /** See [[RewriteSnapshotMerge]] for the plan shape. Returns the
    * committed version (current version when the merge is a no-op).
    */
  def execute(spark: SparkSession, path: String, source: LogicalPlan,
              targetOutput: Seq[Attribute], cond: Expression,
              matched: Seq[MergeAction], notMatched: Seq[MergeAction],
              notMatchedBySource: Seq[MergeAction]): Long = {
    // the source plan evaluates in up to three passes (touched-file
    // prune, cardinality probe, rewrite join); a non-deterministic
    // source could prune files inconsistently with the join or classify
    // rows differently between probe and rewrite — refuse loudly, the
    // same contract UPDATE/DELETE/replaceWhere enforce on their
    // conditions. Checked at BOTH levels: expression determinism
    // (rand() and friends) and plan shape (TABLESAMPLE, LIMIT without
    // an underlying ORDER BY — their expressions are all deterministic
    // literals, yet the rows they pick can differ between passes).
    // Delta materializes the source instead; staging to a table (or a
    // collected/parallelized DataFrame) is the documented workaround —
    // NOT a cached temp view: cache substitution happens at physical
    // planning, after this guard, so the analyzed plan is unchanged.
    require(source.find(p =>
        p.expressions.exists(!_.deterministic) || unsortedLimitOrSample(p)).isEmpty,
      "graft MERGE: the source plan must be deterministic — it evaluates " +
        "in multiple passes (file prune, cardinality probe, rewrite); " +
        "stage a non-deterministic source (rand(), LIMIT without ORDER " +
        "BY, TABLESAMPLE) to a table first")
    requireNoReservedCols(targetOutput, "target", "MERGE")
    requireNoReservedCols(source.output, "source", "MERGE")
    matched.foreach {
      case u: UpdateAction => validateAssignmentKeys(u.assignments, "MERGE", spark)
      case _: DeleteAction => ()
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported WHEN MATCHED action: $other")
    }
    notMatched.foreach {
      case i: InsertAction => requireTopLevelKeys(i.assignments, "MERGE")
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported WHEN NOT MATCHED action: $other")
    }
    notMatchedBySource.foreach {
      case u: UpdateAction => validateAssignmentKeys(u.assignments, "MERGE", spark)
      case _: DeleteAction => ()
      case other => throw new UnsupportedOperationException(
        s"graft MERGE: unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }

    val snap = SnapshotStore.state(spark, path)
    val tgtIds = AttributeSet(targetOutput)

    // ---- touched-file prune (upsert's broadcast range join) ----------
    val equi: Option[(AttributeReference, Expression)] =
      splitConjuncts(cond).collectFirst {
        case EqualTo(l: AttributeReference, r)
            if tgtIds.contains(l) && r.references.forall(!tgtIds.contains(_)) &&
              r.references.nonEmpty => (l, r)
        case EqualTo(l, r: AttributeReference)
            if tgtIds.contains(r) && l.references.forall(!tgtIds.contains(_)) &&
              l.references.nonEmpty => (r, l)
      }
    val touched: Seq[String] =
      if (notMatchedBySource.nonEmpty) snap.live.map(_.path) // must see EVERY unmatched target row
      else equi match {
        case Some((tAttr, sExpr)) if snap.live.exists(_.stats.contains(tAttr.name)) =>
          val keys = GraftShim.ofRows(spark, Project(
            Seq(Alias(Cast(sExpr, LongType), "__k")()), source))
          SnapshotStore.touchedByLongKey(spark, snap.live, keys, tAttr.name)
        case _ => snap.live.map(_.path)
      }
    val statsCols = (equi.map(_._1.name).toSeq ++
      SnapshotStore.statedCols(snap.live)).distinct

    // ---- insert-only fast paths --------------------------------------
    if (touched.isEmpty || (matched.isEmpty && notMatchedBySource.isEmpty)) {
      if (notMatched.isEmpty) return snap.version // nothing can change
      val unmatchedSrc: LogicalPlan =
        if (touched.isEmpty) source // no file can hold a matching key
        else {
          val tgtPlan = readTouched(spark, path, touched).queryExecution.analyzed
          Join(source, tgtPlan, LeftAnti,
            Some(substitute(cond, targetOutput, tgtPlan.output)), JoinHint.NONE)
        }
      val inserts = insertProjection(spark, unmatchedSrc, targetOutput, notMatched)
      if (inserts.isEmpty) return snap.version
      return SnapshotStore.commitRewrite(spark, path, inserts,
        removes = Nil, op = "merge", statsCols = statsCols,
        // the anti-join read the touched files' CURRENT visible rows; a
        // racing merge-on-read delete would invalidate that read-set
        expectDv = snap.live.filter(a => touched.contains(a.path))
          .map(a => a.path -> a.dv).toMap)
    }

    // ---- general path: one full-outer classify-and-rewrite -----------
    // row identity (file, row_index) for the cardinality check; markers
    // tell matched from one-sided rows after the outer join. The tagged
    // read applies deletion vectors, so MoR-deleted rows neither match
    // nor carry over.
    val touchedSet = touched.toSet
    val touchedFiles = snap.live.filter(a => touchedSet.contains(a.path))
    val tgtW = SnapshotStore.readFilesTagged(spark, snap.meta, touchedFiles)
      .withColumnRenamed("__file", "__fp")
      .withColumnRenamed("__pos", "__ri")
    val tgtPlan0 = tgtW.queryExecution.analyzed
    val tMark = Alias(Literal(true), "__t")()
    val sMark = Alias(Literal(true), "__s")()
    val tgtPlan = Project(tgtPlan0.output :+ tMark, tgtPlan0)
    val srcPlan = Project(source.output :+ sMark, source)
    def rw(e: Expression): Expression =
      substitute(e, targetOutput, tgtPlan0.output)
    val cond2 = rw(cond)

    // ---- cardinality probe, on the ON condition ALONE ----------------
    // ONE inner join counts source matches per target row. Two outcomes
    // matter: >1 copies where a matched clause APPLIES is the ANSI
    // cardinality violation (rejected, as Delta does); >1 copies where
    // at most one applies is LEGAL, but the full-outer join below emits
    // one row per copy — the non-applying copies would each fall to the
    // Keep branch and write the target row twice. Those rows must
    // collapse back to one (the dedup window below), so the probe also
    // reports whether any legal multi-match exists. Probing on
    // anyMatched alone (the pre-round-12 shape) missed exactly that
    // duplication — and missed NMBS-only merges entirely.
    val anyMatched: Expression =
      if (matched.isEmpty) Literal(false)
      else matched.map(a => rw(a.condition.getOrElse(Literal(true))))
        .reduce(Or(_, _))
    val probeJoin = Join(tgtPlan0, srcPlan, Inner, Some(cond2), JoinHint.NONE)
    val idAttrs = tgtPlan0.output.filter(a => a.name == "__fp" || a.name == "__ri")
    val modAlias = Alias(If(anyMatched, Literal(1L), Literal(0L)), "__mod")()
    val probeRow = GraftShim.ofRows(spark,
        Project(idAttrs :+ modAlias, probeJoin))
      .groupBy(col("__fp"), col("__ri"))
      .agg(count(lit(1)).as("__c"), sum(col("__mod")).as("__m"))
      .filter(col("__c") > 1)
      .agg(count(lit(1)), max(col("__m")))
      .head()
    val multiMatchedRows = probeRow.getLong(0)
    val maxModifying = if (probeRow.isNullAt(1)) 0L else probeRow.getLong(1)
    if (maxModifying > 1) throw new UnsupportedOperationException(
      "graft MERGE: multiple source rows matched (and attempted to " +
        "modify) the same target row — deduplicate the source on the " +
        "ON keys first (ANSI MERGE cardinality violation)")

    val joined = Join(tgtPlan, srcPlan, FullOuter, Some(cond2), JoinHint.NONE)
    val isT = EqualNullSafe(tMark.toAttribute, Literal(true))
    val isS = EqualNullSafe(sMark.toAttribute, Literal(true))
    def actCond(a: MergeAction): Expression = rw(a.condition.getOrElse(Literal(true)))

    // first applicable clause per row, SQL's first-match rule; encoded
    // as matched 0.., not-matched-by-source 100.., insert 200..
    val actExpr = CaseWhen(
      matched.zipWithIndex.map { case (a, i) =>
        (And(And(isT, isS), actCond(a)), Literal(i)) } ++
      notMatchedBySource.zipWithIndex.map { case (a, i) =>
        (And(And(isT, Not(isS)), actCond(a)), Literal(100 + i)) } ++
      Seq((isT, Literal(Keep))) ++
      notMatched.zipWithIndex.map { case (a, j) =>
        (And(And(Not(isT), isS), actCond(a)), Literal(200 + j)) },
      Some(Literal(Drop)))
    val actAlias = Alias(actExpr, "__act")()
    val withAct = Project(joined.output :+ actAlias, joined)
    val act = actAlias.toAttribute

    // legal multi-matches (probe-verified: at most ONE copy applies a
    // clause) collapse to a single row per target row BEFORE the delete
    // filter, so an applied DELETE wins over its non-applying siblings
    // instead of leaving a Keep copy behind. Ordering `__act` DESC puts
    // the applied clause (>= 0) ahead of Keep (-1); surviving Keep
    // copies are byte-identical in every output column (the Keep branch
    // reads only target attributes), so the tie-break is immaterial.
    // Source-only rows get a unique partition key — the window never
    // concentrates a large insert wave onto one reducer. Skipped
    // entirely (zero extra exchange) when the probe saw no multi-match.
    val deduped: LogicalPlan =
      if (multiMatchedRows == 0) withAct
      else {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions.{lit, monotonically_increasing_id, row_number, when}
        GraftShim.ofRows(spark, withAct)
          .withColumn("__part", when(col("__t") <=> lit(true), lit(0L))
            .otherwise(monotonically_increasing_id()))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("__fp"), col("__ri"), col("__part"))
              .orderBy(col("__act").desc)))
          .filter(col("__rn") === 1)
          .queryExecution.analyzed
      }

    val deleteIdx =
      matched.zipWithIndex.collect { case (_: DeleteAction, i) => i } ++
      notMatchedBySource.zipWithIndex.collect { case (_: DeleteAction, i) => 100 + i }
    val keep = And(Not(EqualTo(act, Literal(Drop))),
      deleteIdx.foldLeft[Expression](Literal(true)) { (acc, i) =>
        And(acc, Not(EqualTo(act, Literal(i)))) })
    val filtered = Filter(keep, deduped)

    val tgtByOrig = targetOutput.map(o =>
      o.exprId -> tgtPlan0.output.find(_.name.equalsIgnoreCase(o.name)).getOrElse(
        throw new IllegalStateException(s"graft MERGE: target column ${o.name} " +
          "missing from the touched-file read"))).toMap
    val outCols: Seq[NamedExpression] = targetOutput.map { orig =>
      val tgtAttr = tgtByOrig(orig.exprId)
      val branches =
        matched.zipWithIndex.collect { case (u: UpdateAction, i) =>
          (EqualTo(act, Literal(i)),
            assignedValue(u.assignments, orig, tgtAttr, rw, spark).getOrElse(tgtAttr)) } ++
        notMatchedBySource.zipWithIndex.collect { case (u: UpdateAction, i) =>
          (EqualTo(act, Literal(100 + i)),
            assignedValue(u.assignments, orig, tgtAttr, rw, spark).getOrElse(tgtAttr)) } ++
        notMatched.zipWithIndex.collect { case (ins: InsertAction, j) =>
          (EqualTo(act, Literal(200 + j)),
            assigned(ins.assignments, orig, rw, spark).getOrElse(Literal(null, orig.dataType))) }
      Alias(castTo(CaseWhen(branches, Some(tgtAttr)), orig.dataType, spark), orig.name)()
    }
    // ---- merge-on-read MERGE: with the dv property set, target rows an
    // UPDATE/DELETE clause applied (act in [0,199]) mask behind a
    // deletion vector; replacement rows (updates) and inserts land as
    // fresh files in the SAME commit. Keep rows stay IN PLACE — the
    // whole win: a merge touching 1% of a file's rows writes 1%, not
    // the file (Delta's DV-backed MERGE). The classify/dedup plan is
    // identical to the copy-on-write path; only the commit tail differs.
    if (snap.meta.get(SnapshotStore.DvProperty).contains("true")) {
      val dedupOut = deduped.output
      def attrOf(n: String) = dedupOut.find(_.name == n).get
      val modified = Filter(And(
        GreaterThanOrEqual(act, Literal(0)), LessThan(act, Literal(200))), deduped)
      val masked = GraftShim.ofRows(spark, Project(Seq(
        Alias(attrOf("__fp"), "__file")(),
        Alias(attrOf("__ri"), "__pos")()), modified))
      val applies = And(GreaterThanOrEqual(act, Literal(0)),
        deleteIdx.foldLeft[Expression](Literal(true)) { (acc, i) =>
          And(acc, Not(EqualTo(act, Literal(i)))) })
      val newRows = GraftShim.ofRows(spark,
        Project(outCols, Filter(applies, deduped)))
      val staged = SnapshotStore.stageRewrite(newRows, path, statsCols)
      return SnapshotStore.commitDvRepoint(spark, path, snap, masked,
        extraAdds = staged, op = "merge_dv")
    }

    val rewrite = GraftShim.ofRows(spark, Project(outCols, filtered))

    SnapshotStore.commitRewrite(spark, path, rewrite,
      removes = touched, op = "merge", statsCols = statsCols,
      expectDv = touchedFiles.map(a => a.path -> a.dv).toMap)
  }

  // -------------------------------------------------------------- helpers

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Rewrite references to the ORIGINAL target relation into the fresh
    * touched-file read's attributes (matched by column name — snapshot
    * schemas have unique names). Source references pass through: the
    * source plan is reused as-is, exprIds intact.
    */
  private def substitute(e: Expression, origTarget: Seq[Attribute],
                         fresh: Seq[Attribute]): Expression = {
    val sub: Map[ExprId, Attribute] = origTarget.flatMap(o =>
      pairAttr(fresh, o).map(o.exprId -> _)).toMap
    e.transform { case a: AttributeReference => sub.getOrElse(a.exprId, a) }
  }

  /** Pair a target column with the same column of a FRESH read of the
    * same table: exact name first, case-insensitive as fallback. Both
    * attribute sets come from one recorded schema, so the exact match
    * always exists in practice — the fallback only covers legacy plans;
    * a single lowercase map would COLLIDE two columns differing only in
    * case under `spark.sql.caseSensitive=true` (both origs silently
    * rebinding to one fresh attribute). */
  private def pairAttr(fresh: Seq[Attribute], orig: Attribute): Option[Attribute] =
    fresh.find(_.name == orig.name)
      .orElse(fresh.find(_.name.equalsIgnoreCase(orig.name)))

  private def readTouched(spark: SparkSession, path: String,
                          touched: Seq[String]): DataFrame =
    SnapshotStore.readFiles(spark, path, touched)

  /** The aligned assignment value for target column `orig`, rewritten;
    * None when the clause leaves the column unassigned. Top-level keys
    * only — the INSERT path, where SQL column lists cannot nest. */
  private def assigned(assignments: Seq[Assignment], orig: Attribute,
                       rw: Expression => Expression,
                       spark: SparkSession): Option[Expression] =
    assignments.collectFirst {
      case Assignment(k: AttributeReference, v)
          if k.exprId == orig.exprId ||
            // session case rule, like assignedValue: equalsIgnoreCase
            // would mis-route an INSERT value onto a sibling column
            // differing only in case under caseSensitive=true
            spark.sessionState.analyzer.resolver(k.name, orig.name) => rw(v)
    }

  /** The full new value for target column `orig` under a clause's
    * assignments, or None when the clause leaves the column untouched.
    * A whole-column assignment (`SET a = v`) is the value cast to the
    * column type. Nested-field assignments (`SET a.b.c = v`) rebuild
    * the struct around `base` (the column's CURRENT value in the
    * rewrite plan) with [[UpdateFields]]/[[WithField]] — the expression
    * `Column.withField` builds, replaced by the optimizer with a plain
    * struct reconstruction, so sibling fields carry over untouched and
    * a NULL struct stays NULL (the typed-extraction-store shape: one
    * nullable struct per topic — rows of other topics are unaffected).
    * [[validateAssignmentKeys]] has already rejected overlapping paths,
    * so the per-root grouping here is unambiguous.
    */
  private def assignedValue(assignments: Seq[Assignment], orig: Attribute,
                            base: Expression, rw: Expression => Expression,
                            spark: SparkSession): Option[Expression] = {
    val mine: Seq[(Seq[PathSeg], Expression)] = assignments.flatMap { asg =>
      keyPath(asg.key) match {
        case Some((root, path))
            if root.exprId == orig.exprId ||
              spark.sessionState.analyzer.resolver(root.name, orig.name) =>
          Some((path, rw(asg.value)))
        case _ => None
      }
    }
    if (mine.isEmpty) None
    else mine.collectFirst { case (Seq(), v) => v } match {
      case Some(whole) => Some(castTo(whole, orig.dataType, spark))
      case None => Some(rebuildStruct(base, orig.dataType, mine, spark))
    }
  }

  /** Struct reconstruction for nested assignments: group the remaining
    * paths by head field, recurse per branch, and emit ONE UpdateFields
    * per level so sibling assignments under the same struct coalesce
    * into a single rebuild. Field names resolve with the session's
    * resolver (honoring `spark.sql.caseSensitive`). */
  private def rebuildStruct(base: Expression, dt: org.apache.spark.sql.types.DataType,
                            assigns: Seq[(Seq[PathSeg], Expression)],
                            spark: SparkSession): Expression = dt match {
    // ARRAY-BROADCAST assignment (`SET dets.score = v` where dets is
    // array<struct>): the resolved key extracted the field across EVERY
    // element (GetArrayStructFields), so the rebuild maps a per-element
    // struct reconstruction over the array — `transform(dets, x ->
    // x with score = v)` — siblings carry over per element, a NULL
    // array stays NULL (ArrayTransform is null-propagating), and the
    // assigned value is broadcast to every element (it cannot reference
    // the element — SQL has no syntax to bind one).
    case org.apache.spark.sql.types.ArrayType(et: StructType, containsNull) =>
      assigns.foreach { case (p, _) =>
        if (!p.headOption.exists(_.overArray))
          throw new UnsupportedOperationException(
            s"graft: nested assignment into array type must address an " +
              s"element field (got path ${p.map(_.name).mkString(".")})")
      }
      val elem = NamedLambdaVariable("__graft_elem", et, containsNull)
      val idx = NamedLambdaVariable("__graft_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false)
      // a SCALAR value broadcasts to every element; an ARRAY value (when
      // the addressed field is itself non-array) assigns ELEMENT-WISE by
      // position — which is also the only form MERGE can express, since
      // Spark's merge resolution coerces the value to the key's
      // extracted type array<f> (write `array_repeat(v, size(dets))` for
      // a merge-side broadcast). A short value array null-fills the tail.
      var positional = false
      val adjusted = assigns.map { case (p, v) =>
        val consumed = p.head.copy(overArray = false) +: p.tail
        (leafType(et, consumed), v.dataType) match {
          case (lt, _: org.apache.spark.sql.types.ArrayType)
              if !lt.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
            positional = true
            (consumed, GetArrayItem(v, idx, failOnError = false))
          case _ => (consumed, v)
        }
      }
      val inner = rebuildStruct(elem, et, adjusted, spark)
      ArrayTransform(base,
        LambdaFunction(inner, if (positional) Seq(elem, idx) else Seq(elem)))
    case st: StructType =>
      val resolver = spark.sessionState.analyzer.resolver
      val heads = assigns.map(_._1.head.name)
        .foldLeft(Seq.empty[String])((acc, h) =>
          if (acc.exists(resolver(_, h))) acc else acc :+ h)
      val ops: Seq[StructFieldsOperation] = heads.map { h =>
        val idx = st.fields.indexWhere(f => resolver(f.name, h))
        if (idx < 0) throw new IllegalStateException(
          s"graft: assignment key field $h missing from struct $st")
        val field = st.fields(idx)
        val sub = assigns.filter(a => resolver(a._1.head.name, h))
          .map { case (p, v) => (p.tail, v) }
        val value = sub.collectFirst { case (Seq(), v) => v } match {
          case Some(leaf) => castTo(leaf, field.dataType, spark)
          case None => rebuildStruct(
            GetStructField(base, idx, Some(field.name)), field.dataType, sub, spark)
        }
        WithField(field.name, value)
      }
      UpdateFields(base, ops)
    case other => throw new UnsupportedOperationException(
      s"graft: nested assignment into non-struct type $other")
  }

  /** One hop of an assignment-key path: a struct field name, flagged
    * when the hop was extracted ACROSS an array (`arr.f` on an
    * array<struct> column — the per-element broadcast form). */
  private case class PathSeg(name: String, overArray: Boolean)

  /** The type an assignment path terminates at, walking structs and
    * array elements from `dt` — decides whether an array-typed value
    * means element-wise assignment or a whole-field write. */
  private def leafType(dt: org.apache.spark.sql.types.DataType,
                       path: Seq[PathSeg]): org.apache.spark.sql.types.DataType =
    path match {
      case Seq() => dt
      case h +: t => dt match {
        case st: StructType =>
          val idx = st.fields.indexWhere(_.name.equalsIgnoreCase(h.name))
          if (idx < 0) throw new IllegalStateException(
            s"graft: assignment key field ${h.name} missing from struct $st")
          leafType(st.fields(idx).dataType, t)
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          leafType(et, h +: t)
        case other => throw new UnsupportedOperationException(
          s"graft: nested assignment into non-struct type $other")
      }
    }

  /** Parse an assignment key into (root column, nested field path).
    * Struct-field chains and array-element field extractions are legal;
    * None for anything else (map key / positional element assignment —
    * SQL cannot express a position in an assignment key anyway). */
  private def keyPath(e: Expression): Option[(AttributeReference, Seq[PathSeg])] =
    e match {
      case a: AttributeReference => Some((a, Nil))
      case g: GetStructField =>
        keyPath(g.child).map { case (a, p) =>
          (a, p :+ PathSeg(g.extractFieldName, overArray = false)) }
      case g: GetArrayStructFields =>
        keyPath(g.child).map { case (a, p) =>
          (a, p :+ PathSeg(g.field.name, overArray = true)) }
      case _ => None
    }

  /** UPDATE / MERGE-update assignment keys: top-level columns and
    * nested struct-field paths are both legal, but within one clause no
    * key may be a prefix of (or equal to) another on the same root
    * column — `SET a = ..., a.b = ...` (or `a.b` twice) is ambiguous:
    * which write wins depends on evaluation order. Refuse loudly, as
    * Delta does. */
  private def validateAssignmentKeys(assignments: Seq[Assignment],
                                     verb: String, spark: SparkSession): Unit = {
    // normalize with the SAME case rule rebuildStruct resolves under
    // (spark.sql.caseSensitive): unconditional lowercasing would falsely
    // refuse legal sibling assignments `a.B` / `a.b` on a case-sensitive
    // session
    val norm: String => String =
      if (spark.sessionState.conf.caseSensitiveAnalysis) identity
      else _.toLowerCase
    val paths: Seq[Seq[String]] = assignments.map { asg =>
      keyPath(asg.key) match {
        // overlap is a NAME property — an array-hop segment conflicts
        // with the same dotted path however it traverses (`dets` vs
        // `dets.score` is ambiguous whether dets is struct or array)
        case Some((root, path)) => (root.name +: path.map(_.name)).map(norm)
        case None => throw new UnsupportedOperationException(
          s"graft $verb: unsupported assignment key ${asg.key} — only " +
            "column and nested struct-field keys are supported")
      }
    }
    for (i <- paths.indices; j <- paths.indices if i != j) {
      val (a, b) = (paths(i), paths(j))
      if (a.length <= b.length && b.take(a.length) == a)
        throw new UnsupportedOperationException(
          s"graft $verb: conflicting assignments — key " +
            s"${a.mkString(".")} overlaps ${b.mkString(".")}; assign " +
            "each field (or its enclosing struct) at most once per clause")
    }
  }

  /** Only TOP-LEVEL column assignment keys are supported for INSERT —
    * SQL insert column lists cannot nest; anything else here is an
    * aligner artifact worth failing loudly on. */
  private def requireTopLevelKeys(assignments: Seq[Assignment],
                                  verb: String): Unit =
    assignments.foreach(_.key match {
      case _: AttributeReference => ()
      case other => throw new UnsupportedOperationException(
        s"graft $verb: only top-level column assignments are supported " +
          s"in INSERT (got key $other)")
    })

  /** Working columns the rewrite adds to the join ((file,row) identity,
    * side markers, action code, dedup window keys, probe counters, the
    * prune key). A user column with one of these names would silently
    * shadow or duplicate them — `withColumn` REPLACES same-name columns
    * and the by-name probes would group on the wrong attribute — so
    * both schemas are validated up front, one check for all seven+. */
  private val ReservedCols = Set("__fp", "__ri", "__t", "__s", "__act",
    "__part", "__rn", "__mod", "__k", "__c", "__m",
    // the DV-aware tagged read's identity columns (SnapshotStore
    // .readFilesTagged) — renamed to __fp/__ri here, but present on the
    // frame between read and rename
    "__file", "__pos")

  private def requireNoReservedCols(attrs: Seq[Attribute], side: String,
                                    verb: String): Unit = {
    val bad = attrs.map(_.name).filter(n => ReservedCols.contains(n.toLowerCase))
    if (bad.nonEmpty) throw new UnsupportedOperationException(
      s"graft $verb: $side columns ${bad.mkString(", ")} collide with the " +
        s"rewrite's reserved working columns (${ReservedCols.toSeq.sorted.mkString(", ")}) " +
        "— rename them first")
  }

  /** Plan shapes whose row membership is non-deterministic even though
    * every expression in them is: TABLESAMPLE, and LIMIT with no
    * ordering underneath (Project/LocalLimit wrappers looked through).
    */
  private[graft] def unsortedLimitOrSample(p: LogicalPlan): Boolean = {
    def sortedBelow(c: LogicalPlan): Boolean = c match {
      // only a GLOBAL sort pins row membership under a limit — SORT BY
      // (sortWithinPartitions, global=false) orders within partitions
      // while the limit's pick across partitions stays scheduling-
      // dependent
      case s: Sort => s.global
      case l: LocalLimit => sortedBelow(l.child)
      case pr: Project => sortedBelow(pr.child)
      // a deterministic `(SELECT ... ORDER BY k) LIMIT n` subquery keeps
      // its Sort under the alias at analysis time — look through it like
      // Project, or the guard falsely rejects the sorted form
      case sa: SubqueryAlias => sortedBelow(sa.child)
      case _ => false
    }
    p match {
      case _: Sample => true
      case g: GlobalLimit => !sortedBelow(g.child)
      case l: LocalLimit => !sortedBelow(l.child)
      case _ => false
    }
  }

  private def castTo(e: Expression, dt: org.apache.spark.sql.types.DataType,
                     spark: SparkSession): Expression =
    if (e.dataType == dt) e
    else Cast(e, dt, Option(spark.sessionState.conf.sessionLocalTimeZone))

  /** Source-only rows through the insert-clause cascade, projected to
    * the target schema (unassigned columns null-fill). */
  private def insertProjection(spark: SparkSession, unmatchedSrc: LogicalPlan,
                               targetOutput: Seq[Attribute],
                               notMatched: Seq[MergeAction]): DataFrame = {
    val actExpr = CaseWhen(
      notMatched.zipWithIndex.map { case (a, j) =>
        (a.condition.getOrElse(Literal(true)), Literal(200 + j)) },
      Some(Literal(Drop)))
    val actAlias = Alias(actExpr, "__act")()
    val withAct = Project(unmatchedSrc.output :+ actAlias, unmatchedSrc)
    val act = actAlias.toAttribute
    val filtered = Filter(Not(EqualTo(act, Literal(Drop))), withAct)
    val outCols: Seq[NamedExpression] = targetOutput.map { orig =>
      val branches = notMatched.zipWithIndex.collect { case (ins: InsertAction, j) =>
        (EqualTo(act, Literal(200 + j)),
          assigned(ins.assignments, orig, identity, spark).getOrElse(Literal(null, orig.dataType)))
      }
      Alias(castTo(CaseWhen(branches, Some(Literal(null, orig.dataType))), orig.dataType, spark),
        orig.name)()
    }
    GraftShim.ofRows(spark, Project(outCols, filtered))
  }
}
