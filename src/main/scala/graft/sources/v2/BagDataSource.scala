package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{BagCodec, BagPlanner}

/** DataSourceV2 reader for REAL ROS bag v2.0 files with CHUNK-LEVEL
  * parallelism — the scale path past `binaryFile`'s one-task-per-file
  * shape and 2 GiB single-file ceiling:
  *
  * {{{
  *   spark.read.format("graft.sources.v2.BagDataSource")
  *     .load("/data/runs")      // a directory of .bag files
  * }}}
  *
  * Planning reads each bag's INDEX section only (bag header →
  * `index_pos` → connection + chunk-info records — the `rosbag info`
  * walk, O(index) not O(data)); every chunk record becomes one
  * InputPartition, so a single 10 GiB bag with rosbag's ~768 KiB
  * chunks fans out to ~13k parallel units. Index-less bags (crashed
  * writers) degrade to a header-skip walk and top-level spans — still
  * read, just planned by scanning record headers. Executors seek
  * straight to their chunk, inflate it (none/bz2), and emit rows;
  * column pruning and topic equality/IN predicates push into the
  * reader exactly like [[ContainerDataSource]] (a foreign-topic
  * message is dropped before any row is built). Schema matches the
  * container source: (bag_file, topic, ts_us, payload).
  */
class BagDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BagDataSource.typedOf(options.get("path"),
        Option(options.get("topic")), options.getBoolean("typed", false))
      .map { case (_, defn) => BagDataSource.typedSchema(defn) }
      .getOrElse(ContainerDataSource.fullSchema)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BagTable(properties.get("path"),
      BagDataSource.typedOf(properties.get("path"),
        Option(properties.get("topic")),
        "true".equalsIgnoreCase(properties.get("typed"))))
}

object BagDataSource {
  /** Typed-mode schema: provenance + event time, then the definition's
    * flattened dotted fields (bagpy's columns) — what the SCAN emits,
    * so Catalyst's column pruning reaches the field decoder itself.
    */
  def typedSchema(definition: String): StructType = {
    val flat = graft.plans.RosMsg.flatSchema(
      graft.plans.RosMsg.parseCached(definition))
    StructType(
      StructField("bag_file", StringType) +:
      StructField("ts_us", LongType) +: flat.fields.toSeq)
  }

  private val defCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  // observability (spec-asserted): schema inferences that had to WALK
  // bag files because no fresh manifest entry answered the topic
  private[graft] val schemaWalks = new java.util.concurrent.atomic.AtomicInteger()

  /** Resolve `.option("typed","true").option("topic", t)` to the topic's
    * embedded message_definition — driver-side schema inference (one
    * O(index) read of the first bag carrying the topic; memoized per
    * (path, topic) so inferSchema and getTable pay it once).
    */
  def typedOf(path: String, topic: Option[String],
              typed: Boolean): Option[(String, String)] = {
    if (!typed) None
    else {
      val t = topic.getOrElse(throw new IllegalArgumentException(
        "graft-bag typed mode requires .option(\"topic\", ...) — the schema " +
          "is per-topic (bagpy's message_by_topic contract)"))
      val d = defCache.computeIfAbsent((path, t), { case (pth, tp) =>
        val conf = SparkSession.active.sessionState.newHadoopConf()
        val statuses = BagScan.listFileStatuses(pth, conf)
        // a FRESH manifest entry (length+mtime match) answers schema
        // inference without opening any bag; stale/absent → direct walk
        val manifest = graft.sources.BagManifest.entries(pth, conf)
        val fromManifest = statuses.iterator.flatMap { case (f, len, mtime) =>
          manifest.get(f).filter(e => e.len == len && e.mtime == mtime)
            .flatMap(_.plan.connInfo.values.find(ci =>
              ci.topic == tp && ci.messageDefinition.nonEmpty))
            .map(_.messageDefinition)
        }.nextOption()
        fromManifest.getOrElse {
          schemaWalks.incrementAndGet()
          statuses.iterator.map { case (f, len, _) =>
            val fp = new HPath(f)
            val fs = fp.getFileSystem(conf)
            val in = fs.open(fp)
            val plan =
              try BagPlanner.plan((off, n) => {
                val b = new Array[Byte](n); in.readFully(off, b); b
              }, len)
              finally in.close()
            plan.connInfo.values.find(_.topic == tp).map(_.messageDefinition)
          }.collectFirst { case Some(defn) if defn.nonEmpty => defn }
            .getOrElse(throw new IllegalArgumentException(
              s"no connection for topic '$tp' with a message_definition under $pth"))
        }
      })
      Some((t, d))
    }
  }
}

class BagTable(path: String, typed: Option[(String, String)] = None)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "graft-bag source requires a path")

  override def name(): String = s"graft-bag($path)"
  override def schema(): StructType = typed
    .map { case (_, defn) => BagDataSource.typedSchema(defn) }
    .getOrElse(ContainerDataSource.fullSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    typed match {
      case Some((topic, defn)) => new TypedBagScanBuilder(path, topic, defn,
        new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
      case None => new BagScanBuilder(path,
        new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
    }
}

/** Planning-time self-audit for custom DSv2 scans — the executable form
  * of the 100 TB checklist entry "a source whose planInputPartitions
  * does per-file I/O serially on the driver stalls a many-file lake
  * before the first task launches". Every graft Scan implements this;
  * [[graft.tools.PlanLint]] WARNS when a graft scan certifies per-file
  * planning I/O without pooling/distribution, and flags scans that
  * declare no audit at all, so the next custom source cannot regress
  * the property silently.
  */
trait PlanningAudit {
  /** Does planInputPartitions perform I/O per input FILE (an index
    * read, a footer read), as opposed to one directory listing? */
  def planningDoesPerFileIO: Boolean
  /** When per-file I/O happens, does it run pooled or distributed
    * (anything but serially on the driver thread)? */
  def planningParallel: Boolean
}

/** Shared extraction of a `ts_us` time band from pushed filters — the
  * planning-time chunk prune both the raw and typed builders use. Range
  * predicates are folded into ONE conservative [lo, hi] band (strict
  * bounds widen to inclusive — chunk pruning may only skip, never lie)
  * and are ALWAYS left in the residual: the chunk-info index is
  * chunk-granular, so Spark re-applies the exact predicate to the rows
  * a surviving chunk yields. This is rosbag's own time index answering
  * the reference's scene-retrieval shape ("give me 10:41–10:43 across
  * the fleet", detect_scenes.py:205 keys scenes by start/end time) in
  * O(index) at planning, before any chunk is read or decompressed.
  */
object TsBand {
  import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}

  private def longOf(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  /** (band, recognized filters). The band is None when no ts_us range
    * predicate appears (or bounds are unusable); recognized filters are
    * reported via pushedFilters for EXPLAIN visibility only.
    */
  def of(filters: Array[Filter]): (Option[(Long, Long)], Array[Filter]) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    val recognized = Array.newBuilder[Filter]
    def visit(f: Filter): Boolean = f match {
      case GreaterThan("ts_us", v) => longOf(v).exists { l => lo = lo max l; true }
      case GreaterThanOrEqual("ts_us", v) => longOf(v).exists { l => lo = lo max l; true }
      case LessThan("ts_us", v) => longOf(v).exists { l => hi = hi min l; true }
      case LessThanOrEqual("ts_us", v) => longOf(v).exists { l => hi = hi min l; true }
      case EqualTo("ts_us", v) => longOf(v).exists { l => lo = lo max l; hi = hi min l; true }
      case And(a, b) =>
        val both = visit(a) & visit(b) // non-short-circuit: fold both legs
        both
      case _ => false
    }
    filters.foreach(f => if (visit(f)) recognized += f)
    val band =
      if (lo == Long.MinValue && hi == Long.MaxValue) None
      else Some((lo, hi))
    (band, recognized.result())
  }
}

class BagScanBuilder(path: String, hconf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}

  private var required: StructType = ContainerDataSource.fullSchema
  private var pushedTopics: Option[Set[String]] = None
  private var pushedBags: Option[Set[String]] = None
  private var tsBand: Option[(Long, Long)] = None
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Option[Int] = None

  // partial limit pushdown (Spark keeps the global Limit above): plan
  // only enough chunks to provably cover n rows, and stop each reader
  // at n. A ts band declines — its residual filter would eat rows the
  // bound promised. (Spark only pushes a limit that sits directly on
  // the scan, so a residual-filtered plan never reaches here anyway.)
  override def pushLimit(n: Int): Boolean = {
    if (tsBand.isDefined) false
    else { pushedLimit = Some(n); true }
  }
  // memoized per Aggregation instance: supportCompletePushDown and
  // pushAggregation both probe, and each probe is an O(index) plan
  private var aggProbe: Option[(Aggregation, Option[(StructType, Array[Array[Any]])])] = None
  private var aggResult: Option[(StructType, Array[Array[Any]])] = None

  // ONE plan read shared by the aggregate probe AND the built scan: a
  // DECLINED probe has already paid readPlans over every bag, and the
  // scan must not pay it again (at a 100k-bag lake that would double
  // planning I/O on every query whose aggregate the index can't answer)
  private lazy val planned: Seq[PlannedBag] = BagScan.readPlans(path, hconf.value)

  // a consumed bag_file filter must restrict the AGGREGATE answer too —
  // the index-only tally runs over exactly the statically-kept bags
  private def aggPlans: Seq[PlannedBag] = pushedBags match {
    case Some(keep) => planned.filter(pb =>
      keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
    case None => planned
  }

  private def tryAgg(agg: Aggregation): Option[(StructType, Array[Array[Any]])] = {
    aggProbe match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = BagAggPushdown.tryPlan(path, hconf.value, agg, pushedTopics,
          tsBand, typedTopic = None,
          nonNullCols = Set("bag_file", "topic", "ts_us", "payload"),
          plans = aggPlans)
        aggProbe = Some((agg, r))
        r
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    tryAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = tryAgg(agg)
    aggResult.isDefined
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("topic", _: String) => true
      case In("topic", vs) => vs.forall(_.isInstanceOf[String])
      case IsNotNull("topic") => true // the format never yields null topics
      // STATIC bag_file pushdown — the file IDENTITY column, so an
      // equality/IN drops whole bags at PLANNING, exactly (incremental
      // extraction's only-new-bags decode rides this; the runtime
      // DPP-style IN-set below is the join-driven twin)
      case EqualTo("bag_file", _: String) => true
      case In("bag_file", vs) => vs.forall(_.isInstanceOf[String])
      case IsNotNull("bag_file") => true // never null by format
      case _ => false
    }
    def fold(col: String): Option[Set[String]] =
      accepted.collect {
        case EqualTo(c, v: String) if c == col => Set(v)
        case In(c, vs) if c == col => vs.map(_.asInstanceOf[String]).toSet
      }.reduceOption(_ intersect _)
    pushedTopics = fold("topic")
    pushedBags = fold("bag_file")
    // ts_us band: prunes CHUNKS at planning; stays residual (chunk
    // granularity is approximate, Spark re-applies the exact predicate)
    val (band, tsFilters) = TsBand.of(residual)
    tsBand = band
    pushed = accepted ++ tsFilters
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggResult match {
    case Some((schema, rows)) => BagAggScan(schema, rows, path)
    case None =>
      new BagScan(path, hconf, required, pushedTopics, tsBand, pushedLimit,
        preplanned = () => planned, bagFilter = pushedBags)
  }
}

class BagScan(path: String, hconf: SerializableHadoopConf,
              required: StructType,
              topicFilter: Option[Set[String]],
              tsBand: Option[(Long, Long)] = None,
              limit: Option[Int] = None,
              preplanned: () => Seq[PlannedBag] = null,
              bagFilter: Option[Set[String]] = None)
    extends Scan with Batch with PlanningAudit with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planningDoesPerFileIO: Boolean = true // O(index) read per bag
  override def planningParallel: Boolean = true // BagScan.readPlans pool

  // ONE pooled O(index) read per file, shared by partition planning,
  // statistics, runtime-filter replanning AND (through `preplanned`)
  // the builder's aggregate probe — none doubles the I/O
  private lazy val plans: Seq[PlannedBag] =
    if (preplanned == null) BagScan.readPlans(path, hconf.value) else preplanned()

  // runtime (DPP-style) IN-sets from a joined dimension — None until
  // Spark calls filter(); merged conjunctively with the static pushdown
  private var runtimeBags: Option[Set[String]] = None
  private var runtimeTopics: Option[Set[String]] = None

  private def mergedTopics: Option[Set[String]] = (topicFilter, runtimeTopics) match {
    case (Some(a), Some(b)) => Some(a intersect b)
    case (a, b) => a.orElse(b)
  }
  private def keepTopic: String => Boolean =
    t => mergedTopics.forall(_.contains(t))

  /** Runtime filtering — the scene-retrieval join shape: broadcast the
    * scene table, and the IN-set of its `bag_file` (or `topic`) keys
    * drops WHOLE BAGS (or their rows) from this scan at runtime, before
    * any chunk read. Pruning is best-effort by contract (the join
    * re-applies the predicate), so unrecognized runtime filters are
    * ignored, never wrong.
    */
  override def filterAttributes(): Array[NamedReference] =
    // only columns surviving column pruning: Spark resolves these
    // against the scan's (pruned) output and throws on absent ones
    Array("bag_file", "topic").filter(required.fieldNames.contains)
      .map(Expressions.column)

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    def strings(vs: Array[Any]): Option[Set[String]] =
      if (vs.forall(_.isInstanceOf[String])) Some(vs.map(_.asInstanceOf[String]).toSet)
      else None
    def merge(prior: Option[Set[String]], s: Set[String]) =
      Some(prior.fold(s)(_ intersect s))
    filters.foreach {
      case In("bag_file", vs) => strings(vs).foreach(s => runtimeBags = merge(runtimeBags, s))
      case EqualTo("bag_file", v: String) => runtimeBags = merge(runtimeBags, Set(v))
      case In("topic", vs) => strings(vs).foreach(s => runtimeTopics = merge(runtimeTopics, s))
      case EqualTo("topic", v: String) => runtimeTopics = merge(runtimeTopics, Set(v))
      case _ => () // best-effort: unprunable runtime filters are ignored
    }
  }

  // static bag_file pushdown applies to EVERYTHING (partitions, stats);
  // the runtime IN-set narrows partitions further at execution
  private lazy val staticPlans: Seq[PlannedBag] = bagFilter match {
    case Some(keep) => plans.filter(pb =>
      keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
    case None => plans
  }
  private def runtimePlans: Seq[PlannedBag] = runtimeBags match {
    case Some(keep) => staticPlans.filter(pb =>
      keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
    case None => staticPlans
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // IXD band×topic refinement only when BOTH a band and a topic
    // restriction are in play — the per-topic retrieval shape; all
    // other scans plan from chunk-info alone (no extra reads)
    val kept = runtimePlans
    val drops = (tsBand, mergedTopics) match {
      case (Some((lo, hi)), Some(_)) =>
        BagScan.ixdDisjoint(kept, lo, hi, keepTopic, hconf.value)
      case _ => Map.empty[String, Set[Long]]
    }
    BagScan.limitPartitions(kept, tsBand, keepTopic, limit, drops)
  }

  /** Index-derived stats: numRows is EXACT when every surviving chunk
    * carries counts (band-pruned chunks overcount pending the residual
    * ts filter — an estimate may, results never do); sizeInBytes is the
    * on-disk compressed bytes of surviving chunks (the same
    * lower-bound convention Spark's file sources use pre-
    * fileCompressionFactor). This is what lets Catalyst see a small
    * topic-filtered bag side and broadcast it.
    */
  override def estimateStatistics(): Statistics =
    BagScanEstimates.of(staticPlans, tsBand, keepTopic)

  override def createReaderFactory(): PartitionReaderFactory =
    new BagReaderFactory(required, mergedTopics, hconf, limit)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BagMicroBatchStream(path, hconf,
      new BagReaderFactory(required, topicFilter, hconf), tsBand,
      t => topicFilter.forall(_.contains(t)))

  override def description(): String =
    s"graft-bag $path" + tsBand.map { case (lo, hi) =>
      s" tsBand=[$lo,$hi]" }.getOrElse("") +
      limit.map(n => s" limit=$n").getOrElse("") +
      " runtimeFilters=[bag_file, topic]"
}

/** Typed scan: emits the per-field columns of ONE topic straight from
  * the chunk reader. Column pruning lands IN the decoder —
  * `decodeProjected` byte-skips every unrequested field (no allocation,
  * no UTF-8 decode), so `select(lat, lng)` against a 40-field message
  * pays for two fields plus a cursor walk. Same chunk-parallel
  * planning, batch + micro-batch.
  */
class TypedBagScanBuilder(path: String, topic: String, defn: String,
                          hconf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  import org.apache.spark.sql.sources.Filter

  private var required: StructType = BagDataSource.typedSchema(defn)
  private var tsBand: Option[(Long, Long)] = None
  private var pushedBags: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Option[Int] = None
  private var aggProbe: Option[(Aggregation, Option[(StructType, Array[Array[Any]])])] = None
  private var aggResult: Option[(StructType, Array[Array[Any]])] = None

  override def pushLimit(n: Int): Boolean = {
    if (tsBand.isDefined) false
    else { pushedLimit = Some(n); true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}
    // static bag_file pushdown is EXACT (file identity); ts filters
    // stay residual (chunk pruning is approximate — see TsBand)
    val (bagAccepted, rest) = filters.partition {
      case EqualTo("bag_file", _: String) => true
      case In("bag_file", vs) => vs.forall(_.isInstanceOf[String])
      case IsNotNull("bag_file") => true
      case _ => false
    }
    pushedBags = bagAccepted.collect {
      case EqualTo(_, v: String) => Set(v)
      case In(_, vs) => vs.map(_.asInstanceOf[String]).toSet
    }.reduceOption(_ intersect _)
    val (band, tsFilters) = TsBand.of(rest)
    tsBand = band
    pushed = bagAccepted ++ tsFilters
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  // typed count(*) / GROUP BY bag_file count(*): exact from the topic's
  // per-connection index counts; min/max(ts_us) is answered from the
  // topic's own IXD records (chunk-info ranges span ALL topics, but the
  // per-connection message index restricts to this one exactly)
  // shared probe/scan planning — see BagScanBuilder.planned
  private lazy val planned: Seq[PlannedBag] = BagScan.readPlans(path, hconf.value)

  private def aggPlans: Seq[PlannedBag] = pushedBags match {
    case Some(keep) => planned.filter(pb =>
      keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
    case None => planned
  }

  private def tryAgg(agg: Aggregation): Option[(StructType, Array[Array[Any]])] =
    aggProbe match {
      case Some((a, r)) if a eq agg => r
      case _ =>
        val r = BagAggPushdown.tryPlan(path, hconf.value, agg,
          topicFilter = None, tsBand, typedTopic = Some(topic),
          nonNullCols = Set("bag_file", "ts_us"), plans = aggPlans)
        aggProbe = Some((agg, r))
        r
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    tryAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = tryAgg(agg)
    aggResult.isDefined
  }

  override def build(): Scan = aggResult match {
    case Some((schema, rows)) => BagAggScan(schema, rows, path)
    case None =>
      new TypedBagScan(path, topic, defn, hconf, required, tsBand, pushedLimit,
        preplanned = () => planned, bagFilter = pushedBags)
  }
}

class TypedBagScan(path: String, topic: String, defn: String,
                   hconf: SerializableHadoopConf,
                   required: StructType,
                   tsBand: Option[(Long, Long)] = None,
                   limit: Option[Int] = None,
                   preplanned: () => Seq[PlannedBag] = null,
                   bagFilter: Option[Set[String]] = None)
    extends Scan with Batch with PlanningAudit with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planningDoesPerFileIO: Boolean = true // O(index) read per bag
  override def planningParallel: Boolean = true // BagScan.readPlans pool

  private lazy val plans: Seq[PlannedBag] =
    if (preplanned == null) BagScan.readPlans(path, hconf.value) else preplanned()

  // runtime bag_file IN-set (see BagScan.filter) — typed rows carry no
  // topic column, so bag_file is the only runtime-prunable key
  private var runtimeBags: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array("bag_file").filter(required.fieldNames.contains)
      .map(Expressions.column)

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    filters.foreach {
      case In("bag_file", vs) if vs.forall(_.isInstanceOf[String]) =>
        val s = vs.map(_.asInstanceOf[String]).toSet
        runtimeBags = Some(runtimeBags.fold(s)(_ intersect s))
      case EqualTo("bag_file", v: String) =>
        runtimeBags = Some(runtimeBags.fold(Set(v))(_ intersect Set(v)))
      case _ => () // best-effort: the join re-applies the predicate
    }
  }

  private lazy val staticPlans: Seq[PlannedBag] = bagFilter match {
    case Some(keep) => plans.filter(pb =>
      keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
    case None => plans
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val kept = runtimeBags match {
      case Some(keep) => staticPlans.filter(pb =>
        keep.contains(new HPath(pb.file).getName.stripSuffix(".bag")))
      case None => staticPlans
    }
    // typed scans are always topic-restricted: a band triggers the IXD
    // refinement (single-topic chunks never qualify, so the common
    // per-topic bag layout pays zero extra reads)
    val drops = tsBand match {
      case Some((lo, hi)) =>
        BagScan.ixdDisjoint(kept, lo, hi, _ == topic, hconf.value)
      case None => Map.empty[String, Set[Long]]
    }
    BagScan.limitPartitions(kept, tsBand, _ == topic, limit, drops)
  }

  override def estimateStatistics(): Statistics =
    BagScanEstimates.of(staticPlans, tsBand, _ == topic)

  override def createReaderFactory(): PartitionReaderFactory =
    new TypedBagReaderFactory(topic, defn, required, hconf, limit)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BagMicroBatchStream(path, hconf,
      new TypedBagReaderFactory(topic, defn, required, hconf), tsBand,
      _ == topic)

  override def description(): String =
    s"graft-bag-typed $path topic=$topic" + tsBand.map { case (lo, hi) =>
      s" tsBand=[$lo,$hi]" }.getOrElse("") +
      limit.map(n => s" limit=$n").getOrElse("")
}

object BagScan {
  // Observability for the planner (spec-asserted): current and
  // high-water concurrent planFile calls, plus the total call count —
  // the one-pass proof for multi-topic extraction (N bags => N plans).
  private[graft] val planningNow = new java.util.concurrent.atomic.AtomicInteger()
  private[graft] val planningMax = new java.util.concurrent.atomic.AtomicInteger()
  private[graft] val planCalls = new java.util.concurrent.atomic.AtomicInteger()
  private[graft] def resetPlanProbe(): Unit = {
    planningNow.set(0); planningMax.set(0); planCalls.set(0)
  }

  def listFiles(path: String, conf: org.apache.hadoop.conf.Configuration): Array[String] =
    listFileStatuses(path, conf).map(_._1)

  /** Live `.bag` files with (path, length, mtime) — the identity the
    * manifest freshness check compares against, from the ONE listing
    * every plan pays anyway. */
  def listFileStatuses(path: String,
                       conf: org.apache.hadoop.conf.Configuration): Array[(String, Long, Long)] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val sts =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".bag"))
      else Array(fs.getFileStatus(p))
    sts.map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
      .sortBy(_._1)
  }

  /** Plan every bag under `path` into chunk/span partitions. */
  def planFiles(path: String, conf: org.apache.hadoop.conf.Configuration,
                band: Option[(Long, Long)] = None,
                keepTopic: String => Boolean = _ => true): Array[InputPartition] =
    planMany(listFiles(path, conf).toSeq, conf, band, keepTopic)

  /** Chunks surviving a ts band and a topic restriction — a chunk with
    * no recorded window is never band-pruned, and one with no recorded
    * counts is never topic-pruned (pruning may only skip
    * provably-disjoint work). Topic pruning is exact from chunk-info
    * alone: the count list enumerates every connection IN the chunk, so
    * a chunk whose listed connections all map to non-kept topics has no
    * kept rows (a connection missing from the planned map has an
    * unknown topic and conservatively keeps the chunk). For per-topic
    * bag layouts — the reference's per-(run, topic) shape — a
    * topic-filtered scan plans ZERO partitions for foreign bags.
    */
  def survivingChunks(plan: BagPlanner.BagPlan,
                      band: Option[(Long, Long)],
                      keepTopic: String => Boolean = _ => true): Seq[Long] =
    plan.chunkOffsets.filter { off =>
      (band match {
        case Some((lo, hi)) =>
          plan.chunkTimes.get(off).forall { case (s, e) => e >= lo && s <= hi }
        case None => true
      }) && plan.chunkCounts.get(off).forall(_.exists { case (c, n) =>
        n > 0 && plan.conns.get(c).forall(keepTopic) })
    }

  /** One planned file's chunk/span partitions (the pure half of
    * [[planFile]] — reusable against an already-read [[BagPlanner.BagPlan]]).
    */
  def partitionsOf(f: String, plan: BagPlanner.BagPlan,
                   band: Option[(Long, Long)],
                   keepTopic: String => Boolean = _ => true,
                   drop: Set[Long] = Set.empty): Seq[InputPartition] = {
    survivingChunks(plan, band, keepTopic).filterNot(drop).map(off =>
      BagPartition(f, off, -1L, plan.conns): InputPartition) ++
    plan.rawSpans.map { case (off, spanLen) =>
      BagPartition(f, off, spanLen, plan.conns): InputPartition }
  }

  /** IXD-backed band×topic refinement: chunk offsets PROVEN to hold no
    * kept-topic message inside the band, per file. A chunk window can
    * intersect the band while every KEPT connection's own messages miss
    * it (the per-topic retrieval shape: `topic = t AND ts_us BETWEEN`);
    * the per-connection index records decide that exactly. Proof
    * requirements per chunk: counts known; ≥2 active connections (with
    * one, its IXD range IS the chunk window — nothing to refine, no
    * read paid); every kept connection has an IXD entry whose count
    * matches chunk-info's and whose [mn,mx] is disjoint from the band.
    * Anything unprovable keeps the chunk. Costs pooled header-sized
    * positioned reads for the candidate chunks only, zero
    * decompression.
    */
  def ixdDisjoint(plans: Seq[PlannedBag], lo: Long, hi: Long,
                  keepTopic: String => Boolean,
                  conf: org.apache.hadoop.conf.Configuration): Map[String, Set[Long]] = {
    val candidates: Map[String, Seq[Long]] = plans.map { pb =>
      pb.file -> survivingChunks(pb.plan, Some((lo, hi)), keepTopic)
        .filter(off => pb.plan.chunkCounts.get(off)
          .exists(_.count(_._2 > 0) > 1))
    }.toMap
    val wanted = plans.filter(pb => candidates(pb.file).nonEmpty)
    if (wanted.isEmpty) return Map.empty
    val ct = readConnTimes(wanted, conf, pb => candidates(pb.file))
    wanted.map { pb =>
      val p = pb.plan
      val idxByChunk = ct.getOrElse(pb.file, Map.empty)
      pb.file -> candidates(pb.file).filter { off =>
        val idx = idxByChunk.getOrElse(off, Map.empty)
        p.chunkCounts(off).forall { case (conn, n) =>
          n == 0 || !p.conns.get(conn).forall(keepTopic) || {
            idx.get(conn).exists { case (mn, mx, cnt) =>
              cnt == n && (mx < lo || mn > hi) }
          }
        }
      }.toSet
    }.filter(_._2.nonEmpty).toMap
  }

  /** Partition selection under a pushed limit: include chunks in order,
    * tallying the index's PROVEN row contribution (per-connection
    * counts restricted to kept topics; an uncounted chunk proves 0),
    * and stop planning once the tally covers the limit — `limit(10)`
    * over a fleet of bags launches one chunk's worth of work. Partial
    * pushdown: Spark re-applies the global limit above, so planning
    * MORE than needed is safe, fewer-but-covering is the win.
    */
  def limitPartitions(plans: Seq[PlannedBag], band: Option[(Long, Long)],
                      keepTopic: String => Boolean,
                      limit: Option[Int],
                      drops: Map[String, Set[Long]] = Map.empty)
      : Array[InputPartition] = limit match {
    case None =>
      plans.flatMap(pb => partitionsOf(pb.file, pb.plan, band, keepTopic,
        drops.getOrElse(pb.file, Set.empty))).toArray
    case Some(n) =>
      val out = Array.newBuilder[InputPartition]
      var proven = 0L
      var done = false
      plans.foreach { pb =>
        if (!done) {
          val p = pb.plan
          val drop = drops.getOrElse(pb.file, Set.empty)
          // honor IXD-proven drops here too (unreachable today — pushLimit
          // declines under a ts band — but the signature invites the
          // combination, and a dropped chunk must neither plan nor count
          // toward `proven`)
          survivingChunks(p, band, keepTopic).filterNot(drop).foreach { off =>
            if (!done) {
              out += BagPartition(pb.file, off, -1L, p.conns)
              p.chunkCounts.get(off).foreach(_.foreach { case (c, k) =>
                if (p.conns.get(c).exists(keepTopic)) proven += k })
              if (proven >= n) done = true
            }
          }
          if (!done) p.rawSpans.foreach { case (off, spanLen) =>
            out += BagPartition(pb.file, off, spanLen, p.conns) }
        }
      }
      out.result()
  }

  /** Plan a SET of bags with a bounded driver-side thread pool. Each
    * file's plan is an independent O(index) positioned read —
    * I/O-latency-bound, not CPU-bound — so serializing them on the
    * driver thread makes a 100k-bag lake wait on 100k round trips
    * before the first task launches (the driver-sequential DSv2
    * planning failure mode [[graft.tools.PlanLint]] documents).
    * Results keep deterministic file order regardless of completion
    * order; the pool is per-call (no leaked threads).
    */
  def planMany(files: Seq[String], conf: org.apache.hadoop.conf.Configuration,
               band: Option[(Long, Long)] = None,
               keepTopic: String => Boolean = _ => true): Array[InputPartition] = {
    if (files.isEmpty) Array.empty
    else if (files.sizeIs == 1) planFile(files.head, conf, band, keepTopic).toArray
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(files.size, 16))
      try {
        files.map { f =>
          pool.submit(new java.util.concurrent.Callable[Seq[InputPartition]] {
            override def call(): Seq[InputPartition] = planFile(f, conf, band, keepTopic)
          })
        }.flatMap(_.get()).toArray
      } finally pool.shutdown()
    }
  }

  /** [[planMany]] with the persisted-manifest fast path: files whose
    * (length, mtime) matches a fresh [[graft.sources.BagManifest]] entry
    * plan with ZERO per-bag index reads — the streaming twin of
    * [[readPlans]]' manifest path, so a micro-batch over a
    * manifest-covered lake opens no bag until a task reads a chunk. The
    * manifest probe is signature-cached (one listStatus per batch);
    * new/changed/unrecorded files fall back to the direct index read —
    * staleness costs a re-read, never an answer. Output order stays
    * file-then-offset, identical to [[planMany]].
    */
  def planManyManifest(dir: String, files: Seq[String],
                       conf: org.apache.hadoop.conf.Configuration,
                       band: Option[(Long, Long)] = None,
                       keepTopic: String => Boolean = _ => true): Array[InputPartition] = {
    if (files.isEmpty) return Array.empty
    if (graft.sources.BagManifest.entries(dir, conf).isEmpty)
      return planMany(files, conf, band, keepTopic)
    val status = listFileStatuses(dir, conf)
      .map(t => t._1 -> t).toMap
    // a file absent from the listing can't be manifest-matched: a
    // sentinel status routes it to the direct-read leg of readPlansOf
    val statuses = files.map(f => status.getOrElse(f, (f, -1L, -1L)))
    readPlansOf(dir, statuses, conf)
      .flatMap(pb => partitionsOf(pb.file, pb.plan, band, keepTopic)).toArray
  }

  /** O(index) plan of ONE bag into chunk/span partitions — shared by the
    * batch scan and the micro-batch stream (each arriving file still
    * fans out chunk-parallel inside its batch). With a `band`, chunks
    * whose chunk-info [start_time, end_time] misses [lo, hi] are
    * dropped HERE — before any data read; chunks with no recorded range
    * (and raw spans, which have none) are kept, so pruning only ever
    * skips provably-disjoint work.
    */
  def planFile(f: String, conf: org.apache.hadoop.conf.Configuration,
               band: Option[(Long, Long)] = None,
               keepTopic: String => Boolean = _ => true): Seq[InputPartition] =
    partitionsOf(f, readPlan(f, conf), band, keepTopic)

  /** The O(index) positioned-read plan of one bag (probe-counted — the
    * same counters the one-pass specs assert, whichever consumer
    * triggers the read: chunk planning or index-only aggregates).
    */
  def readPlan(f: String,
               conf: org.apache.hadoop.conf.Configuration): BagPlanner.BagPlan =
    readPlanned(f, conf).plan

  /** [[readPlan]] plus the file's on-disk size (the compressed-bytes
    * lower bound scan statistics report). */
  def readPlanned(f: String,
                  conf: org.apache.hadoop.conf.Configuration): PlannedBag = {
    planCalls.incrementAndGet()
    val depth = planningNow.incrementAndGet()
    planningMax.accumulateAndGet(depth, (a: Int, b: Int) => math.max(a, b))
    try {
      val fp = new HPath(f)
      val ffs = fp.getFileSystem(conf)
      val len = ffs.getFileStatus(fp).getLen
      val in = ffs.open(fp)
      val plan =
        try BagPlanner.plan((off, n) => {
          val b = new Array[Byte](n); in.readFully(off, b); b
        }, len)
        finally in.close()
      PlannedBag(f, plan, len)
    } finally planningNow.decrementAndGet()
  }

  /** Per-connection (minTs, maxTs, count) per chunk for each planned
    * bag, from the IXD records trailing each chunk record
    * ([[BagPlanner.connTimes]]) — pooled positioned reads like
    * [[readPlans]], ZERO chunk decompression. Keyed by file path.
    */
  def readConnTimes(plans: Seq[PlannedBag],
                    conf: org.apache.hadoop.conf.Configuration,
                    offsetsOf: PlannedBag => Seq[Long] = _.plan.chunkOffsets)
      : Map[String, Map[Long, Map[Int, (Long, Long, Long)]]] = {
    def one(pb: PlannedBag): (String, Map[Long, Map[Int, (Long, Long, Long)]]) =
      pb.manifestConnTimes match {
        case Some(ct) => // persisted by the manifest: zero file reads
          pb.file -> offsetsOf(pb).flatMap(off => ct.get(off).map(off -> _)).toMap
        case None =>
          val fp = new HPath(pb.file)
          val fs = fp.getFileSystem(conf)
          val in = fs.open(fp)
          try pb.file -> BagPlanner.connTimes((off, n) => {
            val b = new Array[Byte](n); in.readFully(off, b); b
          }, pb.bytes, offsetsOf(pb))
          finally in.close()
      }
    if (plans.isEmpty) Map.empty
    else if (plans.sizeIs == 1) Map(one(plans.head))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(plans.size, 16))
      try {
        plans.map { pb =>
          pool.submit(new java.util.concurrent.Callable[
              (String, Map[Long, Map[Int, (Long, Long, Long)]])] {
            override def call() = one(pb)
          })
        }.map(_.get()).toMap
      } finally pool.shutdown()
    }
  }

  /** Every bag's plan under `path`, pooled like [[planMany]] — the
    * driver-side input to index-only aggregates, scan statistics, and
    * limit-bounded chunk selection. */
  def readPlans(path: String,
                conf: org.apache.hadoop.conf.Configuration): Seq[PlannedBag] =
    readPlansOf(path, listFileStatuses(path, conf).toSeq, conf)

  /** [[readPlans]] over an EXPLICIT (path, length, mtime) status list —
    * the one manifest-freshness implementation every consumer shares
    * (batch planning, aggregate probes, streaming micro-batches). A
    * persisted manifest under `dir` answers FRESH files (matching
    * length+mtime) with zero per-bag reads; new/changed/unrecorded
    * files fall back to the pooled direct index read — staleness costs
    * a re-read, never an answer. Input order is preserved.
    */
  def readPlansOf(dir: String, statuses: Seq[(String, Long, Long)],
                  conf: org.apache.hadoop.conf.Configuration): Seq[PlannedBag] = {
    if (statuses.isEmpty) return Nil
    val manifest = graft.sources.BagManifest.entries(dir, conf)
    val (fresh, direct) = statuses.partition { case (f, len, mtime) =>
      manifest.get(f).exists(e => e.len == len && e.mtime == mtime) }
    val fromManifest = fresh.map { case (f, len, _) =>
      val e = manifest(f)
      f -> PlannedBag(f, e.plan, len, Some(e.connTimes))
    }.toMap
    val files = direct.map(_._1)
    val fromDirect: Map[String, PlannedBag] =
      if (files.isEmpty) Map.empty
      else if (files.sizeIs == 1)
        Map(files.head -> readPlanned(files.head, conf))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(files.size, 16))
        try {
          files.map { f =>
            f -> pool.submit(new java.util.concurrent.Callable[PlannedBag] {
              override def call(): PlannedBag = readPlanned(f, conf)
            })
          }.map { case (f, fut) => f -> fut.get() }.toMap
        } finally pool.shutdown()
      }
    statuses.map { case (f, _, _) => fromManifest.getOrElse(f, fromDirect(f)) }
  }
}

/** One bag's driver-side plan plus its on-disk byte size.
  * `manifestConnTimes` carries the persisted per-connection IXD ranges
  * when the plan came from a fresh [[graft.sources.BagManifest]] entry —
  * [[BagScan.readConnTimes]] then answers without reopening the file.
  */
case class PlannedBag(file: String, plan: BagPlanner.BagPlan, bytes: Long,
                      manifestConnTimes: Option[Map[Long, Map[Int, (Long, Long, Long)]]] = None)

/** Index-derived [[Statistics]] shared by the raw and typed scans. */
object BagScanEstimates {
  import java.util.OptionalLong

  def of(plans: Seq[PlannedBag], band: Option[(Long, Long)],
         keepTopic: String => Boolean): Statistics = {
    var rows = 0L
    var exact = true
    var bytes = 0L
    plans.foreach { pb =>
      val p = pb.plan
      if (p.rawSpans.nonEmpty) exact = false
      val surviving = BagScan.survivingChunks(p, band, keepTopic)
      // on-disk bytes scaled to the surviving-chunk fraction — the
      // compressed lower bound (Spark's file-source convention)
      bytes += (if (p.chunkOffsets.isEmpty) pb.bytes
                else pb.bytes * surviving.size / p.chunkOffsets.size)
      surviving.foreach { off =>
        p.chunkCounts.get(off) match {
          case Some(m) => m.foreach { case (c, k) =>
            if (p.conns.get(c).exists(keepTopic)) rows += k }
          case None => exact = false
        }
      }
    }
    // NOT named numRows/sizeInBytes: inside the anonymous class those
    // identifiers resolve to the methods being defined (self-recursion)
    val rowsOpt = if (exact) OptionalLong.of(rows) else OptionalLong.empty()
    val sizeOpt = OptionalLong.of(bytes)
    new Statistics {
      override def sizeInBytes(): OptionalLong = sizeOpt
      override def numRows(): OptionalLong = rowsOpt
    }
  }
}

/** Index-only aggregate answering — `rosbag info`'s tally as DSv2
  * aggregate pushdown. chunk-info records carry per-connection message
  * counts and per-chunk [start_time, end_time], so
  * `count(*)`, `GROUP BY topic/bag_file count(*)` and global
  * `min/max(ts_us)` are answerable from the index section alone: at
  * 100 TB that's the difference between decompressing every chunk of
  * every bag and ONE O(index) positioned read per bag at planning
  * (the same read chunk planning already does). GROUPED or
  * topic-restricted `min/max(ts_us)` — the full `rosbag info` shape,
  * per-topic count + time range — is answered from the per-connection
  * INDEX-DATA records instead ([[BagPlanner.connTimes]]): chunk-info
  * windows span all topics of a chunk, but each IXD record indexes ONE
  * connection's message times, so per-topic extremes are exact. That
  * path costs O(chunks × topics) header-sized positioned reads, still
  * zero chunk decompression. Pushdown is accepted ONLY when the index
  * provably covers the question — any raw span (crashed writer), any
  * chunk missing its counts, an IXD entry count disagreeing with
  * chunk-info's, any unknown connection id, or any predicate the index
  * can't answer exactly (a ts_us band — chunk ranges are approximate)
  * declines, and Spark aggregates scan rows normally. Complete
  * pushdown: the scan's rows ARE the final answer (one row per group),
  * no partial agg above.
  */
object BagAggPushdown {
  import org.apache.spark.sql.connector.expressions.{Expression => VExpr, NamedReference}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private sealed trait AggCol
  private case object Cnt extends AggCol
  private case object MinTs extends AggCol
  private case object MaxTs extends AggCol

  private def colName(e: VExpr): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
    case _ => None
  }

  /** Answer `agg` from bag indexes, or None when exactness can't be
    * proven. `typedTopic` (the typed scan's one topic) restricts counts
    * to that topic's connections; `topicFilter` is the untyped scan's
    * consumed pushed filter, applied the same way.
    */
  def tryPlan(path: String, conf: org.apache.hadoop.conf.Configuration,
              agg: Aggregation,
              topicFilter: Option[Set[String]],
              tsBand: Option[(Long, Long)],
              typedTopic: Option[String],
              nonNullCols: Set[String],
              plans: => Seq[PlannedBag]): Option[(StructType, Array[Array[Any]])] = {
    if (tsBand.isDefined) return None // chunk time ranges are approximate
    val groupOpt = agg.groupByExpressions.toSeq.map(colName)
    if (groupOpt.exists(_.isEmpty)) return None
    val groupCols = groupOpt.flatten
    val allowedGroup: Set[String] =
      if (typedTopic.isDefined) Set("bag_file") else Set("bag_file", "topic")
    if (!groupCols.forall(allowedGroup) || groupCols.distinct.size != groupCols.size)
      return None

    val funcsOpt: Seq[Option[AggCol]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(Cnt)
      case c: Count if !c.isDistinct && colName(c.column).exists(nonNullCols) =>
        Some(Cnt) // count(non-null col) ≡ count(*)
      case m: Min if colName(m.column).contains("ts_us") => Some(MinTs)
      case m: Max if colName(m.column).contains("ts_us") => Some(MaxTs)
      case _ => None
    }
    if (funcsOpt.exists(_.isEmpty) || funcsOpt.isEmpty) return None
    val funcs = funcsOpt.flatten
    val needTimes = funcs.exists(f => f == MinTs || f == MaxTs)
    // chunk-info [start,end] spans ALL topics of a chunk, so it answers
    // min/max(ts_us) only UNRESTRICTED; a grouped or topic-restricted
    // min/max needs the per-connection index (IXD) records instead —
    // more positioned reads (O(chunks × topics), still zero chunk
    // decompression), so pay for them only on that shape
    val needConnTimes = needTimes &&
      (groupCols.nonEmpty || topicFilter.isDefined || typedTopic.isDefined)

    val planSeq = plans // force the by-name once
    val sound = planSeq.forall { pb =>
      val p = pb.plan
      p.rawSpans.isEmpty &&
      p.chunkOffsets.forall(p.chunkCounts.contains) &&
      p.chunkCounts.valuesIterator.flatMap(_.keysIterator)
        .forall(p.conns.contains) &&
      (!needTimes || needConnTimes || p.chunkOffsets.forall(p.chunkTimes.contains))
    }
    if (!sound) return None

    // per-connection (minTs, maxTs, count) per chunk, from the IXD
    // records — exact iff every chunk-info count is matched by an index
    // entry count (a bag whose message index is absent/torn declines)
    val connTimes: Map[String, Map[Long, Map[Int, (Long, Long, Long)]]] =
      if (!needConnTimes) Map.empty
      else {
        val ct = BagScan.readConnTimes(planSeq, conf)
        val covered = planSeq.forall { pb =>
          val p = pb.plan
          p.chunkOffsets.forall { off =>
            val idx = ct.getOrElse(pb.file, Map.empty).getOrElse(off, Map.empty)
            p.chunkCounts(off).forall { case (conn, n) =>
              n == 0 || idx.get(conn).exists(_._3 == n) }
          }
        }
        if (!covered) return None
        ct
      }

    val keep: String => Boolean = t =>
      topicFilter.forall(_.contains(t)) && typedTopic.forall(_ == t)
    // key = group column values in groupCols order
    val counts = scala.collection.mutable.Map.empty[Seq[String], Long]
    val minByKey = scala.collection.mutable.Map.empty[Seq[String], Long]
    val maxByKey = scala.collection.mutable.Map.empty[Seq[String], Long]
    var minTs = Long.MaxValue
    var maxTs = Long.MinValue
    var sawTime = false
    planSeq.foreach { pb =>
      val p = pb.plan
      val bag = new HPath(pb.file).getName.stripSuffix(".bag")
      p.chunkOffsets.foreach { off =>
        p.chunkTimes.get(off).foreach { case (s, e) =>
          sawTime = true; minTs = minTs min s; maxTs = maxTs max e
        }
        p.chunkCounts(off).foreach { case (conn, n) =>
          val topic = p.conns(conn)
          if (keep(topic) && n > 0) {
            val key: Seq[String] = groupCols.map {
              case "bag_file" => bag
              case _ => topic
            }
            counts(key) = counts.getOrElse(key, 0L) + n
            if (needConnTimes) {
              val (mn, mx, _) = connTimes(pb.file)(off)(conn)
              minByKey(key) = minByKey.get(key).fold(mn)(_ min mn)
              maxByKey(key) = maxByKey.get(key).fold(mx)(_ max mx)
            }
          }
        }
      }
    }

    val aggVals: Seq[String] => Seq[Any] = key => funcs.map {
      case Cnt => java.lang.Long.valueOf(counts.getOrElse(key, 0L))
      case MinTs if needConnTimes =>
        minByKey.get(key).map(java.lang.Long.valueOf(_)).orNull
      case MaxTs if needConnTimes =>
        maxByKey.get(key).map(java.lang.Long.valueOf(_)).orNull
      case MinTs => if (sawTime) java.lang.Long.valueOf(minTs) else null
      case MaxTs => if (sawTime) java.lang.Long.valueOf(maxTs) else null
    }
    val rows: Array[Array[Any]] =
      if (groupCols.isEmpty)
        // a global aggregate over empty input is still ONE row
        // (count(*)=0, min/max=null) — plain SQL semantics
        Array((aggVals(Nil)).toArray)
      else counts.keys.toSeq.sortBy(_.mkString("\u0000"))
        .map(key => (key ++ aggVals(key)).toArray[Any]).toArray

    val schema = StructType(
      groupCols.map(g => StructField(g, StringType, nullable = false)) ++
      funcs.zipWithIndex.map {
        case (Cnt, i) => StructField(s"count_$i", LongType, nullable = false)
        case (MinTs, i) => StructField(s"min_ts_us_$i", LongType, nullable = true)
        case (MaxTs, i) => StructField(s"max_ts_us_$i", LongType, nullable = true)
      })
    Some((schema, rows))
  }
}

/** The bag form of [[IndexAggScan]]: rows computed from chunk-info
  * indexes, a single tiny partition (bounded by group count:
  * topics × bags at most), zero chunk reads.
  */
object BagAggScan {
  def apply(schema: StructType, rows: Array[Array[Any]], path: String): IndexAggScan =
    new IndexAggScan(schema, rows,
      s"graft-bag-agg $path [index-only: ${schema.fieldNames.mkString(", ")}]")
}

/** One arriving `.bag` file = one micro-batch unit — the streaming twin
  * of [[ContainerMicroBatchStream]] on REAL bags, mirroring the
  * reference's upload-triggered front end (an S3 bag upload fires the
  * pipeline: infrastructure/emr_trigger). The offset is the ordered
  * processed-file list (restart-safe by construction — a checkpointed
  * offset re-seeds discovery order before any new listing merges in);
  * within a batch, each new bag fans out chunk-parallel via
  * [[BagScan.planFile]]. Append-only directories, like every
  * file-based source.
  */
class BagMicroBatchStream(path: String, hconf: SerializableHadoopConf,
                          factory: PartitionReaderFactory,
                          tsBand: Option[(Long, Long)] = None,
                          keepTopic: String => Boolean = _ => true)
    extends MicroBatchStream {

  private val discovered = scala.collection.mutable.ArrayBuffer[String]()
  private val known = scala.collection.mutable.HashSet[String]()

  private def merge(files: Seq[String]): Unit = synchronized {
    files.foreach { f => if (known.add(f)) discovered += f }
  }

  override def initialOffset(): Offset = ContainerOffset(Nil)

  override def latestOffset(): Offset = {
    merge(BagScan.listFiles(path, hconf.value).toSeq)
    synchronized { ContainerOffset(discovered.toList) }
  }

  override def deserializeOffset(json: String): Offset = {
    if (!json.trim.startsWith("["))
      throw new IllegalStateException(
        "graft-bag checkpoint offset is not a file-list (foreign " +
          "checkpoint?) — rebuild the checkpoint directory")
    val files = ContainerOffset.mapper
      .readValue(json, classOf[Array[String]]).toSeq
    merge(files) // checkpointed order seeds discovery before new listings
    ContainerOffset(files)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ContainerOffset].files
    val e = end.asInstanceOf[ContainerOffset].files
    if (!e.startsWith(s))
      throw new IllegalStateException(
        s"graft-bag offsets diverge: start list ${s.take(3).mkString(",")}… is not a " +
          s"prefix of end list ${e.take(3).mkString(",")}… — the checkpoint does not " +
          "match this directory's discovery order; rebuild the checkpoint directory")
    BagScan.planManyManifest(path, e.drop(s.length), hconf.value, tsBand, keepTopic)
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One chunk record (`spanLen < 0`) or one raw top-level record span
  * (`spanLen` bytes from `offset`) of one bag file, plus the
  * connection map planning collected for the file.
  */
case class BagPartition(file: String, offset: Long, spanLen: Long,
                        conns: Map[Int, String]) extends InputPartition

class BagReaderFactory(required: StructType,
                       topicFilter: Option[Set[String]],
                       hconf: SerializableHadoopConf,
                       limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BagPartitionReader(partition.asInstanceOf[BagPartition], required,
      topicFilter, hconf, limit)
}

/** Seeks to its chunk, reads exactly that record, inflates and decodes
  * it via [[BagCodec.unpackRecords]] (in-chunk connection records extend
  * the planned map), then emits pruned rows. A chunk is the writer's
  * bounded buffering unit (~768 KiB in rosbag), so holding one decoded
  * chunk is the same memory story the original rosbag reader has.
  */
/** Executor-side chunk IO shared by the raw and typed readers: seek to
  * the partition's chunk/span, read exactly that record, inflate and
  * decode via [[BagCodec.unpackRecords]].
  */
object BagChunkIO {
  // Observability (spec-asserted): how many chunk/span DATA reads ran —
  // the one-pass proof for multi-topic extraction (planning may replan
  // under AQE, but each chunk's bytes must be read exactly once).
  private[graft] val readCalls = new java.util.concurrent.atomic.AtomicInteger()

  def messages(part: BagPartition,
               hconf: SerializableHadoopConf): Iterator[(String, Long, Array[Byte])] = {
    readCalls.incrementAndGet()
    val hPath = new HPath(part.file)
    val fs = hPath.getFileSystem(hconf.value)
    val in = fs.open(hPath)
    try {
      val recordBytes: Array[Byte] =
        if (part.spanLen >= 0) { // raw top-level span: exact byte range
          // A crashed-writer raw span is unbounded in the format: guard
          // the Int narrowing or a >2 GiB span turns into a negative
          // allocation instead of a readable error.
          require(part.spanLen <= Int.MaxValue - 8,
            s"raw record span of ${part.spanLen} bytes at offset " +
              s"${part.offset} in ${part.file} exceeds the 2 GiB " +
              "single-buffer ceiling; re-chunk the bag")
          val b = new Array[Byte](part.spanLen.toInt)
          in.readFully(part.offset, b); b
        } else { // chunk record: header tells us how far it runs
          val lenBuf = new Array[Byte](4)
          in.readFully(part.offset, lenBuf)
          val hlen = java.nio.ByteBuffer.wrap(lenBuf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          in.readFully(part.offset + 4 + hlen, lenBuf)
          val dlen = java.nio.ByteBuffer.wrap(lenBuf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          require(hlen >= 0 && dlen >= 0 && 8L + hlen + dlen <= Int.MaxValue,
            s"chunk record at offset ${part.offset} in ${part.file} " +
              s"declares hlen=$hlen dlen=$dlen: over the 2 GiB " +
              "single-record ceiling or corrupt")
          val b = new Array[Byte](8 + hlen + dlen)
          in.readFully(part.offset, b); b
        }
      BagCodec.unpackRecords(recordBytes, 0, part.conns).iterator
    } finally in.close()
  }
}

class TypedBagReaderFactory(topic: String, defn: String,
                            required: StructType,
                            hconf: SerializableHadoopConf,
                            limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TypedBagPartitionReader(partition.asInstanceOf[BagPartition],
      topic, defn, required, hconf, limit)
}

/** The typed reader: for each message of THE topic, decode only the
  * required leaf fields ([[graft.plans.RosMsg.decodeProjected]] —
  * byte-skip the rest) and emit them next to bag_file/ts_us.
  */
class TypedBagPartitionReader(part: BagPartition, topic: String,
                              defn: String, required: StructType,
                              hconf: SerializableHadoopConf,
                              limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {
  import graft.plans.RosMsg

  private val cap = limit.getOrElse(Int.MaxValue)
  private var emitted = 0

  private val bagFile =
    UTF8String.fromString(new HPath(part.file).getName.stripSuffix(".bag"))
  private val msg = RosMsg.parseCached(defn)
  private val wantedLeaves: Set[String] =
    required.fieldNames.toSet -- Set("bag_file", "ts_us")
  // required-field assembly: for each output column, either a metadata
  // tag or the index into decodeProjected's wire-ordered value array
  private val leafOrder = RosMsg.leafNames(msg).filter(wantedLeaves)
  private val colPlan: Array[Either[String, Int]] =
    required.fieldNames.map {
      case "bag_file" => Left("bag_file")
      case "ts_us" => Left("ts_us")
      case f => Right(leafOrder.indexOf(f))
    }

  private val messages = BagChunkIO.messages(part, hconf)
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (emitted >= cap) return false // pushed limit: this task's share is done
    while (messages.hasNext) {
      val (t, ts, payload) = messages.next()
      if (t == topic) {
        val vals = RosMsg.decodeProjected(payload, msg, wantedLeaves)
        row = new GenericInternalRow(colPlan.map {
          case Left("bag_file") => bagFile
          case Left(_) => ts
          case Right(i) => vals(i)
        }.asInstanceOf[Array[Any]])
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

class BagPartitionReader(part: BagPartition, required: StructType,
                         topicFilter: Option[Set[String]],
                         hconf: SerializableHadoopConf,
                         limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  private val hPath = new HPath(part.file)
  private val bagFile = UTF8String.fromString(hPath.getName.stripSuffix(".bag"))
  private val fieldIdx = required.fieldNames.map(
    ContainerDataSource.fullSchema.fieldNames.indexOf(_))
  private val wanted = topicFilter
  private val cap = limit.getOrElse(Int.MaxValue)
  private var emitted = 0

  private val messages: Iterator[(String, Long, Array[Byte])] =
    BagChunkIO.messages(part, hconf)

  private var row: InternalRow = _

  override def next(): Boolean = {
    if (emitted >= cap) return false // pushed limit: this task's share is done
    while (messages.hasNext) {
      val (topic, ts, payload) = messages.next()
      if (wanted.forall(_.contains(topic))) {
        row = new GenericInternalRow(fieldIdx.map {
          case 0 => bagFile
          case 1 => UTF8String.fromString(topic)
          case 2 => ts
          case 3 => payload
        }.asInstanceOf[Array[Any]])
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
