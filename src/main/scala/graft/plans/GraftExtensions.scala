package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions (`vec_dot`, `cosine_sim`). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteVectorOps)
    ext.injectOptimizerRule(_ => PruneAsOfJoin)
    ext.injectOptimizerRule(_ => PruneRangeJoin)
    ext.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => new RangeJoinStrategy)
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children(0), children(1))),
    (new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => SimHashBits(children(0))),
    (new FunctionIdentifier("container_pack"),
      new ExpressionInfo(classOf[ContainerPack].getName, "container_pack"),
      (children: Seq[Expression]) => ContainerPack(children(0))),
    (new FunctionIdentifier("container_unpack"),
      new ExpressionInfo(classOf[ContainerUnpack].getName, "container_unpack"),
      (children: Seq[Expression]) => ContainerUnpack(children(0))),
    (new FunctionIdentifier("objects_in_lane_fused"),
      new ExpressionInfo(classOf[ObjectsInLaneFused].getName, "objects_in_lane_fused"),
      (children: Seq[Expression]) => ObjectsInLaneFused(children(0), children(1))),
    (new FunctionIdentifier("minhash_slots"),
      new ExpressionInfo(classOf[MinHashSlots].getName, "minhash_slots"),
      (children: Seq[Expression]) => MinHashSlots(children(0),
        children(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_slots k must be a literal int, got $other")
        })),
    (new FunctionIdentifier("minhash_slots_tokens"),
      new ExpressionInfo(classOf[MinHashSlotsTokens].getName, "minhash_slots_tokens"),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_slots_tokens $name must be a literal int, got $other")
        }
        MinHashSlotsTokens(children(0),
          intArg(children(1), "shingleN"), intArg(children(2), "k"))
      }))

  /** Imperative registration for sessions built without extensions (e.g. a
    * harness-provided session) — operators that use the native functions
    * call this first; registering twice is harmless.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteVectorOps)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteVectorOps
    }
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoin
    }
    if (!spark.experimental.extraOptimizations.contains(PruneRangeJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneRangeJoin
    }
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    }
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[RangeJoinStrategy])) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new RangeJoinStrategy
    }
  }
}
