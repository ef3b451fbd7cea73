package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Bloom-filter RUNTIME PREFILTER for selective joins — the explicit,
  * storable form of the runtime row-level filtering modern engines inject
  * automatically: build a compact bit-set summary of the dimension keys,
  * broadcast it, drop non-matching fact rows AT THE SCAN (map-side,
  * before any exchange), then run the exact join on the survivors.
  *
  * The result is EXACTLY the plain semi join (the oracle runs EXISTS):
  * false negatives are impossible (every dim key sets its own bits) and
  * false positives are removed by the exact confirm join. The bloom only
  * moves WORK, never changes the answer.
  *
  * At 100 TB: the confirm join's shuffle carries only candidate rows —
  * for a selective dimension that is orders of magnitude less fact data
  * in flight, at the cost of one ~(numBits/8)-byte broadcast and
  * numHashes codegen'd xxhash64 evaluations per fact row. Everything is
  * composed built-ins (no UDF, no custom expression): the bit-set is an
  * `array<long>` column built by bit_or aggregation, and the probe is
  * element_at + bitwiseAND inside whole-stage codegen.
  */
object BloomJoin {

  /** The k probe bit-positions of one key tuple: pmod(xxhash64(keys, i),
    * numBits). Using the probe index as an extra hashed column gives k
    * independent 64-bit hashes without a double-hashing degeneracy case.
    */
  private def positions(keys: Seq[Column], numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      pmod(xxhash64((keys :+ lit(i)): _*), lit(numBits.toLong)))

  /** One-row DataFrame with column `bloom`: array<long> of numBits/64
    * words, the OR of every dim key's probe masks. Two tiny aggregates
    * (word-level bit_or, then a single-row densify) — the build cost is
    * proportional to the DIMENSION, never the fact side.
    */
  def buildBloom(dim: DataFrame, keys: Seq[Column],
                 numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes > 0, s"numHashes must be positive, got $numHashes")
    val words = numBits / 64
    dim.select(explode(array(positions(keys, numBits, numHashes): _*)).as("__pos"))
      .select(shiftright(col("__pos"), 6).cast("int").as("__w"),
        call_function("shiftleft", lit(1L),
          col("__pos").bitwiseAND(lit(63L)).cast("int")).as("__mask"))
      .groupBy(col("__w"))
      .agg(expr("bit_or(__mask)").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits")))).as("__m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("__m"), w), lit(0L))).as("bloom"))
  }

  /** Membership probe: all k bits set. The position tree is deliberately
    * INLINED twice per probe (word index and mask) rather than let-bound:
    * Let.bind's single-element `transform` is a higher-order function,
    * which Spark evaluates INTERPRETED — measured ~0.9 s over 6M rows at
    * sf0.1, dwarfing the duplicated (codegen'd) xxhash64. Tree
    * duplication is the cheap side of that trade here.
    */
  def mightContain(bloom: Column, keys: Seq[Column],
                   numBits: Int, numHashes: Int): Column =
    positions(keys, numBits, numHashes).map { pos =>
      element_at(bloom, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)

  /** Semi join with bloom prefilter: ≡ fact.join(dim, keys, "left_semi"),
    * with non-candidate fact rows dropped before the join's exchange.
    *
    * The bloom MATERIALIZES AT COMPOSITION TIME (a driver-side collect
    * of the one-row build) and embeds in the plan as an array literal —
    * the same move Spark's own runtime-filter injection makes, where
    * the bloom build is a scalar subquery the driver executes before
    * the main query. The ~numBits/8-byte size is the whole point:
    * small enough to ship inside the plan. This keeps the probe a
    * PLAIN FILTER on the fact scan — fully inside whole-stage codegen,
    * pushed toward the scan by Catalyst like any predicate, with no
    * join for the optimizer to reorder. (Two earlier in-plan
    * formulations lost: a crossJoin attach broke whole-stage codegen
    * with BroadcastNestedLoopJoin — measured ~2× probe cost at sf0.1 —
    * and Catalyst's PushLeftSemiLeftAntiThroughJoin kept rewriting the
    * exact confirm join underneath the probe.)
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
               numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    // collect the sparse (word, bits) rows — at most numBits/64 of them —
    // and densify driver-side: one Spark job instead of two (the one-row
    // densify stage exists in buildBloom only for the all-DataFrame form)
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    val bloomArr = new Array[Long](numBits / 64)
    dim.select(explode(array(positions(keys.map(col), numBits, numHashes): _*)).as("__pos"))
      .select(shiftright(col("__pos"), 6).cast("int").as("__w"),
        call_function("shiftleft", lit(1L),
          col("__pos").bitwiseAND(lit(63L)).cast("int")).as("__mask"))
      .groupBy(col("__w"))
      .agg(expr("bit_or(__mask)").as("__bits"))
      .collect()
      .foreach(r => bloomArr(r.getInt(0)) = r.getLong(1))
    fact.filter(mightContain(typedlit(bloomArr), keys.map(col), numBits, numHashes))
      .join(dim.select(keys.map(col): _*).distinct(), keys, "left_semi")
  }

  /** LAZY variant of [[semiJoin]]: the bloom build is an IN-PLAN scalar
    * subquery instead of a composition-time collect, so constructing the
    * DataFrame runs no Spark job — composition stays lazy, exactly like
    * every other operator here. At action time the driver executes the
    * one-row subquery first (Spark's own runtime-filter execution shape)
    * and inlines its array value into the codegen'd probe filter, so the
    * executed plan is the same probe-then-confirm as the eager form.
    *
    * All 2·numHashes probe references share ONE subquery expression (one
    * exprId), so the bloom builds once, not per reference. Prefer this
    * when composing plans that may never execute, or that are constructed
    * far from where they run; prefer [[semiJoin]] when the caller wants
    * the bloom cost paid eagerly and visibly (e.g. reused across many
    * queries via the plan literal).
    */
  def semiJoinLazy(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                   numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    val bloomPlan = buildBloom(dim, keys.map(col), numBits, numHashes)
      .queryExecution.analyzed
    val bloomCol = org.apache.spark.sql.graftbridge.GraftShim.scalarSubquery(bloomPlan)
    fact.filter(mightContain(bloomCol, keys.map(col), numBits, numHashes))
      .join(dim.select(keys.map(col): _*).distinct(), keys, "left_semi")
  }
}
