package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Let

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

  /** Membership probe: all k bits set. Each position is let-bound so the
    * xxhash64 tree evaluates once per probe, not once per reference.
    */
  def mightContain(bloom: Column, keys: Seq[Column],
                   numBits: Int, numHashes: Int): Column =
    positions(keys, numBits, numHashes).map { pos =>
      Let.bind(pos) { p =>
        element_at(bloom, shiftright(p, 6).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            p.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
      }
    }.reduce(_ && _)

  /** Semi join with bloom prefilter: ≡ fact.join(dim, keys, "left_semi"),
    * with non-candidate fact rows dropped before the join's exchange.
    *
    * The confirm join's condition carries an always-true guard conjunct
    * that references the bloom column AND a dim column: without it,
    * Catalyst's PushLeftSemiLeftAntiThroughJoin pushes the exact semi
    * join BELOW the broadcast+probe — the optimizer cannot know the
    * probe is the cheap side — and the full fact table reaches the join
    * exchange, which is precisely what this operator exists to prevent.
    * The guard must span BOTH join sides and resist constant folding
    * (the bloom column is non-nullable, so a bare IS NOT NULL folds
    * away, and a single-side guard gets split out of the join condition
    * by predicate pushdown, re-enabling the push). Plan-shape spec pins
    * the probe filter below the confirm join.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
               numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    val bloom = buildBloom(dim, keys.map(col), numBits, numHashes)
    val pre = fact.crossJoin(broadcast(bloom))
      .filter(mightContain(col("bloom"), keys.map(col), numBits, numHashes))
      .alias("__bj_f")
    val dimK = dim.select(keys.map(col): _*).distinct().alias("__bj_d")
    // pmod(xxhash64(dim key), 1) == 0 at runtime but no optimizer rule
    // folds it, and it survives non-nullable dim keys (an isNull-based
    // guard constant-folds away when the key is statically non-null)
    val guard = size(col("__bj_f.bloom")) >=
      pmod(xxhash64(col(s"__bj_d.${keys.head}")), lit(1L))
    val cond = keys.map(k => col(s"__bj_f.$k") === col(s"__bj_d.$k")).reduce(_ && _) &&
      guard
    pre.join(dimK, cond, "left_semi").drop("bloom")
  }
}
