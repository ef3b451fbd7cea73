package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-size context windows for
  * training. Contiguous packing in a deterministic document order — each
  * doc lands in bin floor(prefix_tokens / window) at offset
  * prefix_tokens mod window (docs may straddle bins; trainers mask across
  * the boundary). One running-sum window per partition key.
  *
  * At scale, partition the corpus (e.g. by shard/source) so each
  * packing group's running sum is independent — embarrassingly parallel
  * across shards, like every other per-group window in this engine.
  */
object Packing {

  def pack(docs: DataFrame, idCol: String, tokenCountCol: String,
           windowTokens: Long, shardCols: Seq[String] = Seq.empty): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val w = (if (shardCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(shardCols.map(col): _*))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("prefix_tokens",
        sum(col(tokenCountCol)).over(w) - col(tokenCountCol))
      .withColumn("bin_id", expr(s"prefix_tokens DIV $windowTokens"))
      .withColumn("bin_offset", expr(s"prefix_tokens % $windowTokens"))
  }
}
