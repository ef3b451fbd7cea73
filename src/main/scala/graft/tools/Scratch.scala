package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev scratchpad for stage-level timing experiments (not shipped API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-scratch")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    val minJaccard = 0.5

    val sigs0 = docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
      .select(col("doc_id"), sort_array(transform(col("__sh"), s => hash60(s))).as("hs"))
      .withColumn("n_sh", size(col("hs")))
      .withColumn("prefix_len",
        (col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1).cast("int"))
    val sigs = time("sigs localCheckpoint")(sigs0.localCheckpoint())
    val prefix = sigs
      .select(col("doc_id"), col("n_sh"),
        posexplode(slice(col("hs"), lit(1), col("prefix_len"))).as(Seq("pos", "h")))
      .repartition(col("h"))
    val a = prefix.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"),
      col("pos").as("pos_a"), col("h"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"),
      col("pos").as("pos_b"), col("h"))
    val joined = a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b"))
    val nRaw = time("raw join count")(joined.count())
    println(s"[scratch] raw join rows=$nRaw")
    val alpha = ceil(lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")))
    val safeBound = least(col("pos_a"), col("pos_b")) + 1 +
      least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) - 1
    val lenF = least(col("n_a"), col("n_b")) >=
      lit(minJaccard) * greatest(col("n_a"), col("n_b"))
    val nLen = time("join + length filter")(joined.filter(lenF).count())
    val nPos = time("join + positional filter")(joined.filter(safeBound >= alpha).count())
    val nBoth = time("join + both filters")(joined.filter(lenF).filter(safeBound >= alpha).count())
    println(s"[scratch] len=$nLen pos=$nPos both=$nBoth")
    val cand = joined.filter(lenF).filter(safeBound >= alpha)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min_by(lit(1) + least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) - 1,
        col("h")).as("first_bound"), max(alpha).as("alpha"))
      .filter(col("first_bound") >= col("alpha"))
      .select(col("doc_a"), col("doc_b"))
    val nc = time("candidates count")(cand.count())
    println(s"[scratch] n_cand=$nc")
    val sets = sigs.select(col("doc_id"), col("hs"), col("n_sh"))
    graft.plans.GraftExtensions.register(spark)
    val fin = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        call_function("sorted_intersect_count", col("hs_a"), col("hs_b")).as("n_inter"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
      .withColumn("jaccard",
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
    val nf = time("verify+final count")(fin.count())
    println(s"[scratch] final rows=$nf")
    time("end-to-end again") {
      val s2 = sigs0.localCheckpoint()
      val p2 = s2.select(col("doc_id"), col("n_sh"),
        posexplode(slice(col("hs"), lit(1), col("prefix_len"))).as(Seq("pos", "h")))
        .repartition(col("h"))
      val a2 = p2.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("pos").as("pos_a"), col("h"))
      val b2 = p2.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("pos").as("pos_b"), col("h"))
      val c2 = a2.join(b2, Seq("h")).filter(col("doc_a") < col("doc_b"))
        .filter(least(col("n_a"), col("n_b")) >= lit(minJaccard) * greatest(col("n_a"), col("n_b")))
        .filter(least(col("pos_a"), col("pos_b")) + 1 +
          least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) - 1 >=
          ceil(lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b"))))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(min_by(lit(1) + least(col("n_a") - col("pos_a"), col("n_b") - col("pos_b")) - 1,
          col("h")).as("first_bound"),
          max(ceil(lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")))).as("alpha"))
        .filter(col("first_bound") >= col("alpha"))
        .select(col("doc_a"), col("doc_b"))
      val st = s2.select(col("doc_id"), col("hs"), col("n_sh"))
      c2.join(st.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("n_sh").as("n_a")), "doc_a")
        .join(st.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("n_sh").as("n_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          call_function("sorted_intersect_count", col("hs_a"), col("hs_b")).as("n_inter"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
        .withColumn("jaccard",
          round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= minJaccard).count()
    }
    spark.stop()
  }
}
