package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for a training-data pipeline: token-
  * budget shard packing and deterministic stratified sampling. Both are
  * pure arithmetic over the corpus — fully DuckDB-oracle-able.
  */
object Pack {

  /** Token-budget sequence packing — the LLM-pretraining "concatenate
    * and cut" pattern: documents are concatenated in doc_id order and
    * cut every `budget` tokens; each document is assigned to the shard
    * containing its first token. Output: (doc_id, n_tokens, shard).
    *
    * Scale posture: a naive `Window.orderBy(doc_id)` running sum is a
    * single-partition bottleneck. This is the classic two-phase
    * distributed prefix sum instead: range-partition by doc_id,
    * per-partition running sums (parallel), then add broadcast partition
    * offsets (a tiny nPartitions-row table). The result is independent
    * of the partition boundaries, so the plan scales horizontally while
    * staying deterministic. */
  def shardPack(docs: DataFrame, budget: Long, nPartitions: Int = 32): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
    // Range partitioning makes partition index order == doc_id range
    // order, which the offset pass below relies on.
    val parts = toks.repartitionByRange(nPartitions, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("local_cum", sum("n_tokens").over(wLocal))
    // Partition totals: nPartitions rows — the only single-partition
    // step, over a table the size of the partition count.
    val offsets = local.groupBy("pid").agg(sum("n_tokens").as("ptotal"))
      .withColumn("offset", coalesce(
        sum("ptotal").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), "pid")
      .withColumn("cum", col("local_cum") + col("offset"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $budget").as("shard"))
  }

  /** Single-window reference implementation of [[shardPack]] — the
    * equivalence oracle for the distributed prefix sum (and the shape
    * the DuckDB oracle uses). Not for production: one global window
    * partition. */
  def shardPackNaive(docs: DataFrame, budget: Long): DataFrame = {
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) DIV $budget").as("shard"))
  }

  /** Deterministic stratified sampling: per-stratum (language) keep
    * rates, membership decided by a Knuth multiplicative hash of the
    * document id — no RNG state, identical output on any engine,
    * cluster, or retry (sampleBy's Bernoulli draw is engine-specific;
    * reproducible sampling wants pure arithmetic). Keep iff
    * (doc_id · 2654435761) mod 2³² mod 100 < rate(lang). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("__h",
        pmod(pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)), lit(100L)))
      .where(col("__h") < rate)
      .drop("__h")
  }
}
