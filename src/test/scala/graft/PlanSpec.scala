package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the scale paths — the properties
  * that matter at 1000 executors, pinned so a refactor can't silently
  * regress them. Plans are inspected after an action so AQE has
  * finalized. */
class PlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q36 at-scale: bucket-cap window and both self-join sides reuse ONE shuffle") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale join shape
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val p = finalPlan(llm.Sim.cosineNearDupsLsh(emb, 0.35))
      assert(p.contains("ReusedExchange"),
        "cap filter + self-join must share the (t, bucket) exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q37 broadcasts the tiny query side (corpus streams once)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val p = finalPlan(llm.Sim.annKnn(emb, nQuery = 10, k = 5))
    assert(p.contains("BroadcastHashJoin"), "candidate join must be broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join on the corpus side")
  }

  test("q39 prefix sum is range-partitioned, not a single global window") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = finalPlan(llm.Pack.shardPack(docs, 4096))
    assert(p.toLowerCase.contains("rangepartitioning"),
      "running sums must distribute over doc_id ranges")
  }
}
