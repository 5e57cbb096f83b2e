package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an edge DataFrame — the workload class
  * the reference's MapReduce lineage (Lin &amp; Dyer ch. 5, see PAPERS.md)
  * treats as the canonical "beyond one job" composition: a fixed number
  * of shuffle-on-key rounds where round t+1 consumes round t's output.
  *
  * Complements [[graft.llm.Dedup.connectedComponents]] (data-dependent
  * fixpoint, driver checks convergence): PageRank runs a FIXED iteration
  * count, so the whole computation is declared as ONE Catalyst plan with
  * zero driver-side actions — Catalyst sees every round, reuses the
  * edge/out-weight exchanges across rounds, and AQE re-plans each round's
  * join at runtime. For deep iteration counts (say &gt; 10) production
  * would insert `localCheckpoint` every few rounds to bound plan depth
  * (the q47 Lloyd's-iteration pattern); at the typical 3–10 analytic
  * rounds the single declarative plan is strictly better.
  */
object Graph {

  /** Weighted PageRank with dangling-mass redistribution
    * (Page et al., "The PageRank citation ranking", Stanford 1999):
    *
    *   r_{t+1}(j) = (1-d)/N + d · (Σ_{i→j} r_t(i)·w_ij/outw_i + D_t/N)
    *
    * where `D_t` is the rank mass sitting on dangling nodes (no
    * out-edges). Per round: one equi-join of edges to ranks on `src`
    * (shuffle O(edges) — at 100 TB both sides hash-partition on the
    * join key and a bucketed edge layout makes the edge side
    * exchange-free, the q53 contract), one hash-agg on `dst`, and a
    * 1-row dangling aggregate broadcast back — never a driver scalar.
    *
    * Cross-engine float parity: per-node contribution sums go through
    * [[Queries.dsum]] (order-independent DECIMAL(38,12) accumulation);
    * every other step is a correctly-rounded IEEE op on identical
    * inputs, so ranks stay bit-identical across engines at EVERY
    * iteration, and the final `round(.,6)` is cosmetic. The teleport
    * constant is passed to the oracle via Scala's shortest-round-trip
    * double printing, so `1.0 - damping`'s ulp (0.15000000000000002)
    * is faithfully shared rather than silently diverging from a
    * hand-written `0.15` literal.
    *
    * @param edges columns `src`, `dst` (any equatable type), `weight`
    *              (integral — summed exactly as LONG)
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"), col("weight"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nc = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outw = e.groupBy("src").agg(sum(col("weight")).as("outw"))
    var ranks = nodes.crossJoin(broadcast(nc))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iters) {
      val sums = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outw, "src")
        .select(col("dst").as("node"),
          (col("rank") * col("weight") / col("outw")).as("term"))
        .groupBy("node").agg(Queries.dsum(col("term")).as("s"))
      val dang = ranks
        .join(outw, ranks("node") === outw("src"), "left_anti")
        .agg(coalesce(Queries.dsum(col("rank")), lit(0.0)).as("dmass"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(dang)).crossJoin(broadcast(nc))
        .select(col("node"),
          (lit(1.0 - damping) / col("n")
            + lit(damping)
              * (coalesce(col("s"), lit(0.0)) + col("dmass") / col("n")))
            .as("rank"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
