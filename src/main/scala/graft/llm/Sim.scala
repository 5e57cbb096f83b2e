package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (array&lt;float&gt;).
  *
  * Two paths:
  *  - [[cosineKnn]]: brute-force exact top-k — the correctness baseline.
  *    Candidates × queries via a broadcast of the (small) query set, so
  *    the scan side streams once with no shuffle; per-pair math is pure
  *    built-in `zip_with`/`aggregate` (codegen'd, sequential fold — the
  *    float math is bit-reproducible across engines).
  *  - [[lshBuckets]] / [[annKnn]]: random-hyperplane LSH — the scale
  *    path. Each vector hashes to a signature of sign bits; at 100 TB,
  *    candidate generation becomes an equi-join on bucket id (shuffle
  *    O(n), not O(n²)). Hyperplanes are deterministic code-level
  *    constants (seeded), so plans are stable across runs.
  */
object Sim {

  /** Cast array&lt;float&gt; → array&lt;double&gt; (exact). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold sum — deterministic accumulation order. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (s, x) => s + x)

  def dot(a: Column, b: Column): Column = fsum(zip_with(a, b, (x, y) => x * y))
  def norm(a: Column): Column = sqrt(fsum(transform(a, x => x * x)))
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact cosine top-k: for each query vector (vec_id &lt; nQuery), the k
    * nearest other vectors. Output: (qid, rnk, vec_id, sim). */
  def cosineKnn(emb: DataFrame, nQuery: Int, k: Int): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", norm(col("v")))
    val q = v.select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
      .where(col("qid") < nQuery)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("v"), col("qv"), col("norm"), col("qnorm")).as("sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "sim")
  }

  /** Exact cosine top-k via the native codegen'd
    * [[graft.functions.CosineSim]] expression — same plan shape and
    * bit-identical results as [[cosineKnn]], with the per-pair math in a
    * fused whole-stage-codegen loop instead of interpreted HOF lambdas. */
  def cosineKnnNative(emb: DataFrame, nQuery: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.VectorExprs.register(spark)
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = v.select(col("vec_id").as("qid"), col("v").as("qv"))
      .where(col("qid") < nQuery)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    v.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorExprs.cosineSim("v", "qv").as("sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "sim")
  }

  /** Deterministic pseudo-random hyperplanes: nPlanes × dim doubles. */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(1337)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id: bit j = [v · plane_j > 0]. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val ps = planes(nPlanes, dim)
    (0 until nPlanes).map { j =>
      val d = fsum(transform(sequence(lit(0), lit(dim - 1)),
        i => element_at(v, i + lit(1)) * element_at(typedLit(ps(j).toSeq), i + lit(1))))
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Bucket histogram — the partition-health diagnostic for the ANN path
    * (bucket skew is what kills the equi-join at scale). */
  def lshBuckets(emb: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), lshBucket(col("v"), nPlanes, dim).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))

  /** Approximate kNN: exact cosine ranking restricted to same-bucket
    * candidates (recall traded for a shuffle-sized candidate set). */
  def annKnn(emb: DataFrame, nQuery: Int, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    val q = v.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("norm").as("qnorm"), col("bucket"))
      .where(col("qid") < nQuery)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    v.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("v"), col("qv"), col("norm"), col("qnorm")).as("sim"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "sim")
  }
}
