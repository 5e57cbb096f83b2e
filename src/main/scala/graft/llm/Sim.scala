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

  /** Embedding-cosine near-duplicate pairs over a bounded id range —
    * the exact baseline (DuckDB-oracled). The scale path replaces the
    * id-bounded cross join with the [[lshBucket]] equi-join (see
    * [[cosineNearDupsLsh]]). Output: (v1, v2, sim), v1 &lt; v2. */
  def cosineNearDups(emb: DataFrame, maxId: Long, threshold: Double): DataFrame = {
    val v = emb.where(col("vec_id") < maxId)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", norm(col("v")))
    val a = v.select(col("vec_id").as("v1"), col("v").as("va"), col("norm").as("na"))
    val b = v.select(col("vec_id").as("v2"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Embedding-cosine near-dup at scale: candidates restricted to equal
    * LSH sign-buckets (shuffle O(n) instead of O(n²) pairs), verified
    * with exact cosine. Recall is governed by nPlanes (fewer planes →
    * larger buckets → higher recall, more verification work). */
  def cosineNearDupsLsh(emb: DataFrame, threshold: Double,
                        nPlanes: Int, dim: Int): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), nPlanes, dim))
    val a = v.select(col("bucket"), col("vec_id").as("v1"), col("v").as("va"), col("norm").as("na"))
    val b = v.select(col("bucket"), col("vec_id").as("v2"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("bucket"))
      .where(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** IVF-flat approximate kNN — the other scale path (coarse quantizer +
    * probed inverted lists). Centroids are the first `nlist` vectors
    * (deterministic seed set; a production pipeline would k-means-refine
    * them — the dataflow is identical): every vector is assigned to its
    * nearest centroid (one broadcast pass), queries probe the `nprobe`
    * nearest lists, and exact cosine ranks within the probed union.
    * Candidate work per query is ~nprobe/nlist of the corpus. */
  def ivfKnn(emb: DataFrame, nQuery: Int, k: Int,
             nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", norm(col("v")))
    val centroids = v.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cn"))
    // assign: argmax centroid cosine per vector (broadcast nlist rows)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid").asc)
    val assigned = v.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("norm"), col("cid"),
        cosine(col("v"), col("cv"), col("norm"), col("cn")).as("csim"))
      .withColumn("r", row_number().over(wAssign))
      .where(col("r") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cid"))
    // probe lists: nprobe nearest centroids per query vector
    val q = v.where(col("vec_id") < nQuery)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val wProbe = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qv"), col("qnorm"), col("cid"),
        cosine(col("qv"), col("cv"), col("qnorm"), col("cn")).as("csim"))
      .withColumn("r", row_number().over(wProbe))
      .where(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("qnorm"), col("cid"))
    // rank exact cosine within the probed lists
    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(probes, Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("v"), col("qv"), col("norm"), col("qnorm")).as("sim"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "rnk", "vec_id", "sim")
  }

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
