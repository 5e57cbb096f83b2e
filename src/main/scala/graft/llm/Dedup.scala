package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora: token-shingling,
  * MinHash + LSH banding, SimHash, and exact n-gram Jaccard.
  *
  * Scale posture (100 TB): signatures are computed per-row with
  * higher-order array functions (no shuffle, codegen'd); the only
  * shuffles are (a) the LSH band-bucket equi-join — shuffle volume is
  * O(docs × bands), not O(docs²) — and (b) the final candidate-pair
  * verification join, whose input is only the candidate set. Hot buckets
  * (boilerplate-heavy corpora) are the skew risk: AQE skew-join handles
  * moderate cases; for extreme ones, cap bucket size before the
  * pair-expansion (see [[minhashCandidates]]'s `maxBucket`).
  */
object Dedup {

  /** Distinct k-token shingles over a *bound* token-array lambda
    * variable. try_element_at: tail windows run past the array end (ANSI
    * mode would throw); the truncated shingles they produce are sliced
    * off. */
  private def shinglesOf(ts: Column, k: Int): Column = {
    val all = transform(ts, (_, i) =>
      concat_ws(" ", (1 to k).map(j => try_element_at(ts, i + lit(j))): _*))
    array_distinct(slice(all, lit(1), greatest(size(ts) - lit(k - 1), lit(0))))
  }

  /** Distinct k-token shingles of `text` (space tokenization; shorter-
    * than-k docs yield no shingles) — higher-order-function form, kept
    * as the independent oracle for the native codegen'd
    * [[graft.functions.ShingleArray]] (which the pipelines use; the HOF
    * form evaluates interpreted and measured ~2× of q18's runtime).
    *
    * The split array is bound once through a single-element transform:
    * a lambda body that references an outer *expression* (rather than a
    * lambda variable) re-evaluates it per element — with `split(text)`
    * referenced inside the per-token window that is O(len²) re-splitting
    * per row (measured 10×+ slowdown). */
  def shingles(text: Column, k: Int): Column =
    element_at(transform(array(split(text, " ", -1)), ts => shinglesOf(ts, k)), 1)

  /** The native fused-loop shingle expression as a Column over `df`'s
    * session (registers the function on first use). */
  private def nativeShingles(df: DataFrame, textCol: String, k: Int): Column = {
    graft.functions.TextExprs.register(df.sparkSession)
    graft.functions.TextExprs.shingles(textCol, k)
  }

  /** LSH candidate pairs via one-permutation-style MinHash (Li et al.,
    * "One Permutation Hashing", NIPS 2012 — flavor, not a port): each
    * shingle is hashed once; the 64-bucket partition of the hash space
    * replaces 64 independent permutations (min per bucket ≈ one
    * signature row), and bands of `bandSize` adjacent bucket-mins form
    * the LSH keys. The whole pipeline is exploded rows + HashAggregates
    * (whole-stage codegen), never per-row array folds — the 64-perm
    * array formulation evaluates interpreted and was ~20× slower.
    *
    * Scale: shuffle volume is O(shingles) then O(docs × buckets); the
    * candidate join is an equi-join on (band, band hash). `maxBucket`
    * drops degenerate buckets (all-identical boilerplate) before the
    * quadratic intra-bucket pair expansion.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                        maxBucket: Int = 1000): DataFrame =
    minhashCandidatesFromShingles(
      docs.select(col(idCol).as("doc_id"), nativeShingles(docs, textCol, k).as("sh")),
      nBuckets, bandSize, maxBucket)

  /** [[minhashCandidates]] over a pre-computed (doc_id, sh) shingle
    * table, so callers that also need the shingle arrays (e.g. the exact-
    * Jaccard verification in [[minhashNearDups]]) express the shingling
    * once instead of twice. */
  def minhashCandidatesFromShingles(sh: DataFrame, nBuckets: Int = 64,
                                    bandSize: Int = 4,
                                    maxBucket: Int = 1000): DataFrame = {
    val hashed = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val bucketMins = hashed
      .groupBy(col("doc_id"), pmod(col("h"), lit(nBuckets)).as("bucket"))
      .agg(min(col("h")).as("mh"))
    val bandKeys = bucketMins
      .groupBy(col("doc_id"), (col("bucket") / lit(bandSize)).cast("int").as("band"))
      .agg(xxhash64(sort_array(collect_list(struct(col("bucket"), col("mh"))))).as("bkey"))
    val buckets = bandKeys.groupBy("band", "bkey")
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(col("ids")).as("d1"), col("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .where(col("d1") < col("d2"))
      .distinct()
  }

  /** MinHash near-dup pairs verified with exact Jaccard ≥ threshold.
    * Output: (d1, d2, jaccard). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      nativeShingles(docs, textCol, k).as("sh"))
    val cands = minhashCandidatesFromShingles(sh, nBuckets, bandSize)
    cands
      .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("double").as("inter"),
        (size(col("sh1")) + size(col("sh2"))).cast("double").as("total"))
      .select(col("d1"), col("d2"),
        (col("inter") / (col("total") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Per-token hash array for [[simhash]] — materialize in its own
    * projection (referenced 64 times downstream). */
  def tokenHashes(text: Column): Column =
    transform(filter(split(text, " ", -1), t => t =!= ""), t => xxhash64(t))

  /** 64-bit SimHash over a *materialized* token-hash array: each bit
    * votes ±1 per token, sign of the vote sum becomes the output bit.
    * Entirely per-row (no shuffle). Implemented as 64 scalar folds over
    * the long array — higher-order functions evaluate interpreted, and
    * scalar folds avoid the per-element array allocation a single
    * vector-fold formulation would pay. */
  def simhash(hs: Column): Column =
    (0 until 64).map { j =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << j)) =!= 0, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** SimHash per document via exploded rows + one HashAggregate with 64
    * conditional sums — the whole-stage-codegen formulation of
    * [[simhash]] (interpreted per-row folds measured several × slower).
    * Output: (doc_id, simhash). One shuffle keyed by doc id with map-side
    * partial aggregation; scales like any count-style aggregate. */
  def simhashAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val votes = (0 until 64).map(j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, lit(1L)).otherwise(lit(-1L)))
        .as(s"v$j"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(tokenHashes(col(textCol))).as("h"))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** SimHash near-dup pairs: 4×16-bit band join (a pair within Hamming
    * distance ≤ 3 of a 64-bit hash must agree on ≥1 of 4 bands — here we
    * use bands as a candidate generator for distance ≤ maxDist, then
    * verify with exact bit_count(xor)). */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sh = simhashAgg(docs, idCol, textCol)
      .select(col("doc_id"), col("simhash").as("sh"))
    val banded = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "bkey")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** Exact all-pairs n-gram Jaccard over a bounded id range (the
    * brute-force baseline that oracles the MinHash path). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, maxId: Long): DataFrame = {
    val sh = docs.where(col(idCol) < maxId)
      .select(col(idCol).as("doc_id"), nativeShingles(docs, textCol, k).as("sh"))
      .where(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val b = sh.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("inter"),
        size(col("sh1")).cast("long").as("n1"), size(col("sh2")).cast("long").as("n2"))
      .where(col("inter") > 0)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))).as("jaccard"))
  }
}
