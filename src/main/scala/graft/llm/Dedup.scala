package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Fan-out of the lossless oversized-bucket spill in
    * [[prefixFilterJoin]] / [[fuzzyJoin]]: a bucket past its in-task
    * threshold self-joins on (key, salt) with the probe side pinned to
    * one of these salts and the build side replicated across all of
    * them, spreading the bucket's quadratic pair set over this many
    * tasks. 64 ≈ 2× the local-mode parallelism; at cluster scale it
    * bounds replication (build rows × 64) while still splitting any
    * realistic degenerate bucket. */
  val SpillSalts = 64

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
    * once instead of twice.
    *
    * Every hash is the portable [[graft.functions.Fnv1a32]] (round-4
    * change from xxhash64): the per-shingle hash, and the band key — a
    * re-hash of the band's canonical `bucket:min|bucket:min` signature
    * string (sorted by bucket, so it is order-independent). DuckDB
    * recomputes both bit-for-bit (`string_agg(... ORDER BY bucket)` +
    * the same FNV fold), which is what lets the q18 gate row carry a
    * full value oracle instead of `no_oracle`. Re-hashing the signature
    * keeps the shuffle key an 8-byte long rather than a ~40-byte string;
    * a band-key collision merges two buckets in BOTH engines identically
    * and is then discarded by the exact-Jaccard verify, so it can affect
    * neither correctness nor cross-engine parity. */
  def minhashCandidatesFromShingles(sh: DataFrame, nBuckets: Int = 64,
                                    bandSize: Int = 4,
                                    maxBucket: Int = 1000): DataFrame = {
    val bandKeys = bandKeysFromShingles(sh, nBuckets, bandSize)
    val buckets = bandKeys.groupBy("band", "bkey")
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(col("ids")).as("d1"), col("ids"))
      .select(col("d1"), explode(col("ids")).as("d2"))
      .where(col("d1") < col("d2"))
      .distinct()
  }

  /** The (doc_id, band, bkey) LSH band-key table over a pre-computed
    * shingle frame — the signature every MinHash path shares: q18's
    * intra-corpus candidate join consumes it directly, and the
    * incremental path persists it as the cross-batch signature store.
    * See [[minhashCandidatesFromShingles]]'s scaladoc for why the band
    * key is an FNV re-hash of the canonical `bucket:min|…` signature
    * string (8-byte shuffle keys; collision-safe under the exact
    * verify; bit-identical in DuckDB). */
  def bandKeysFromShingles(sh: DataFrame, nBuckets: Int = 64,
                           bandSize: Int = 4): DataFrame = {
    graft.functions.HashExprs.register(sh.sparkSession)
    val hashed = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), graft.functions.HashExprs.fnv1a32("s").as("h"))
    val bucketMins = hashed
      .groupBy(col("doc_id"), pmod(col("h"), lit(nBuckets)).as("bucket"))
      .agg(min(col("h")).as("mh"))
    bucketMins
      .groupBy(col("doc_id"), (col("bucket") / lit(bandSize)).cast("int").as("band"))
      .agg(concat_ws("|", transform(
        sort_array(collect_list(struct(col("bucket"), col("mh")))),
        e => concat_ws(":", e.getField("bucket"), e.getField("mh")))).as("sig"))
      .select(col("doc_id"), col("band"),
        graft.functions.HashExprs.fnv1a32("sig").as("bkey"))
  }

  /** The persisted half of incremental dedup: batch N−1's band keys
    * grouped into (band, bkey, ids) bucket rows — the "signature store"
    * a production pipeline keeps between crawls so each new batch is
    * deduped against ALL history without ever re-shingling it.
    * Degenerate buckets (> maxBucket ids — boilerplate black holes) are
    * dropped at store-build time, so no future probe can quadratically
    * expand them. */
  def minhashSignatureStore(docs: DataFrame, idCol: String, textCol: String,
                            k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                            maxBucket: Int = 1000): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      nativeShingles(docs, textCol, k).as("sh"))
    bandKeysFromShingles(sh, nBuckets, bandSize)
      .groupBy("band", "bkey")
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) <= maxBucket)
  }

  /** The store-UPDATE half of the incremental-dedup lifecycle: fold a
    * new batch's band keys into an existing [[minhashSignatureStore]]
    * frame, producing the store the NEXT batch probes. One full-outer
    * equi-join on exactly (band, bkey): with the store side bucketed by
    * that key it joins exchange-free (PlanSpec-pinned), the new batch's
    * keys are grouped and shuffled once — update cost is O(new batch),
    * never O(history), which is what makes the store maintainable at
    * 100 TB (rebuilding from scratch re-shingles all history).
    *
    * Cap semantics: a bucket whose MERGED id list exceeds `maxBucket`
    * is dropped, same rule as the initial build. The cap schedule is
    * per-generation (a bucket dropped at generation N re-enters with
    * only later ids if it shrinks below the cap) — at the declared
    * parameters a bucket needs >1000 colliding docs to diverge from
    * the recompute-from-scratch store, and the q100 oracle recomputes
    * from scratch, so the gate row proves the schedules coincide on
    * real data; a pipeline wanting exact cap fidelity would keep
    * (band, bkey, n) tombstones for dropped buckets — same join shape. */
  def mergeSignatureStore(store: DataFrame, fresh: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                          maxBucket: Int = 1000,
                          storeBuckets: Int = 0): DataFrame = {
    val freshSh = fresh.select(col(idCol).as("doc_id"),
      nativeShingles(fresh, textCol, k).as("sh"))
    val rawKeys = bandKeysFromShingles(freshSh, nBuckets, bandSize)
    // Pre-partition the new keys to the store's bucket COUNT (the
    // caller wrote the store, so it knows): the groupBy then reuses
    // that partitioning and the join's ENSURE_REQUIREMENTS is already
    // met — one (band, bkey) exchange on the new side instead of two
    // (groupBy at spark.sql.shuffle.partitions, then a re-shuffle to
    // match the bucketed side's partition count). PlanSpec-pinned.
    val aligned = if (storeBuckets > 0)
      rawKeys.repartition(storeBuckets, col("band"), col("bkey")) else rawKeys
    val newKeys = aligned
      .groupBy("band", "bkey")
      .agg(collect_list(col("doc_id")).as("new_ids"))
    val empty = typedLit(Seq.empty[Long])
    store.join(newKeys, Seq("band", "bkey"), "full_outer")
      .select(col("band"), col("bkey"),
        concat(coalesce(col("ids"), empty),
          coalesce(col("new_ids"), empty)).as("ids"))
      .where(size(col("ids")) <= maxBucket)
  }

  /** Incremental near-dup dedup: probe a NEW batch against a persisted
    * signature store of all prior batches — the production shape of
    * E15 (a crawl pipeline never re-deduplicates 100 TB of history per
    * increment; it keeps the band-key store and probes it).
    *
    * `store` is a [[minhashSignatureStore]] frame (typically read back
    * from its bucketed table — see the q75 declaration); `history`
    * supplies raw text only for the exact-Jaccard verify of the
    * candidates, which are ≪ batch at production thresholds. Scale: the
    * probe is an equi-join on (band, bkey) — with the store bucketed by
    * exactly (band, bkey) its side joins exchange-free (a strict-subset
    * bucket key gets `Bucketed: false (disabled by query planner)` and
    * re-shuffles — PlanSpec-pinned); shuffle volume is O(new-batch band
    * keys), never O(history).
    *
    * Output: (doc_id, dup_of, jaccard) — new docs near-duplicating a
    * historical doc; anti-joining the new batch on doc_id gives the
    * keep set. */
  def incrementalNearDups(fresh: DataFrame, store: DataFrame,
                          history: DataFrame, idCol: String, textCol: String,
                          k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                          threshold: Double = 0.5): DataFrame = {
    val freshSh = fresh.select(col(idCol).as("doc_id"),
      nativeShingles(fresh, textCol, k).as("sh"))
    val cands = bandKeysFromShingles(freshSh, nBuckets, bandSize)
      .join(store, Seq("band", "bkey"))
      .select(col("doc_id"), explode(col("ids")).as("dup_of"))
      .distinct()
    graft.functions.TextExprs.register(fresh.sparkSession)
    cands
      .join(fresh.select(col(idCol).as("doc_id"), col(textCol).as("__tf")), "doc_id")
      .join(history.select(col(idCol).as("dup_of"), col(textCol).as("__th")), "dup_of")
      .select(col("doc_id"), col("dup_of"),
        graft.functions.TextExprs.shingles("__tf", k).as("shf"),
        graft.functions.TextExprs.shingles("__th", k).as("shh"))
      .select(col("doc_id"), col("dup_of"),
        size(array_intersect(col("shf"), col("shh"))).cast("double").as("inter"),
        (size(col("shf")) + size(col("shh"))).cast("double").as("total"))
      .select(col("doc_id"), col("dup_of"),
        (col("inter") / (col("total") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash near-dup pairs verified with exact Jaccard ≥ threshold.
    *
    * The exact-Jaccard verify joins candidate ids back to the RAW text
    * and recomputes shingles only there: candidates are ≪ corpus at
    * production thresholds, so this computes the (expensive) shingle
    * expression for the full corpus exactly ONCE — joining the shingle
    * table itself on both sides re-evaluated it corpus-wide per side
    * (projections sit below the join), measured ~40% of q18's runtime.
    * Output: (d1, d2, jaccard). */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                      threshold: Double = 0.5,
                      maxBucket: Int = 1000): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      nativeShingles(docs, textCol, k).as("sh"))
    val cands = minhashCandidatesFromShingles(sh, nBuckets, bandSize, maxBucket)
    val txt = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    graft.functions.TextExprs.register(docs.sparkSession)
    cands
      .join(txt.select(col("doc_id").as("d1"), col("__t").as("__t1")), "d1")
      .join(txt.select(col("doc_id").as("d2"), col("__t").as("__t2")), "d2")
      .select(col("d1"), col("d2"),
        graft.functions.TextExprs.shingles("__t1", k).as("sh1"),
        graft.functions.TextExprs.shingles("__t2", k).as("sh2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("double").as("inter"),
        (size(col("sh1")) + size(col("sh2"))).cast("double").as("total"))
      .select(col("d1"), col("d2"),
        (col("inter") / (col("total") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Per-token portable-hash array (whitespace tokens, empties dropped)
    * — the interpreted HOF twin of the exploded projection inside
    * [[simhashAgg]], kept as its independent test oracle. `seed` selects
    * the FNV stream (the 64-bit signature uses two 32-bit streams). */
  def tokenHashes(textCol: String, seed: Long = graft.functions.Fnv1a32.Seed): Column =
    expr(s"transform(filter(split($textCol, ' ', -1), t -> t != ''), " +
      s"t -> fnv1a32(t, ${seed}L))")

  /** 32-bit SimHash word over a *materialized* token-hash array: each of
    * 32 bits votes ±1 per token, sign of the vote sum becomes the output
    * bit. Entirely per-row (no shuffle). Implemented as 32 scalar folds
    * over the long array — higher-order functions evaluate interpreted,
    * and scalar folds avoid the per-element array allocation a single
    * vector-fold formulation would pay. Test oracle for [[simhashAgg]]. */
  def simhash32(hs: Column): Column =
    (0 until 32).map { j =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << j)) =!= 0, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** 64-bit SimHash per document as TWO 32-bit words (sh_hi, sh_lo),
    * each from an independently-seeded [[graft.functions.Fnv1a32]]
    * stream over the tokens. Two words rather than one packed long
    * because the packed form (hi·2³² + lo) overflows DuckDB's BIGINT
    * when hi ≥ 2³¹ — with both words in [0, 2³²) every value is
    * engine-portable, which is what lets the q19 gate row carry a full
    * value oracle (round-4 change from xxhash64/no_oracle).
    *
    * Execution: exploded rows + one HashAggregate with 64 conditional
    * sums — the whole-stage-codegen formulation (interpreted per-row
    * folds measured several × slower). One shuffle keyed by doc id with
    * map-side partial aggregation; scales like any count-style agg. */
  def simhashAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    def votes(h: String, p: String) = (0 until 32).map(j =>
      sum(when(shiftright(col(h), j).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L))).as(s"$p$j"))
    def word(p: String) = (0 until 32).map(j =>
      when(col(s"$p$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val all = votes("h2", "u") ++ votes("h1", "l")
    docs
      .select(col(idCol).as("doc_id"),
        explode(expr(s"filter(split($textCol, ' ', -1), t -> t != '')")).as("tok"))
      .select(col("doc_id"),
        graft.functions.HashExprs.fnv1a32("tok").as("h1"),
        graft.functions.HashExprs.fnv1a32("tok", graft.functions.Fnv1a32.Seed2).as("h2"))
      .groupBy("doc_id")
      .agg(all.head, all.tail: _*)
      .select(col("doc_id"), word("u").as("sh_hi"), word("l").as("sh_lo"))
  }

  /** SimHash near-dup pairs: 4×16-bit band join over the two signature
    * words (a pair within Hamming distance ≤ 3 of a 64-bit hash must
    * agree on ≥1 of 4 bands — the bands are the candidate generator,
    * then exact `bit_count(xor)` over both words verifies ≤ maxDist).
    * For maxDist &gt; 3 band-collision recall is partial (standard LSH
    * trade-off); the declared q54 oracle replicates the identical
    * banding, so the gate checks operator parity at any maxDist.
    * Output: (d1, d2, hamming), d1 &lt; d2. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val sh = simhashAgg(docs, idCol, textCol)
    val banded = sh.select(col("doc_id"), col("sh_hi"), col("sh_lo"),
      posexplode(array(
        col("sh_lo").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("sh_lo"), 16),
        col("sh_hi").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("sh_hi"), 16))).as(Seq("band", "bval")))
    // Candidate expansion as ONE groupBy + intra-bucket explode (the
    // minhashCandidates shape) rather than a self-join: a self-join
    // re-executes the whole signature aggregation on both sides (the
    // broadcast side's exchange is not reusable — observed 2× the
    // signature cost in the r4 bench), while this computes signatures
    // once and shuffles each banded row once. The size bound is also
    // the skew guard the self-join lacked: a degenerate 16-bit band
    // value (exact-duplicate-heavy corpora) would otherwise expand
    // quadratically.
    val buckets = banded.groupBy("band", "bval")
      .agg(collect_list(struct(col("doc_id"), col("sh_hi"), col("sh_lo"))).as("xs"))
      .where(size(col("xs")) > 1 && size(col("xs")) <= maxBucket)
    buckets
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        (bit_count(col("a.sh_hi").bitwiseXOR(col("b.sh_hi"))) +
          bit_count(col("a.sh_lo").bitwiseXOR(col("b.sh_lo")))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Fuzzy string self-join (entity-resolution shape): candidate pairs
    * via cheap deterministic blocking — (first token, length DIV 4) —
    * then exact Levenshtein verification inside each block. The
    * blocking rule is the recall contract: a pair differing in its
    * first token or by ≥4 length is never compared — precision is
    * exactly 1 (exact verify), recall is corpus-dependent (RecallSpec
    * measures 0.49 on the synthetic anchor-free random-vocab titles;
    * unioning a last-token blocking key lifts only to 0.58 there —
    * real titles share anchors and block far better). Tighten by
    * unioning more blocking keys, each its own cheap pass.
    *
    * Scale: one hash-agg shuffle on the block key; blocks up to
    * `maxBucket` expand in-task via collect_list, LARGER blocks spill
    * through the salted (block, salt) self-join (the
    * [[prefixFilterJoin]] spill) so a degenerate block distributes its
    * quadratic step over [[SpillSalts]] tasks instead of silently
    * dropping pairs — within-block recall is 1 at any block size; the
    * recall contract is the blocking RULE alone. A pair shares at most
    * one block, so no distinct is needed. Output: (d1, d2, dist),
    * d1 < d2. */
  def fuzzyJoin(docs: DataFrame, idCol: String, strCol: String,
                maxDist: Int, maxBucket: Int = 10000): DataFrame = {
    val keyed = docs
      .select(col(idCol).as("doc_id"), col(strCol).as("s"))
      .select(col("doc_id"), col("s"),
        split(col("s"), " ", -1).getItem(0).as("tok1"),
        expr("length(s) DIV 4").as("lb"))
    val bsz = keyed.groupBy("tok1", "lb").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > 1)
    val withSz = keyed.join(bsz, Seq("tok1", "lb"))
    val small = withSz.where(col("bsz") <= maxBucket)
      .groupBy("tok1", "lb")
      .agg(collect_list(struct(col("doc_id"), col("s"))).as("xs"))
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("dist"))
    val big = withSz.where(col("bsz") > maxBucket)
    val bigA = big.withColumn("salt",
      pmod(hash(col("doc_id")), lit(SpillSalts)))
    val bigB = big
      .select(col("tok1"), col("lb"), col("doc_id").as("bid"),
        col("s").as("bs"))
      .withColumn("salt", explode(sequence(lit(0), lit(SpillSalts - 1))))
    val bigPairs = bigA.join(bigB, Seq("tok1", "lb", "salt"))
      .where(col("doc_id") < col("bid"))
      .select(col("doc_id").as("d1"), col("bid").as("d2"),
        levenshtein(col("s"), col("bs")).cast("long").as("dist"))
    small.unionAll(bigPairs).where(col("dist") <= maxDist)
  }

  /** Fellegi–Sunter probabilistic record linkage over the blocked
    * fuzzy-join pairs (Fellegi &amp; Sunter, "A Theory for Record
    * Linkage", JASA 1969 — the model behind every production ER
    * system): each candidate pair carries an agreement vector over
    * three fields (title token-set Jaccard &gt; 0.5, lang equality,
    * source equality), per-field m = P(agree | match) and
    * u = P(agree | non-match) are estimated from the candidate set
    * itself with a tight edit-distance proxy (dist ≤ 2) standing in
    * for the latent match class (the 1-step moment estimate; full FS
    * runs EM over the same counts), and each pair scores the
    * log-likelihood ratio Σₖ ln(mₖ/uₖ) if field k agrees else
    * ln((1−mₖ)/(1−uₖ)) — positive evidence FOR a match, negative
    * against. Laplace smoothing ((c+1)/(n+2)) keeps every probability
    * strictly inside (0,1) so no ln(0) appears even when a proxy
    * class is empty at small scale.
    *
    * Determinism: all inputs to the score are exact integer counts
    * cast to double through fixed-order IEEE arithmetic; ln is the
    * libm parity class (the q120/q143 precedent) and the score emits
    * through the femit lattice. Jaccard guards its denominator with
    * greatest(·,1) — a NaN would compare differently across engines
    * (DuckDB orders NaN high, Spark returns false).
    *
    * Scale: pair generation is [[fuzzyJoin]] (lossless salted-spill
    * blocking); the attribute joins are id-equi; the m/u table is ONE
    * broadcast row. Cost is the pair join everything in this family
    * already pays — the scoring adds a map. */
  def fellegiSunter(docs: DataFrame, maxDist: Int = 10,
                    proxyDist: Int = 2): DataFrame = {
    import graft.rel.Queries.femit
    val titled = docs.select(col("doc_id"), col("lang"), col("source"),
      concat_ws(" ", slice(split(col("text"), " ", -1), 1, 5)).as("title"))
    val pairs = fuzzyJoin(titled.select(col("doc_id"), col("title")),
      "doc_id", "title", maxDist)
    val attrs = titled.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(split(col("title"), " ", -1)).as("toks"))
    val cmp = pairs
      .join(attrs.select(col("doc_id").as("d1"), col("lang").as("l1"),
        col("source").as("s1"), col("toks").as("t1")), "d1")
      .join(attrs.select(col("doc_id").as("d2"), col("lang").as("l2"),
        col("source").as("s2"), col("toks").as("t2")), "d2")
      .select(col("d1"), col("d2"), col("dist"),
        (size(array_intersect(col("t1"), col("t2"))).cast("double") /
          greatest(size(array_union(col("t1"), col("t2"))), lit(1))
            .cast("double") > 0.5).cast("long").as("agr_tok"),
        (col("l1") === col("l2")).cast("long").as("agr_lang"),
        (col("s1") === col("s2")).cast("long").as("agr_src"),
        (col("dist") <= proxyDist).cast("long").as("m_proxy"))
      .localCheckpoint() // feeds the stats aggregate AND the score map
    val stats = cmp.agg(
      sum(col("m_proxy")).as("nm"),
      (count(lit(1)) - sum(col("m_proxy"))).as("nu"),
      sum(col("agr_tok") * col("m_proxy")).as("am_tok"),
      sum(col("agr_lang") * col("m_proxy")).as("am_lang"),
      sum(col("agr_src") * col("m_proxy")).as("am_src"),
      sum(col("agr_tok") * (lit(1) - col("m_proxy"))).as("au_tok"),
      sum(col("agr_lang") * (lit(1) - col("m_proxy"))).as("au_lang"),
      sum(col("agr_src") * (lit(1) - col("m_proxy"))).as("au_src"))
    def m(k: String): Column =
      (col(s"am_$k").cast("double") + lit(1.0)) / (col("nm").cast("double") + lit(2.0))
    def u(k: String): Column =
      (col(s"au_$k").cast("double") + lit(1.0)) / (col("nu").cast("double") + lit(2.0))
    def w(k: String): Column =
      when(col(s"agr_$k") === 1, log(m(k) / u(k)))
        .otherwise(log((lit(1.0) - m(k)) / (lit(1.0) - u(k))))
    cmp.crossJoin(broadcast(stats))
      .select(col("d1"), col("d2"), col("dist"),
        col("agr_tok"), col("agr_lang"), col("agr_src"),
        femit(w("tok") + w("lang") + w("src")).as("score"))
  }

  /** Connected components over a near-dup pair graph — the step that
    * turns pairwise matches into dedup GROUPS (keep the minimum doc id
    * per component, drop the rest): pairs are not transitive-closed, so
    * without it a chain a~b~c dedups to two survivors instead of one.
    *
    * Algorithm: iterative min-label propagation (the Pregel/hash-to-min
    * shape GraphX and large-scale CC papers use — each round every node
    * takes the min of its own and its neighbors' labels) PLUS a
    * pointer-jumping step (label ← label(label), the Shiloach–Vishkin /
    * two-phase CC shortcut): propagation alone needs diameter rounds,
    * the jump doubles the effective reach per round so high-diameter
    * chains (q250's grid paths) converge in ~log(diameter) rounds —
    * measured 17 → 5 rounds on the sf0.1 grid at one extra small
    * self-join per round (labels table is node-grain, ≪ edges). The
    * jump preserves the invariant that a node's label is the id of a
    * reachable component member (labels propagate only within the
    * component; the graph is undirected), so the fixpoint — checked
    * driver-side per round, the standard iterative control loop — is
    * the same min-reachable labeling propagation alone reaches.
    * Per-round `localCheckpoint` truncates lineage (the
    * [[graft.llm.Sim]] k-means pattern); shuffle O(edges) + O(nodes).
    *
    * Output: (doc_id, component) for every doc appearing in a pair;
    * component = min doc id reachable — its canonical survivor. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionAll(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // Convergence is detected INSIDE the per-round aggregate (r15
    // optimization, guide §2.4): each node's previous label rides the
    // union as a second column (non-null only on the node's own labels
    // row, so max() recovers it), and "changed" is a filter on the
    // just-checkpointed next — the old separate next ⋈ labels
    // node-grain shuffle join per round is gone.
    val labelT = labels.schema("label").dataType
    var converged = false
    while (!converged) {
      val msgs = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"),
          lit(null).cast(labelT).as("old"))
      val jump = labels.join(
          labels.select(col("node").as("jn"), col("label").as("jl")),
          col("label") === col("jn"))
        .select(col("node"), col("jl").as("label"),
          lit(null).cast(labelT).as("old"))
      val next = labels.select(col("node"), col("label"),
          col("label").as("old"))
        .unionAll(msgs).unionAll(jump)
        .groupBy("node").agg(min(col("label")).as("label"),
          max(col("old")).as("old"))
        .localCheckpoint()
      converged = next.where(col("label") =!= col("old")).isEmpty
      labels = next.select("node", "label")
    }
    labels.select(col("node").as("doc_id"), col("label").as("component"))
  }

  /** EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al., "Scaling Up All Pairs
    * Similarity Search", WWW 2007; flavor, not a port): finds ALL pairs
    * with shingle-set Jaccard ≥ tauNum/tauDen, with none of LSH's
    * false-negative risk. The filter rests on the overlap bound
    * J(x,y) ≥ τ ⟹ |x∩y| ≥ τ·max(|x|,|y|): order every set by one
    * global canonical order and keep each set's first
    * n − ⌈τ·n⌉ + 1 elements (its "prefix") — any qualifying pair must
    * collide on ≥1 prefix element, so the candidate join touches only
    * prefix tokens. Ordering by ASCENDING document frequency puts the
    * RAREST shingles in the prefix, which is what makes the candidate
    * set small on real corpora.
    *
    * Determinism: the canonical order is (df, shingle) — exact integer
    * counts with the shingle string as total-order tiebreak, so both
    * engines derive the identical prefix. The prefix length is computed
    * in pure integer arithmetic (⌈a/b⌉ = (a+b−1) DIV b) — no float
    * ceil. Because the method is EXACT, the gate oracle does not mimic
    * the prefixes at all: it is the brute-force all-pairs join, which
    * the operator must reproduce verbatim (the strongest possible
    * oracle — a lost candidate is a missing row).
    *
    * Scale: two hash-agg shuffles (df count, per-doc regroup) + the
    * bucket expansion on prefix shingles + a candidates-only verify
    * (the [[minhashNearDups]] convention). Shuffle volume is
    * O(shingles), never O(docs²). `maxBucket` is a ROUTING threshold,
    * not a drop: buckets up to it expand in-task via collect_list
    * (cheapest), LARGER buckets spill through a salted self-join on
    * (gram, salt) so the quadratic candidate set of a degenerate
    * high-df prefix gram is spread across [[SpillSalts]] tasks instead
    * of being silently discarded — the operator stays LOSSLESS at any
    * bucket size, which is what the brute-force all-pairs oracle
    * checks. A pair colliding on both a small and a big gram appears
    * on both paths; the existing distinct collapses it. */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, tauNum: Int = 1, tauDen: Int = 2,
                       maxBucket: Int = 1000): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        nativeShingles(docs, textCol, k).as("sh"))
      .where(size(col("sh")) > 0)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("df"))
    // per-doc shingles in canonical (df, g) order; struct sort gives the
    // deterministic total order (g unique within a doc)
    val prefixes = ex.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ord"))
      .select(col("doc_id"), size(col("ord")).as("n"), expr(
        s"""transform(slice(ord, 1,
           |  size(ord) - ((size(ord) * $tauNum + $tauDen - 1) DIV $tauDen) + 1),
           |  e -> e.g)""".stripMargin).as("pre"))
    // PPJoin filters (both lossless), applied INSIDE the bucket
    // expansion on integers carried in the bucket struct:
    // - SIZE filter: J ≥ τ ⟹ |x∩y| ≥ τ·max(n1,n2) and ≤ min(n1,n2),
    //   so min·tauDen ≥ max·tauNum;
    // - POSITIONAL filter (Xiao et al., "Efficient Similarity Joins
    //   for Near Duplicate Detection", WWW 2008): a collision at
    //   0-based prefix positions (p1, p2) bounds the overlap by
    //   min(n1−p1, n2−p2), which must reach the equivalent-overlap
    //   threshold α = ⌈τ(n1+n2)/(1+τ)⌉ — collisions late in both
    //   prefixes can never reach τ and are dropped before the
    //   distinct/verify ever see them (together 1.3× on the sf0.1 bench —
    //   modest here because the tiny synthetic vocabulary gives near-
    //   uniform doc sizes; Zipfian corpora prune far harder).
    def pairCond(aid: Column, an: Column, ap: Column,
                 bid: Column, bn: Column, bp: Column): Column =
      aid < bid &&
        least(an, bn) * tauDen >= greatest(an, bn) * tauNum &&
        least(an - ap, bn - bp) >=
          floor(((an + bn) * tauNum + lit(tauNum + tauDen - 1))
            / lit(tauNum + tauDen)).cast("int")
    val pre = prefixes
      .select(col("doc_id"), col("n"), posexplode(col("pre")).as(Seq("p", "g")))
    val bsz = pre.groupBy("g").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > 1)
    val withSz = pre.join(bsz, "g")
    val smallCands = withSz.where(col("bsz") <= maxBucket)
      .groupBy("g")
      .agg(collect_list(struct(col("doc_id"), col("n"), col("p"))).as("xs"))
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .where(pairCond(col("a.doc_id"), col("a.n"), col("a.p"),
        col("b.doc_id"), col("b.n"), col("b.p")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    // LOSSLESS spill for buckets past the in-task threshold: a salted
    // self-join on (g, salt) — the probe side pins one salt per doc,
    // the build side replicates across all salts, so each in-bucket
    // pair meets exactly once and the degenerate bucket's quadratic
    // candidate set fans out over SpillSalts tasks.
    val big = withSz.where(col("bsz") > maxBucket)
    val bigA = big.withColumn("salt",
      pmod(hash(col("doc_id")), lit(SpillSalts)))
    val bigB = big
      .select(col("g"), col("doc_id").as("bid"), col("n").as("bn"),
        col("p").as("bp"))
      .withColumn("salt", explode(sequence(lit(0), lit(SpillSalts - 1))))
    val bigCands = bigA.join(bigB, Seq("g", "salt"))
      .where(pairCond(col("doc_id"), col("n"), col("p"),
        col("bid"), col("bn"), col("bp")))
      .select(col("doc_id").as("d1"), col("bid").as("d2"))
    val cands = smallCands.unionAll(bigCands).distinct()
    // JOIN-BASED exact verify: candidate pairs expand onto d1's grams
    // and equi-join d2's gram table to count the intersection — three
    // codegen hash joins + one hash-agg instead of per-pair shingle
    // recomputation and O(n²)-ish array_intersect folds (measured 4.4×
    // on the sf0.1 bench at this corpus's candidate volume; q18 keeps
    // the array verify because LSH candidates are few).
    val sizes = prefixes.select(col("doc_id"), col("n"))
    cands
      .join(ex.select(col("doc_id").as("d1"), col("g")), "d1")
      .join(ex.select(col("doc_id").as("d2"), col("g")), Seq("d2", "g"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= lit(tauNum.toDouble / tauDen))
  }

  /** SORTED-NEIGHBORHOOD dedup (Hernández &amp; Stolfo, "The Merge/Purge
    * Problem for Large Databases", SIGMOD 1995): sort every record by
    * a key and compare each record only with its `w−1` successors in
    * that order — O(n·w) comparisons, the window-based alternative to
    * [[fuzzyJoin]]'s blocking (blocking recalls what shares a block
    * key; SNM recalls what sorts NEARBY, catching prefix-similar pairs
    * whose block keys differ).
    *
    * Distributed shape: a single global sort window would serialize on
    * one partition, so records bucket by their leading character — a
    * DATA-DERIVED, sort-contiguous bucketing (the q39 discipline: no
    * spark_partition_id) — and rank inside buckets in parallel.
    * Within-bucket neighbor pairs come from `w−1` lead() columns; the
    * pairs that straddle a bucket boundary are recovered by joining
    * each bucket's last `w−1` rows to the NEXT bucket's first `w−1`
    * rows (bucket adjacency via a row_number over the tiny distinct-
    * bucket table — the [[graft.llm.Pack.shardPack]] offsets
    * convention) and keeping those with combined rank distance &lt; w.
    * The union EQUALS the ideal single-window SNM whenever every
    * bucket holds ≥ w−1 rows — and the gate oracle IS the ideal
    * global-window form, so the row certifies the equivalence on the
    * corpus rather than assuming it.
    *
    * Output: (d1, d2, dist) with d1 &lt; d2, exact Levenshtein ≤
    * maxDist — precision 1, recall = what sorts within w. */
  def sortedNeighborhood(docs: DataFrame, idCol: String, strCol: String,
                         w: Int, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"), col(strCol).as("s"))
      .withColumn("bkt", substring(col("s"), 1, 1))
    val wB = Window.partitionBy("bkt").orderBy(col("s"), col("doc_id"))
    val ranked = base
      .withColumn("r", row_number().over(wB))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("bkt")))
    val withLeads = ranked.select(
      (Seq(col("doc_id"), col("s"), col("bkt"), col("r"), col("n")) ++
        (1 until w).flatMap(i => Seq(
          lead(col("doc_id"), i).over(wB).as(s"id$i"),
          lead(col("s"), i).over(wB).as(s"s$i")))): _*)
    val within = (1 until w).map { i =>
      withLeads.where(col(s"id$i").isNotNull)
        .select(col("doc_id").as("ida"), col("s").as("sa"),
          col(s"id$i").as("idb"), col(s"s$i").as("sb"))
    }.reduce(_ unionAll _)
    // bucket adjacency: consecutive index over the (tiny) distinct
    // bucket table — ≤ |alphabet| rows, the shardPack offsets shape
    val bIdx = base.select(col("bkt")).distinct()
      .withColumn("bi", row_number().over(Window.orderBy("bkt")))
    val tails = ranked.join(broadcast(bIdx), "bkt")
      .where(col("r") > col("n") - (w - 1))
      .select(col("bi"), col("doc_id").as("ida"), col("s").as("sa"),
        (col("n") - col("r")).as("from_end"))
    val heads = ranked.join(broadcast(bIdx), "bkt")
      .where(col("r") <= w - 1)
      .select((col("bi") - 1).as("bi"), col("doc_id").as("idb"),
        col("s").as("sb"), col("r").as("from_start"))
    val cross = tails.join(heads, "bi")
      .where(col("from_end") + col("from_start") < w)
      .select(col("ida"), col("sa"), col("idb"), col("sb"))
    within.unionAll(cross)
      .select(least(col("ida"), col("idb")).as("d1"),
        greatest(col("ida"), col("idb")).as("d2"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** INCREMENTAL maintenance of [[connectedComponents]] — the graph
    * analogue of the q100 signature-store lifecycle: a production dedup
    * pipeline keeps (edges, labels) tables between crawls and folds
    * each new batch's near-dup pairs in WITHOUT re-running CC over the
    * full history graph. Only the components the fresh edges touch are
    * recomputed: their stored edges are pulled (one semi-join on the
    * label), unioned with the fresh edges, and re-labeled; every other
    * component's labels pass through untouched. A fresh edge can merge
    * two stored components (both are touched ⇒ both re-label to the
    * common minimum) or introduce brand-new nodes (present in the
    * fresh edge set ⇒ labeled by the recompute).
    *
    * Cost: O(affected subgraph + fresh batch), never O(graph) — the
    * label probe and the affected-component semi-join key on the tiny
    * fresh side (broadcast); the CC rounds run on the affected
    * subgraph only. Correctness: the affected subgraph contains ALL
    * edges of every affected component, so its min-label recompute
    * equals the from-scratch answer exactly — which is what the gate
    * oracle (the full-graph transitive closure, q65's verbatim)
    * checks. */
  def incrementalComponents(storedEdges: DataFrame, storedLabels: DataFrame,
                            freshEdges: DataFrame): DataFrame = {
    val touched = freshEdges.select(col("d1").as("doc_id"))
      .unionAll(freshEdges.select(col("d2").as("doc_id"))).distinct()
    val affected = storedLabels.join(broadcast(touched), "doc_id")
      .select(col("component")).distinct()
    val subEdges = storedEdges
      .join(storedLabels.select(col("doc_id").as("d1"),
        col("component").as("c")), "d1")
      .join(broadcast(affected.withColumnRenamed("component", "c")),
        Seq("c"), "left_semi")
      .select("d1", "d2")
      .unionAll(freshEdges.select("d1", "d2"))
    val untouched = storedLabels
      .join(broadcast(affected), Seq("component"), "left_anti")
    untouched.select("doc_id", "component")
      .unionAll(connectedComponents(subEdges))
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

  /** MinHash estimator-accuracy audit: for every LSH candidate pair,
    * the one-permutation signature ESTIMATE of Jaccard next to the
    * EXACT shingle Jaccard, with the absolute error — the measurement
    * a production dedup pipeline publishes before trusting the sketch
    * at a new (k, nBuckets, bandSize) operating point (the honest-
    * measurement companion to RecallSpec's recall numbers; Broder
    * 1997's estimator, Li & König 2012's one-permutation variant).
    *
    * Estimator: matching bucket-mins over the buckets occupied by
    * EITHER doc. Mutually-empty bins carry no information — docs with
    * fewer shingles than buckets leave most bins empty, and dividing
    * by nBuckets would floor every estimate near 0 (identical 4-
    * shingle docs would "estimate" 4/64): the union-occupancy
    * denominator is the OPH equivalent of densification.
    *
    * Scale: the signature table is the SAME bucket-min frame the
    * candidate join already builds (shingled once, localCheckpoint'd);
    * the match count is a 3-key equi-join (d, bucket, mh) — O(pairs ×
    * nBuckets) rows, never corpus-wide; the exact leg touches only
    * candidate pairs (the q18 verify contract). */
  def minhashAccuracy(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                      maxBucket: Int = 1000): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    val sh = docs.select(col(idCol).as("doc_id"),
        nativeShingles(docs, textCol, k).as("sh"))
      .where(size(col("sh")) > 0).localCheckpoint()
    val cands = minhashCandidatesFromShingles(sh, nBuckets, bandSize, maxBucket)
    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), graft.functions.HashExprs.fnv1a32("s").as("h"))
    val bm = hashed
      .groupBy(col("doc_id"), pmod(col("h"), lit(nBuckets)).as("bucket"))
      .agg(min(col("h")).as("mh"))
    val matches = cands
      .join(bm.select(col("doc_id").as("d1"), col("bucket"), col("mh")),
        Seq("d1"))
      .join(bm.select(col("doc_id").as("d2"), col("bucket"), col("mh")),
        Seq("d2", "bucket", "mh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("cnt"))
    // buckets occupied by BOTH docs (any value) and per-doc occupancy —
    // union occupancy = nb1 + nb2 − both
    val occBoth = cands
      .join(bm.select(col("doc_id").as("d1"), col("bucket")), Seq("d1"))
      .join(bm.select(col("doc_id").as("d2"), col("bucket")),
        Seq("d2", "bucket"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("ob"))
    val nb = bm.groupBy("doc_id").agg(count(lit(1)).as("nb"))
    val ex = cands
      .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("double").as("inter"),
        (size(col("sh1")) + size(col("sh2"))).cast("double").as("total"))
    val est = col("cnt").cast("double") /
      (col("nb1") + col("nb2") - col("ob")).cast("double")
    val jac = col("inter") / (col("total") - col("inter"))
    matches.join(occBoth, Seq("d1", "d2"))
      .join(nb.select(col("doc_id").as("d1"), col("nb").as("nb1")), Seq("d1"))
      .join(nb.select(col("doc_id").as("d2"), col("nb").as("nb2")), Seq("d2"))
      .join(ex, Seq("d1", "d2"))
      .select(col("d1"), col("d2"), col("cnt").as("matches"),
        graft.rel.Queries.femit(est).as("est_jaccard"),
        graft.rel.Queries.femit(jac).as("exact_jaccard"),
        graft.rel.Queries.femit(abs(est - jac)).as("abs_err"))
      .orderBy("d1", "d2")
  }

  /** b-BIT MINWISE HASHING accuracy audit (Li &amp; König, CACM 2011 —
    * THE storage-compression result for minhash: keep only the lowest
    * b bits of each bucket-min and a 64-bucket signature drops from
    * 512 bytes to 8·b bytes, the difference between a signature store
    * that fits executor memory at 100 TB and one that does not): over
    * the SAME candidate pairs and the same one-permutation bucket-min
    * frame as [[minhashAccuracy]], compare the full-width estimator
    * against the b ∈ {1, 2, 4} truncations with the large-universe
    * collision correction Ĵ_b = (P̂_b − 2⁻ᵇ) / (1 − 2⁻ᵇ) (the r₁,r₂→0
    * limit of the paper's C₁/C₂ constants — documented simplification;
    * accidental low-bit collisions inflate P̂_b and the correction
    * removes exactly that inflation in expectation). P̂_b counts
    * equal-low-bits buckets over the union occupancy (the OPH
    * densification denominator [[minhashAccuracy]] pins).
    *
    * Output per candidate pair: exact Jaccard, the full estimate, the
    * three corrected b-bit estimates, and their absolute errors — the
    * gate row IS the storage/accuracy tradeoff table.
    *
    * Scale: identical plan to [[minhashAccuracy]] (the b-bit columns
    * are extra conditional sums on the SAME 3-key equi-join — no new
    * shuffle); the truncation itself is what a production store would
    * persist. */
  def bbitMinhash(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, nBuckets: Int = 64, bandSize: Int = 4,
                  maxBucket: Int = 1000): DataFrame = {
    import graft.rel.Queries.femit
    graft.functions.HashExprs.register(docs.sparkSession)
    val sh = docs.select(col(idCol).as("doc_id"),
        nativeShingles(docs, textCol, k).as("sh"))
      .where(size(col("sh")) > 0).localCheckpoint()
    val cands = minhashCandidatesFromShingles(sh, nBuckets, bandSize, maxBucket)
    val bm = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), graft.functions.HashExprs.fnv1a32("s").as("h"))
      .groupBy(col("doc_id"), pmod(col("h"), lit(nBuckets)).as("bucket"))
      .agg(min(col("h")).as("mh"))
      .localCheckpoint() // both sides of the bucket join + occupancy
    val both = cands
      .join(bm.select(col("doc_id").as("d1"), col("bucket"),
        col("mh").as("mh1")), Seq("d1"))
      .join(bm.select(col("doc_id").as("d2"), col("bucket"),
        col("mh").as("mh2")), Seq("d2", "bucket"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("ob"),
        sum(when(col("mh1") === col("mh2"), 1L).otherwise(0L)).as("mfull"),
        sum(when(col("mh1") % 2L === col("mh2") % 2L, 1L).otherwise(0L))
          .as("m1"),
        sum(when(col("mh1") % 4L === col("mh2") % 4L, 1L).otherwise(0L))
          .as("m2"),
        sum(when(col("mh1") % 16L === col("mh2") % 16L, 1L).otherwise(0L))
          .as("m4"))
    val nb = bm.groupBy("doc_id").agg(count(lit(1)).as("nb"))
    val ex = cands
      .join(sh.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("double").as("inter"),
        (size(col("sh1")) + size(col("sh2"))).cast("double").as("total"))
    val uni = (col("nb1") + col("nb2") - col("ob")).cast("double")
    val jac = col("inter") / (col("total") - col("inter"))
    def bbit(m: Column, b: Int): Column = {
      val c = 1.0 / (1L << b)
      (m.cast("double") / uni - lit(c)) / lit(1.0 - c)
    }
    both
      .join(nb.select(col("doc_id").as("d1"), col("nb").as("nb1")), Seq("d1"))
      .join(nb.select(col("doc_id").as("d2"), col("nb").as("nb2")), Seq("d2"))
      .join(ex, Seq("d1", "d2"))
      .select(col("d1"), col("d2"),
        femit(jac).as("exact_jaccard"),
        femit(col("mfull").cast("double") / uni).as("est_full"),
        femit(bbit(col("m1"), 1)).as("est_b1"),
        femit(bbit(col("m2"), 2)).as("est_b2"),
        femit(bbit(col("m4"), 4)).as("est_b4"),
        femit(abs(col("mfull").cast("double") / uni - jac)).as("err_full"),
        femit(abs(bbit(col("m4"), 4) - jac)).as("err_b4"))
      .orderBy("d1", "d2")
  }

  /** Shingle-CONTAINMENT self-join — the asymmetric-duplication signal
    * Jaccard misses: a short document wholly embedded in a long one
    * (quote farms, aggregation pages, prompt+completion pairs) has
    * containment |A∩B|/min(|A|,|B|) ≈ 1 while its Jaccard ≈ |A|/|B|
    * can be arbitrarily small. Lee et al. ("Deduplicating Training
    * Data Makes Language Models Better", ACL 2022) dedupe on exactly
    * this superset/subset axis alongside the symmetric one.
    *
    * Capped-vocabulary semantics, the [[tfidfCosinePairs]] contract:
    * shingles with df &gt; `dfCap` leave the space entirely (both the
    * intersection and the per-doc sizes see the reduced space, so the
    * score is EXACT there), which also bounds the self-join at
    * Σ_sh df² with df ≤ dfCap. The threshold compares the ROUNDED
    * score (the top-K rule), so the survivor set is cross-engine
    * stable at the boundary.
    *
    * Scale: one shingle hash-agg for df, the capped posting table
    * built once and localCheckpoint'd (it feeds both join sides and
    * the sizes), one shingle-keyed equi-join (AQE splits hot
    * shingles), one (d1, d2) hash-agg — no all-pairs path exists. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, dfCap: Long = 20L,
                       threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(nativeShingles(docs, textCol, k)).as("sh"))
    val dfTbl = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap)
    val posting = sh.join(dfTbl.select("sh"), "sh").localCheckpoint()
    val sizes = posting.groupBy("doc_id").agg(count(lit(1)).as("n"))
    posting.select(col("sh"), col("doc_id").as("d1"))
      .join(posting.select(col("sh"), col("doc_id").as("d2")), "sh")
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("containment",
        graft.rel.Queries.femit(col("shared").cast("double") / least(col("n1"), col("n2"))))
      .where(col("containment") >= threshold)
      .select("d1", "d2", "shared", "n1", "n2", "containment")
      .orderBy("d1", "d2")
  }

  /** WEIGHTED set-similarity self-join: tf-idf-weighted shingle cosine
    * — the importance-weighted complement of [[prefixFilterJoin]]'s
    * unweighted Jaccard (two docs sharing one RARE shingle score
    * higher than two sharing a boilerplate one; the standard
    * similarity model of near-dup mining at the weighted end —
    * Broder's shingling with idf weights). Capped-vocabulary
    * semantics: shingles with document frequency &gt; `dfCap` leave
    * the vector space entirely (stop-shingle removal — both the
    * numerator and the norms see the reduced space, so the cosine is
    * EXACT in that space, not an approximation of the uncapped one),
    * which is also what bounds the join: candidate pairs enumerate at
    * shared shingles, Σ_sh df² work, df ≤ dfCap each.
    *
    * Scale: one shingle hash-agg for df, the weighted-posting table
    * built ONCE and localCheckpoint'd (it feeds both join sides and
    * the norms — the q209 multi-consumer rule), one shingle-keyed
    * equi-join, one (d1, d2) hash-agg. idf = ln(N/df) on exact
    * integers; dot and squared-norm sums ride [[graft.rel.Queries.dsum]];
    * the top-K cut orders on dsum-exact cosines — bit-identical
    * cross-engine. */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, dfCap: Long = 20L,
                       topK: Int = 20): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(nativeShingles(docs, textCol, k)).as("sh"))
    val dfTbl = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap)
    val n = docs.agg(count(lit(1)).cast("double").as("nd"))
    val w = sh.join(dfTbl, "sh").crossJoin(broadcast(n))
      .select(col("doc_id"), col("sh"),
        log(col("nd") / col("df").cast("double")).as("idf"))
      .localCheckpoint()
    val norms = w.groupBy("doc_id")
      .agg(graft.rel.Queries.dsum(col("idf") * col("idf")).as("s2"))
      .select(col("doc_id"), sqrt(col("s2")).as("nrm"))
    val dots = w.select(col("sh"), col("doc_id").as("d1"), col("idf"))
      .join(w.select(col("sh"), col("doc_id").as("d2"),
        col("idf").as("idf2")), "sh")
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(graft.rel.Queries.dsum(col("idf") * col("idf2")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("nrm").as("n1")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("nrm").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        graft.rel.Queries.femit(col("dot") / (col("n1") * col("n2"))).as("cosine"))
      .orderBy(col("cosine").desc, col("d1").asc, col("d2").asc)
      .limit(topK)
  }

  /** Substring-level duplication coverage (the signal behind
    * ExactSubstr dedup, Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", at token granularity): for every
    * k-token window, is that exact window repeated in ANOTHER document?
    * A position is "duplicated" if any window covering its start is; a
    * document's coverage is the size of the union of the [i, i+k)
    * intervals of its cross-document-repeated windows. Doc-level
    * near-dup (q18) misses a boilerplate paragraph pasted into
    * thousands of otherwise-distinct pages — this is the operator that
    * finds it, and the per-language roll-up is the curation dashboard
    * row that decides whether substring dedup is worth running.
    *
    * Scale: window enumeration is one generator pass (O(tokens) rows);
    * the repeated-window test is a hash-agg on the window key
    * (production would fnv-hash the k-gram string — the string key here
    * keeps the oracle exact); the interval union is one per-doc window
    * over only the duplicated positions. Shuffles are O(tokens) on the
    * gram key and O(dup positions) on doc_id — no pairwise expansion
    * anywhere, which is exactly why ExactSubstr variants scale where
    * all-pairs suffix comparison cannot. */
  def substringDupCoverage(docs: DataFrame, k: Int = 8): DataFrame = {
    val t = docs.select(col("doc_id"), col("lang"),
      expr("filter(split(text, ' '), x -> x <> '')").as("ts"))
    val g = t.where(size(col("ts")) >= k)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(0, size(ts) - $k), " +
          s"i -> struct(i AS i, array_join(slice(ts, i + 1, $k), ' ') AS gram))"))
        .as("p"))
      .select(col("doc_id"), col("lang"), col("p.i").as("i"),
        col("p.gram").as("gram"))
    val dup = g.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= 2).select("gram")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    val cov = g.join(dup, "gram")
      .withColumn("nxt", lead(col("i"), 1).over(w))
      .select(col("doc_id"), col("lang"),
        least(lit(k), coalesce(col("nxt") - col("i"), lit(k))).as("covered"))
      .groupBy("doc_id", "lang").agg(sum(col("covered")).as("covered"))
    t.select(col("doc_id"), col("lang"), size(col("ts")).as("len"))
      .join(cov, Seq("doc_id", "lang"), "left")
      .withColumn("cv", coalesce(col("covered"), lit(0L)))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cv") > 0, 1L).otherwise(0L)).as("n_docs_dup"),
        sum(col("len")).as("total_tokens"),
        sum(col("cv")).as("dup_tokens"))
      .select(col("lang"), col("n_docs"), col("n_docs_dup"),
        col("total_tokens"), col("dup_tokens"),
        graft.rel.Queries.femit(col("dup_tokens").cast("double")
          / col("total_tokens").cast("double")).as("dup_fraction"))
      .orderBy("lang")
  }

  /** LSH (bands, rows) parameter planner: before committing a 100 TB
    * corpus to one MinHash configuration, score every factorization
    * b·r = `nSig` against THIS corpus's empirical pair-similarity
    * distribution. The S-curve P(candidate | j) = 1 − (1 − jʳ)ᵇ is
    * integrated against a 20-cell histogram of exact 3-shingle Jaccard
    * over a bounded calibration sample (all pairs with both ids <
    * `maxId` — the q20/q33 capped-pair convention): false-positive mass
    * = Σ_{j<τ} w(j)·P, false-negative mass = Σ_{j≥τ} w(j)·(1−P), τ =
    * `tau`. Output ranks configurations by total error (rounded-value
    * order + bands tiebreak, the q207 rule) — the planning step q316's
    * accuracy audit validates after the fact.
    *
    * Scale: the calibration sample is fixed-size (maxId² pairs) by
    * design — a planner must be cheap relative to the job it plans; the
    * histogram and the 8-row parameter grid are driver-free broadcast
    * algebra. pow() is libm on both engines; every pow output feeds the
    * DECIMAL-lattice mass sums where sub-1e-12 drift is quantized away,
    * then femit. */
  def lshPlan(docs: DataFrame, nSig: Int = 128, tau: Double = 0.5,
              maxId: Long = 200L): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val s = docs.sparkSession
    graft.functions.TextExprs.register(s)
    val sh = docs.where(col("doc_id") < maxId)
      .select(col("doc_id"),
        graft.functions.TextExprs.shingles("text", 3).as("sh"))
      .where(size(col("sh")) > 0)
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(size(array_intersect(col("a.sh"), col("b.sh")))
        .cast("double").as("inter"),
        size(col("a.sh")).as("n1"), size(col("b.sh")).as("n2"))
      .select((col("inter") /
        (col("n1") + col("n2") - col("inter"))).as("j"))
    // 20-cell histogram on [0,1); j = 1.0 folds into the top cell.
    // localCheckpoint: the histogram feeds TWO consumers (the total-mass
    // broadcast branch and the grid cross) and Catalyst does not share
    // sub-plans across broadcast branches — without the checkpoint the
    // O(maxId²) pair join above runs once per consumer (the q209/q132
    // reduce-once-probe-many rule; PlanSpec-pinned).
    val hist = pairs
      .select(least(floor(col("j") * 20.0), lit(19.0)).cast("long").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val total = hist.agg(sum(col("w")).as("tw"))
    val k = (math.log(nSig.toDouble) / math.log(2.0)).round.toInt
    require(1 << k == nSig, s"nSig must be a power of two, got $nSig")
    val grid = s.createDataFrame(
        (0 to k).map(i => ((1L << (k - i)), (1L << i))))
      .toDF("bands", "rows_per_band")
    val mid = (col("cell").cast("double") + lit(0.5)) / lit(20.0)
    val pCand = lit(1.0) - pow(lit(1.0) -
      pow(mid, col("rows_per_band").cast("double")), col("bands").cast("double"))
    val mass = hist.crossJoin(broadcast(grid)).crossJoin(broadcast(total))
      .select(col("bands"), col("rows_per_band"),
        (col("w").cast("double") / col("tw")).as("wf"),
        when(mid < tau, pCand).otherwise(lit(0.0)).as("fpTerm"),
        when(mid >= tau, lit(1.0) - pCand).otherwise(lit(0.0)).as("fnTerm"))
      .groupBy("bands", "rows_per_band")
      .agg(dsum(col("wf") * col("fpTerm")).as("fp"),
        dsum(col("wf") * col("fnTerm")).as("fn"))
    val ranked = mass.select(col("bands"), col("rows_per_band"),
        femit(col("fp")).as("fp_mass"), femit(col("fn")).as("fn_mass"),
        femit(col("fp") + col("fn")).as("total_err"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("total_err").asc, col("bands").desc)).cast("long"))
    ranked.orderBy("rnk")
  }

  /** Dedup threshold ladder: the planning question BEFORE running an
    * aggressive dedup — "at each Jaccard threshold, how much corpus
    * survives keep-one-per-component?" (Lee et al. ACL 2022 sweep this
    * to choose their operating point). The near-dup pair list computes
    * ONCE at the loosest threshold (a pair invisible at 0.1 is
    * invisible at every higher cut) and localCheckpoints; each rung
    * filters it, transitively closes, and reports pairs, components,
    * dup docs, the effective corpus size total − (dups − components),
    * and the retained share.
    *
    * Determinism: jaccard values are the q18 exact ratios; threshold
    * comparisons are bit-deterministic; all census numbers are exact
    * integers; retained_share is one fixed-order division through
    * femit.
    *
    * Scale: ONE LSH candidate+verify pass (the cost the dedup family
    * pays) feeds every rung; per rung the CC runs over an
    * ever-smaller filtered edge set — the ladder adds log-round
    * label propagation on shrinking graphs, never a second corpus
    * scan. */
  def dedupLadder(docs: DataFrame,
                  thresholds: Seq[Double] = Seq(0.1, 0.95, 0.97, 0.985)): DataFrame = {
    import graft.rel.Queries.femit
    val pairs = minhashNearDups(docs, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4, threshold = thresholds.min)
      .localCheckpoint() // one candidate+verify pass feeds every rung
    val total = docs.count() // 1-row scalar control flow (q47 precedent)
    // r15 (guide §2.6): the rungs are INDEPENDENT sweeps over the same
    // checkpointed pair table, but each one blocks the driver through
    // its CC fixpoint loop of small jobs — run them from driver
    // threads so one rung's jobs back-fill the others' tails. Result
    // order is pinned by the map-then-reduce over the threshold list
    // (Future.sequence preserves it) + the closing orderBy.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rungs = Future.sequence(thresholds.map { t => Future {
      val p = pairs.where(col("jaccard") >= t)
      val stats = connectedComponents(p)
        .agg(count(lit(1)).as("n_dup_docs"),
          countDistinct(col("component")).as("n_components"))
      val np = p.agg(count(lit(1)).as("n_pairs"))
      stats.crossJoin(broadcast(np)).select(
        lit(t).as("threshold"), col("n_pairs"), col("n_components"),
        col("n_dup_docs"),
        (lit(total) - (col("n_dup_docs") - col("n_components")))
          .as("effective_docs"),
        femit((lit(total).cast("double") -
          (col("n_dup_docs") - col("n_components")).cast("double")) /
          lit(total).cast("double")).as("retained_share"))
    }})
    Await.result(rungs, Duration.Inf).reduce(_ unionAll _)
      .orderBy("threshold")
  }

  /** Cross-source duplication matrix: for every ordered source pair
    * (A, B), the share of A's distinct 3-gram shingles that also occur
    * in B — the provenance diagnostic that flags mirror/scrape
    * relationships between slices of a blended corpus BEFORE they leak
    * across a source-keyed split (the source-level coarsening of q299's
    * per-document containment; q111 asks the same question against an
    * eval set). Asymmetric by design: a small mirror is contained in
    * its large origin, not vice versa.
    *
    * Determinism: distinct (shingle, source) incidence is exact; the
    * containment is one division of exact counts through femit.
    *
    * Scale: the self-join is keyed by SHINGLE and each shingle's group
    * is bounded by |sources| — expansion ≤ |sources|² per shingle,
    * never corpus². One shingle scan, one distinct, one keyed join. */
  def sourceOverlapMatrix(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.femit
    val ss = docs.select(col("source"),
        explode(nativeShingles(docs, "text", 3)).as("g"))
      .distinct()
      .localCheckpoint() // feeds the per-source totals AND the pair join
    val base = ss.groupBy("source").agg(count(lit(1)).as("n_sh"))
    ss.join(ss.select(col("source").as("src_b"), col("g")), "g")
      .where(col("source") =!= col("src_b"))
      .groupBy(col("source").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(base.select(col("source").as("src_a"), col("n_sh").as("n_a")),
        "src_a")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        femit(col("n_shared").cast("double") / col("n_a").cast("double"))
          .as("containment"))
      .orderBy("src_a", "src_b")
  }

  /** Blocking-quality evaluation for entity resolution (Christen,
    * "Data Matching" 2012 §7.3 — the metrics that decide a blocking
    * scheme BEFORE the expensive match pass): per candidate scheme,
    * reduction ratio RR = 1 − |cands|/C(n,2) (how much comparison work
    * blocking saves) and pairs completeness PC = |cands ∩ truth|/
    * |truth| (how much recall it forfeits) against the brute-force
    * edit-distance ground truth. Schemes evaluated: q86's
    * (first-token, len÷4) block, its last-token mirror, and their
    * UNION — gate-visible numbers for exactly the trade-off
    * fuzzyJoin's scaladoc describes in prose.
    *
    * The ground truth is brute force over a BOUNDED audit slice
    * (id &lt; `cap`, the q335/q352 bounded-sample convention): a
    * production blocking eval runs on a labeled sample for the same
    * reason — the n² truth join is the thing blocking exists to
    * avoid. Inside the slice every count is exact.
    *
    * Determinism: Levenshtein, block keys, and counts are exact on
    * both engines; the two ratios femit at emission.
    *
    * Scale: the slice caps the truth join at cap²/2 comparisons;
    * scheme candidate COUNTS come from block-size algebra (Σ C(sz,2)
    * per key — never materializing pairs), and only the verify join
    * touches candidate pairs. */
  def blockingEval(docs: DataFrame, idCol: String, strCol: String,
                   maxDist: Int = 10, cap: Long = 1500L): DataFrame = {
    import graft.rel.Queries.femit
    val t = docs.where(col(idCol) < cap)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .localCheckpoint() // feeds truth + every scheme
    // the slice arrives as a handful of input splits — without the
    // repartition the broadcast-nested-loop truth join runs its
    // cap²/2 Levenshteins on ~2 tasks (measured 15 s → 3 s at 32)
    val a = t.select(col("id").as("d1"), col("s").as("s1")).repartition(32)
    val b = t.select(col("id").as("d2"), col("s").as("s2"))
    val truth = a.join(broadcast(b), col("d1") < col("d2"))
      .where(levenshtein(col("s1"), col("s2")) <= maxDist)
      .select("d1", "d2")
      .localCheckpoint() // joined by every scheme row
    val census = t.agg(count(lit(1)).as("n_records"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
      .localCheckpoint() // 1 row, read by every scheme row
    def firstTok = expr("concat(element_at(split(s, ' ', -1), 1), ':', " +
      "cast(length(s) div 4 as string))")
    def lastTok = expr("concat(element_at(split(s, ' ', -1), -1), ':', " +
      "cast(length(s) div 4 as string))")
    def candsOf(key: Column): DataFrame = {
      val keyed = t.select(col("id"), col("s"), key.as("bk"))
      keyed.select(col("bk"), col("id").as("d1"))
        .join(keyed.select(col("bk"), col("id").as("d2")), "bk")
        .where(col("d1") < col("d2"))
        .select("d1", "d2")
    }
    val schemes = Seq(
      "first_tok_len4" -> candsOf(firstTok),
      "last_tok_len4" -> candsOf(lastTok),
      "union_first_last" ->
        candsOf(firstTok).unionByName(candsOf(lastTok)).distinct())
    schemes.map { case (name, cands) =>
      val cc = cands.localCheckpoint()
      cc.agg(count(lit(1)).as("n_cand_pairs"))
        .crossJoin(broadcast(
          cc.join(truth, Seq("d1", "d2")).agg(count(lit(1)).as("n_found"))))
        .crossJoin(broadcast(census))
        .select(lit(name).as("scheme"),
          col("n_records"), col("n_true_pairs"),
          col("n_cand_pairs"), col("n_found"),
          femit(lit(1.0) - col("n_cand_pairs").cast("double")
            / (col("n_records").cast("double")
              * (col("n_records") - 1L).cast("double") / 2.0))
            .as("reduction_ratio"),
          femit(col("n_found").cast("double")
            / col("n_true_pairs").cast("double"))
            .as("pair_completeness"))
    }.reduce(_ unionByName _).orderBy("scheme")
  }

  /** TRUE EXACT-SUBSTRING duplicate spans via prefix-doubling position
    * naming (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 — ExactSubstr; the naming step is
    * Manber–Myers prefix doubling): a position's name for window 2m is
    * an INJECTIVE renaming of (name_m(p), name_m(p+m)), so log2(L)
    * rounds of one equi-join + one keyed aggregate each decide EXACTLY
    * which L-token windows repeat anywhere in the corpus — no hashing,
    * no collisions, no false positives at any L (q271's winnowed
    * windows are the probabilistic cousin; this is the exact member of
    * the family). Names are min-(doc_id, pos) labels: grouping needs
    * injectivity, not suffix ORDER, so no global sort ever happens —
    * the classic suffix-array rank sort is replaced by min-label
    * aggregation, the CC-loop trick applied to naming. Arbitrary L is
    * reached by COMPOSITE naming: after doubling to m = 2^floor(log2 L),
    * one extra round pairs name_m(p) with name_m(p + L - m) — the two
    * m-windows overlap (L - m < m), so the pair stays injective for the
    * full L-window; Lee et al.'s published L=50 is compose(name_32, 18).
    *
    * Per document: L-window count, duplicated-window count, maximal
    * duplicated runs (gaps-and-islands over consecutive duplicated
    * positions — a shared span of S >= L tokens appears as a run of
    * S-L+1 consecutive duplicated windows, so runs recover EVERY
    * maximal shared span exactly), the longest shared span in tokens,
    * and the merged-interval covered-token count (adjacent runs'
    * coverage can overlap by up to L-2 tokens; a running-max interval
    * merge keeps the count exact).
    *
    * Determinism: naming is min() over exact integers/structs; run
    * algebra is integer; the only doubles are the femit'd share.
    *
    * Scale: each naming round shuffles by (doc_id, pos) for the
    * neighbor fetch and by the (name, name) pair for renaming — both
    * corpus-grain equi-joins with map-side partials, never pairwise;
    * runs/merge ride doc-partitioned windows. log2(L) fixed rounds
    * (Lee et al. use L=50 → 6 rounds at web scale). */
  /** The prefix-doubling naming chain shared by [[exactSubstrRuns]] and
    * [[exactSubstrCut]]: (doc_id, pos, nm) for every position with a
    * full L-token window, where nm is an injective min-position label
    * of the window's token content (equal nm ⇔ identical L-gram). */
  private[llm] def exactSubstrNamed(docs: DataFrame, idCol: String,
                                    textCol: String,
                                    windowL: Int = 4): DataFrame = {
    require(windowL >= 2, "windowL must be >= 2")
    val tok = docs.select(col(idCol).as("doc_id"),
        posexplode(filter(split(col(textCol), " ", -1), t => t =!= ""))
          .as(Seq("pos", "t")))
      .localCheckpoint() // both sides of the round-1 naming join
    // name_1: min global position of the token (injective per token)
    val nm1 = tok.join(
        tok.groupBy("t").agg(min(struct(col("doc_id"), col("pos"))).as("nm")),
        "t")
      .select("doc_id", "pos", "nm")
    // compose window-m names at offset `shift` (shift <= m): the pair
    // (name_m(p), name_m(p+shift)) determines the content of the
    // contiguous span [p, p+m+shift) both ways — the two m-windows
    // overlap or abut, so equal pairs <=> equal span content — and
    // renaming pairs to min-position labels keeps the label grain.
    // shift = m is the classic doubling round; shift = L - m is the
    // single composite round that finishes a non-power-of-two L.
    // Positions without a full (m+shift)-window drop out via the
    // inner join.
    def compose(named: DataFrame, shift: Int): DataFrame = {
      val paired = named.join(
          named.select(col("doc_id"), (col("pos") - shift).as("pos"),
            col("nm").as("nm2")),
          Seq("doc_id", "pos"))
        .select(col("doc_id"), col("pos"),
          struct(col("nm"), col("nm2")).as("pk"))
      paired.join(
          paired.groupBy("pk")
            .agg(min(struct(col("doc_id"), col("pos"))).as("nm")),
          "pk")
        .select("doc_id", "pos", "nm")
        .localCheckpoint() // each round feeds the next twice
    }
    var named = nm1
    var m = 1
    while (m * 2 <= windowL) { named = compose(named, m); m *= 2 }
    if (m < windowL) named = compose(named, windowL - m)
    named
  }

  /** Per-doc (n_tokens, n_windows) straight off the text column. */
  private def exactSubstrCensus(docs: DataFrame, idCol: String,
                                textCol: String, windowL: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " ", -1), t => t =!= ""))
          .cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - lit(windowL - 1L), lit(0L)))

  def exactSubstrRuns(docs: DataFrame, idCol: String, textCol: String,
                      windowL: Int = 4): DataFrame = {
    import graft.rel.Queries.femit
    val named = exactSubstrNamed(docs, idCol, textCol, windowL)
    // duplicated L-windows: the name occurs at >= 2 positions
    val dup = named.join(
        named.groupBy("nm").agg(count(lit(1)).as("occ")), "nm")
      .where(col("occ") >= 2)
      .select("doc_id", "pos")
    // maximal runs of consecutive duplicated windows per doc
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = dup
      .withColumn("isl", col("pos") - row_number().over(wDoc))
      .groupBy("doc_id", "isl")
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) + lit(windowL)).as("end")) // exclusive token end
    // merged-interval coverage (adjacent runs may overlap by <= L-2)
    val wIv = Window.partitionBy("doc_id").orderBy("start")
    val merged = runs
      .withColumn("pmax", max(col("end")).over(
        wIv.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("grp", sum(
        when(col("pmax").isNull || col("start") > col("pmax"), 1L)
          .otherwise(0L)).over(
        wIv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min(col("start")).as("s"), max(col("end")).as("e"))
      .groupBy("doc_id").agg(sum(col("e") - col("s")).as("covered_tokens"))
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"),
        max(col("end") - col("start")).as("longest_span_tokens"),
        sum(col("end") - col("start") - lit(windowL) + 1L)
          .as("n_dup_windows"))
    // census straight off the text column: an all-empty doc must still
    // emit its zero row (the exploded table would drop it)
    val census = exactSubstrCensus(docs, idCol, textCol, windowL)
    census.join(perDoc, Seq("doc_id"), "left")
      .join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("longest_span_tokens"), lit(0L))
          .as("longest_span_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        femit(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          nullif(col("n_tokens"), lit(0L)).cast("double")).as("dup_share"))
      .orderBy("doc_id")
  }

  /** The L-window gram table of a corpus slice: (doc_id, pos, gram)
    * with the gram as its literal L-token string — the PERSISTED form
    * of the exact-substring store (the naming chain trades strings for
    * joins when everything is in one pass; a cross-generation store
    * must carry the content itself, at the honest O(tokens × L)
    * storage cost — the same trade Lee et al.'s on-disk suffix array
    * makes). */
  private def lWindowGrams(docs: DataFrame, idCol: String, textCol: String,
                           windowL: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " ", -1), t => t =!= "").as("ts"))
      .select(col("doc_id"),
        posexplode(transform(col("ts"),
          (_, i) => array_join(slice(col("ts"), i + 1, lit(windowL)), " ")))
          .as(Seq("pos", "gram")))
      .withColumn("n", size(split(col("gram"), " ", -1)))
      .where(col("n") === windowL).drop("n")

  /** 128-bit gram key: two xxhash64 halves of the literal L-gram, the
    * second seeded by a domain-prefix literal (xxhash64 folds its
    * arguments sequentially, so the prefixed variant is an independent
    * second hash of the same bytes). A false probe hit needs BOTH
    * halves to collide simultaneously: for n distinct history grams
    * probed by b batch grams the expected false-hit count is
    * ~ n·b / 2^128 — at 100 TB (~10^13 grams a side) that is ~10^-12,
    * far below the pipeline's noise floor, and the bound is what the
    * store trades for O(tokens) storage (see [[exactSubstrStore]]). */
  private def gramKeyed(grams: DataFrame): DataFrame =
    grams.select(col("doc_id"), col("pos"),
      xxhash64(col("gram")).as("g1"),
      xxhash64(lit("graft:exsub:g2"), col("gram")).as("g2"))

  /** History-side exact-substring store: DISTINCT L-grams under the
    * 128-bit [[gramKeyed]] key with their occurrence counts — write it
    * bucketed BY (g1, g2) so the incremental probe's join is
    * exchange-free on the store side (the q75 store discipline applied
    * to the q444 family). Storing the hash pair instead of the literal
    * L-token string drops the store from O(tokens × L) characters to
    * O(tokens) fixed-width rows — at Lee et al.'s L=50 over 100 TB
    * that is the difference between a ~50× text-volume store and a
    * store smaller than the corpus; the price is the documented
    * ~2^-128-per-pair collision bound of [[gramKeyed]]. */
  def exactSubstrStore(history: DataFrame, idCol: String, textCol: String,
                       windowL: Int = 4): DataFrame =
    gramKeyed(lWindowGrams(history, idCol, textCol, windowL))
      .groupBy("g1", "g2").agg(count(lit(1)).as("n_hist"))

  /** INCREMENTAL exact-substring dedup: probe a NEW batch's L-windows
    * against the persisted history store — O(batch) work per
    * increment, never a rescan of history (the q75/q392/q141 store
    * lifecycle completing the dedup-family symmetry for the exact
    * member). Per batch doc: window count, windows whose gram exists
    * in history, maximal contaminated runs, longest contaminated span
    * — the per-document report a crawl pipeline reads before
    * admitting the batch.
    *
    * Scale: the batch's [[gramKeyed]] windows hash-join the
    * (g1, g2)-bucketed store (store side exchange-free,
    * PlanSpec-pinned; the store carries hash pairs, never literal
    * grams — collision bound at [[gramKeyed]]); runs/census ride
    * doc-partitioned windows over batch grain only. */
  def incrementalExactSubstr(batch: DataFrame, store: DataFrame,
                             idCol: String, textCol: String,
                             windowL: Int = 4): DataFrame = {
    import graft.rel.Queries.femit
    val hits = gramKeyed(lWindowGrams(batch, idCol, textCol, windowL))
      .join(store, Seq("g1", "g2"), "left_semi")
      .select("doc_id", "pos")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = hits
      .withColumn("isl", col("pos") - row_number().over(wDoc))
      .groupBy("doc_id", "isl")
      .agg(min(col("pos")).as("start"),
        (max(col("pos")) + lit(windowL)).as("end"))
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_runs"),
        sum(col("end") - col("start") - lit(windowL) + 1L)
          .as("n_hist_windows"),
        max(col("end") - col("start")).as("longest_span_tokens"))
    exactSubstrCensus(batch, idCol, textCol, windowL)
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_hist_windows"), lit(0L)).as("n_hist_windows"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("longest_span_tokens"), lit(0L))
          .as("longest_span_tokens"),
        femit(coalesce(col("n_hist_windows"), lit(0L)).cast("double") /
          nullif(col("n_windows"), lit(0L)).cast("double"))
          .as("hist_share"))
      .orderBy("doc_id")
  }

  /** The ExactSubstr CUT — the transform Lee et al. actually apply
    * (remove every duplicated span, keep one canonical occurrence):
    * an L-window is REDUNDANT iff its content is duplicated AND this
    * occurrence is not the canonical first (rank 1 by (doc_id, pos)
    * within the window's name group); a token is cut iff EVERY window
    * covering it is redundant (so unique context and canonical
    * occurrences survive intact, and cut regions are exactly the
    * non-canonical duplicated spans minus their shared borders).
    * Emits per doc: the cleaned text (survivors reassembled in
    * original order — the q51 lineDedup regroup), token/cut counts.
    *
    * Determinism: canonical pick is the total (doc_id, pos) order;
    * everything else is integer set algebra.
    *
    * Scale: windows fan out ×L to their covered tokens (one explode +
    * one (doc, token-pos) hash-agg — corpus-linear); the canonical
    * pick is a min-struct/count AGGREGATE keyed by name (map-side
    * partials, so a boilerplate gram whose name group holds 10^8
    * occurrences at web scale costs a partial-agg lattice, never one
    * task's per-group sort — the naming chain's own min-label trick;
    * the earlier row_number window here was the r14 VERDICT's one
    * weak row); reassembly is the per-doc regroup. */
  def exactSubstrCut(docs: DataFrame, idCol: String, textCol: String,
                     windowL: Int = 4): DataFrame =
    exactSubstrCutFromNamed(docs,
      exactSubstrNamed(docs, idCol, textCol, windowL).localCheckpoint(),
      idCol, textCol, windowL)

  /** [[exactSubstrCut]] driven from a pre-built named-window table
    * (the stamped `exact_substr_named_store` — the naming chain is the
    * expensive per-fixture build q444 declares from scratch; the cut
    * is its repeated consumer, the q417/q435 store discipline). */
  def exactSubstrCutFromNamed(docs: DataFrame, named: DataFrame,
                              idCol: String, textCol: String,
                              windowL: Int = 4): DataFrame = {
    // canonical = the name group's min (doc_id, pos) — the same total
    // order the old rank-1 window used, computed as a skew-immune
    // aggregate instead of a per-group sort
    val stats = named.groupBy("nm")
      .agg(min(struct(col("doc_id"), col("pos"))).as("canon"),
        count(lit(1)).as("occ"))
    val redundant = named.join(stats, "nm")
      .select(col("doc_id"), col("pos"),
        (col("occ") >= 2 &&
          struct(col("doc_id"), col("pos")) =!= col("canon")).as("red"))
    // token is cut iff ALL covering windows are redundant
    val covered = redundant.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(windowL - 1)))
          .as("tp"), col("red"))
      .groupBy("doc_id", "tp")
      .agg(min(when(col("red"), 1L).otherwise(0L)).as("cut"))
      .where(col("cut") === 1L)
      .select(col("doc_id"), col("tp"))
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(filter(split(col(textCol), " ", -1), t => t =!= ""))
        .as(Seq("pos", "t")))
    tok.join(covered, tok("doc_id") === covered("doc_id")
        && tok("pos") === covered("tp"), "left")
      .select(tok("doc_id"), tok("pos"), tok("t"),
        covered("tp").isNotNull.as("cut"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cut"), 1L).otherwise(0L)).as("n_cut"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(!col("cut"), struct(col("pos"), col("t"))))),
          e => e.getField("t"))).as("clean"))
      .orderBy("doc_id")
  }
}
