package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
  private val nearDup = base.replace("tonight", "today") // high shingle overlap
  private val unrelated = "completely different words about database engines and query plans here now"

  private def docs: DataFrame = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated), (3L, base) // 3 = exact dup of 0
  ).toDF("doc_id", "text")

  test("shingles: distinct k-token windows, short docs yield none") {
    val sh = Seq((0L, "a b c d"), (1L, "a b"), (2L, "a b a b a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(0L) == Set("a b c", "b c d"))
    assert(sh(1L) == Set.empty)
    assert(sh(2L) == Set("a b a", "b a b")) // distinct
  }

  test("native ShingleArray equals the HOF shingle form on the real corpus") {
    graft.functions.TextExprs.register(spark)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val edge = Seq((9001L, ""), (9002L, "a b"), (9003L, "a  b c "), (9004L, "x y x y x y"))
      .toDF("doc_id", "text")
    val both = real.select(col("doc_id"), col("text")).unionAll(edge)
    val native = both.select(col("doc_id"),
        graft.functions.TextExprs.shingles("text", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = both.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.size == hof.size && native == hof, "order-sensitive equality")
  }

  test("minhash finds the exact and near duplicate, not the unrelated doc") {
    val got = Dedup.minhashNearDups(docs, "doc_id", "text", k = 3,
      nBuckets = 64, bandSize = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.contains((0L, 3L)) && got((0L, 3L)) == 1.0, "exact dup")
    assert(got.contains((0L, 1L)) && got((0L, 1L)) > 0.5, "near dup")
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L }, "unrelated")
  }

  test("minhash jaccard column equals brute-force ngram jaccard") {
    val mh = Dedup.minhashNearDups(docs, "doc_id", "text", k = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, maxId = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val overlapping = mh.filter(_._2 > 0)
    assert(overlapping.nonEmpty)
    overlapping.foreach { case (k, j) => assert(bf(k) == j, s"pair $k") }
  }

  test("simhash: identical docs collide at hamming distance 0") {
    val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 3L)) == 0L, "identical => distance 0")
    // short docs flip enough bits that band-collision for the near-dup is
    // probabilistic — only assert it is NOT paired with the unrelated doc
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhashAgg (codegen form) equals the per-row fold form") {
    graft.functions.HashExprs.register(spark)
    val perRow = docs
      .select(col("doc_id"),
        Dedup.tokenHashes("text", graft.functions.Fnv1a32.Seed2).as("hh"),
        Dedup.tokenHashes("text").as("hl"))
      .select(col("doc_id"),
        Dedup.simhash32(col("hh")).as("hi"), Dedup.simhash32(col("hl")).as("lo"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val agg = Dedup.simhashAgg(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(perRow == agg)
  }

  test("incrementalComponents: merges, new nodes, untouched pass-through") {
    // stored graph: {1,2,3} (component 1), {10,11} (component 10),
    // {20,21} (component 20). Fresh edges: 3-10 (merges comps 1 and 10),
    // 30-31 (brand-new nodes). Component 20 must pass through untouched.
    val stored = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("d1", "d2")
    val labels = Dedup.connectedComponents(stored)
    val fresh = Seq((3L, 10L), (30L, 31L)).toDF("d1", "d2")
    val got = Dedup.incrementalComponents(stored, labels, fresh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Dedup.connectedComponents(stored.unionAll(fresh))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"got $got")
    assert(got(11L) == 1L, "merged component must relabel to the common min")
    assert(got(31L) == 30L && got(21L) == 20L)
  }

  test("incrementalComponents equals from-scratch CC on the real pair graph") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashNearDups(real, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4, threshold = 0.05).localCheckpoint()
    val stored = pairs.where(col("d1") % 3 =!= 0 && col("d2") % 3 =!= 0)
    val fresh = pairs.where(col("d1") % 3 === 0 || col("d2") % 3 === 0)
    val got = Dedup.incrementalComponents(stored,
        Dedup.connectedComponents(stored), fresh)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("prefixFilterJoin is lossless: equals brute-force all-pairs at the threshold") {
    // real corpus: every pair the brute-force join finds at τ=0.5 must
    // come out of the prefix-filtered join with the identical jaccard —
    // prefix filtering is exact, unlike LSH (no false-negative budget)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.prefixFilterJoin(real, "doc_id", "text",
        k = 3, tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = Dedup.ngramJaccardPairs(real, "doc_id", "text", k = 3,
        maxId = Long.MaxValue)
      .where(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got == bf, s"prefix-filtered=${got.size} brute=${bf.size}")
    // synthetic: both dup pairs found, the unrelated doc untouched
    val syn = Dedup.prefixFilterJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(syn((0L, 3L)) == 1.0, "exact dup at jaccard 1")
    assert(syn.contains((0L, 1L)) && syn.contains((1L, 3L)), syn.toString)
    assert(!syn.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("fuzzyJoin: blocked Levenshtein matches, blocking contract holds") {
    val titles = Seq(
      (0L, "spark join order report"),   // near-match of 1 (dist 2)
      (1L, "spark join ordre report"),
      (2L, "flink join order report"),   // different first token: blocked out
      (3L, "spark join order report with many extra tokens here")) // length block differs
      .toDF("doc_id", "title")
    val got = Dedup.fuzzyJoin(titles, "doc_id", "title", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((0L, 1L)), got.toString)
    assert(got((0L, 1L)) == 2L) // transposition = 2 single-char edits
  }

  test("incremental dedup equals full-corpus near-dups restricted to cross-batch pairs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = real.where(col("doc_id") % 2 === 0)
    val fresh = real.where(col("doc_id") % 2 === 1)
    // Cap disabled on BOTH sides: the equality is a true invariant only
    // away from maxBucket (the store caps on history-only bucket size,
    // the full pass on combined size — a bucket straddling the cap
    // diverges by design), so the equivalence is asserted cap-free.
    val store = Dedup.minhashSignatureStore(history, "doc_id", "text",
      maxBucket = Int.MaxValue)
    val inc = Dedup.incrementalNearDups(fresh, store, history,
        "doc_id", "text", threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The full single-corpus pass over history ∪ fresh, keeping only
    // cross-parity pairs reoriented (fresh, hist) — candidate generation
    // and verify must agree exactly with the store-probe path.
    val full = Dedup.minhashNearDups(real, "doc_id", "text", threshold = 0.1,
        maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a % 2 != b % 2 }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }.toSet
    assert(inc.nonEmpty && inc == full)
  }

  test("mergeSignatureStore equals the from-scratch store over both generations") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gen0 = real.where(col("doc_id") % 3 === 0)
    val gen1 = real.where(col("doc_id") % 3 === 1)
    // Cap-free on both paths, same rationale as the incremental-dedup
    // equivalence above: the per-generation cap schedule diverges from
    // the combined one only AT the cap.
    def canon(df: DataFrame) = df
      .select(col("band"), col("bkey"), array_sort(col("ids")).as("ids"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList)).toSet
    val merged = canon(Dedup.mergeSignatureStore(
      Dedup.minhashSignatureStore(gen0, "doc_id", "text", maxBucket = Int.MaxValue),
      gen1, "doc_id", "text", maxBucket = Int.MaxValue))
    val scratch = canon(Dedup.minhashSignatureStore(
      gen0.unionAll(gen1), "doc_id", "text", maxBucket = Int.MaxValue))
    assert(merged.nonEmpty && merged == scratch)
  }

  test("fnv1a32 matches published FNV-1a vectors and stays in [0, 2^32)") {
    graft.functions.HashExprs.register(spark)
    val got = Seq((0L, ""), (1L, "a"), (2L, "abc"), (3L, "the quick brown"),
      (4L, "42 dozen -7 +3."))
      .toDF("id", "s")
      .select(col("id"), graft.functions.HashExprs.fnv1a32("s").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0-2: standard FNV-1a 32 vectors; 3-4: cross-checked against the
    // DuckDB fold the oracles use (unicode(s[i:i]) code-point iteration).
    assert(got == Map(0L -> 2166136261L, 1L -> 3826002220L, 2L -> 440920331L,
      3L -> 4046433963L, 4L -> 4242993283L))
    assert(got.values.forall(h => h >= 0 && h < (1L << 32)))
  }
}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents closes chains to one canonical survivor") {
    // a~b, b~c must land in ONE component (pairwise dedup alone would
    // keep two survivors); disconnected pairs stay separate
    val pairs = Seq((5L, 1L), (5L, 9L), (20L, 21L), (9L, 30L))
      .toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 30L -> 1L,
      20L -> 20L, 21L -> 20L), got.toString)
  }
}

class SimSpec extends SparkSpec {
  import spark.implicits._

  private def embDf(vs: Seq[(Long, Seq[Float])]): DataFrame =
    vs.toDF("vec_id", "embedding")

  test("cosineKnn matches a plain-Scala brute force on random vectors") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 30L).map(i => i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expected = (0L until 3L).flatMap { q =>
      vecs.filter(_._1 != q)
        .map { case (i, v) => (i, cos(vecs(q.toInt)._2, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(4)
        .zipWithIndex.map { case ((i, _), r) => (q, r + 1L, i) }
    }.toSet
    val got = Sim.cosineKnn(embDf(vecs), nQuery = 3, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("mmrDiversify equals a plain-Scala greedy MMR on random vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 30L).map(i => i -> Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val lam = 0.7; val mu = 1.0 - lam
    val expected = (0L until 3L).flatMap { q =>
      val cands = vecs.filter(_._1 != q)
        .map { case (i, v) => (i, cos(vecs(q.toInt)._2, v)) }
        .sortBy { case (i, s) => (-s, i) }.take(10)
      var sel = Vector.empty[Long]
      (1 to 4).map { r =>
        val scored = cands.filter(c => !sel.contains(c._1)).map { case (i, s) =>
          if (sel.isEmpty) (i, s * lam)
          else {
            val pen = sel.map(j => cos(vecs(i.toInt)._2, vecs(j.toInt)._2)).max
            (i, s * lam - pen * mu)
          }
        }
        val pick = scored.sortBy { case (i, sc) => (-sc, i) }.head
        sel :+= pick._1
        (q, r.toLong, pick._1)
      }
    }.toSet
    val got = Sim.mmrDiversify(embDf(vecs), nQuery = 3, pool = 10, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("lsh buckets: identical vectors share a bucket; annKnn finds the twin") {
    val rnd = new scala.util.Random(9)
    val v0 = Seq.fill(16)(rnd.nextFloat())
    val vecs = (0L, v0) +: (1L, v0) +: (2L until 20L).map(i => i -> Seq.fill(16)(rnd.nextFloat()))
    val ann = Sim.annKnn(embDf(vecs), nQuery = 1, k = 3,
      nTables = 2, bandPlanes = 4, dim = 16)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ann.nonEmpty && ann.head == (1L, 1L), s"twin vector first: ${ann.toSeq}")
  }

  test("cosineNearDupsLsh maxBucket drops degenerate hot buckets") {
    val rnd = new scala.util.Random(3)
    val twin = Seq.fill(16)(rnd.nextFloat())
    val vecs = (0L until 50L).map(i => i -> twin) // all identical => one hot bucket
    val full = Sim.cosineNearDupsLsh(embDf(vecs), 0.9,
      nTables = 2, bandPlanes = 4, dim = 16)
    assert(full.count() == 50L * 49 / 2, "uncapped: all pairs verified")
    val capped = Sim.cosineNearDupsLsh(embDf(vecs), 0.9,
      nTables = 2, bandPlanes = 4, dim = 16, maxBucket = 10)
    assert(capped.count() == 0, "hot bucket dropped before pair expansion")
  }

  test("native SignBands equals the interpreted HOF bucket form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v = emb.select(col("vec_id"), Sim.asDouble(col("embedding")).as("v"))
    val native = v.select(col("vec_id"),
        Sim.lshBucket(v, "v", 16, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = v.select(col("vec_id"),
        Sim.lshBucketHof(col("v"), 16, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size == 500 && native == hof)
  }
}

/** Recall of the approximate scale paths against their exact baselines
  * on the real sf0.001 corpus. Planes/hashes are deterministic, so these
  * are exact repeatable measurements with a safety margin, not flaky
  * statistical assertions. */
class RecallSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def phashBrute(maxDist: Int): Set[(Long, Long)] = {
    val sig = Multimodal.perceptualHash(docs)
    val a = sig.select(col("doc_id").as("d1"), col("ph_hi").as("h1"),
      col("ph_lo").as("l1"))
    val b = sig.select(col("doc_id").as("d2"), col("ph_hi").as("h2"),
      col("ph_lo").as("l2"))
    a.join(b, col("d1") < col("d2"))
      .where((bit_count(col("h1").bitwiseXOR(col("h2")))
        + bit_count(col("l1").bitwiseXOR(col("l2")))) <= maxDist)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("perceptualNearDups maxDist=3 equals brute-force Hamming (pigeonhole-lossless)") {
    val brute = phashBrute(3)
    val lsh = Multimodal.perceptualNearDups(docs, maxDist = 3)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no close perceptual pairs")
    assert(lsh == brute,
      s"lossless claim broken: lsh=${lsh.size} brute=${brute.size} " +
        s"missing=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)}")
  }

  test("perceptualNearDups salted spill (maxBucket=1) stays lossless") {
    // every >1 bucket takes the salted self-join path; output must not move
    val spilled = Multimodal.perceptualNearDups(docs, maxDist = 3, maxBucket = 1)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spilled == phashBrute(3), s"spill path lost pairs: ${spilled.size}")
  }

  test("perceptualNearDups maxDist=8 (9 MIH bands) also equals brute force") {
    // multi-index hashing: maxDist+1 bands are pigeonhole-lossless at
    // ANY radius, so recall is exactly 1 here too — not a tuned floor
    val brute = phashBrute(8)
    val lsh = Multimodal.perceptualNearDups(docs, maxDist = 8)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && lsh == brute,
      s"lsh=${lsh.size} brute=${brute.size}")
  }

  test("banded-LSH near-dup recall >= 0.8 vs exact all-pairs at sim 0.35") {
    val exact = Sim.cosineNearDups(emb, maxId = Long.MaxValue, threshold = 0.35)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Sim.cosineNearDupsLsh(emb, threshold = 0.35,
      nTables = 16, bandPlanes = 4, dim = 64)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.8, s"recall=$recall over ${exact.size} pairs")
    assert((lsh -- exact).isEmpty, "verified pairs must be a subset of the exact set")
  }

  test("banded-LSH annKnn recall >= 0.7 vs exact top-5") {
    val exact = Sim.cosineKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Sim.annKnn(emb, nQuery = 10, k = 5,
      nTables = 16, bandPlanes = 4, dim = 64)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall over ${exact.size} exact neighbors")
  }

  test("sq8Knn recall >= 0.9 vs exact top-5; sims are exact cosines") {
    // int8 quantization over a 64-dim corpus keeps relative dot error
    // ~1/127 per term, so with a 4x rerank margin the exact top-5
    // almost always survives the candidate cut; and because the final
    // ranking re-scores candidates at full precision, every (qid,
    // vec_id) the two paths SHARE must carry a bit-identical sim.
    val exact = Sim.cosineKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sq8 = Sim.sq8Knn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = (sq8.keySet & exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall over ${exact.size} exact neighbors")
    (sq8.keySet & exact.keySet).foreach { k =>
      assert(sq8(k) == exact(k), s"rerank sim drifted for $k")
    }
  }

  test("binaryKnn recall >= 0.8 vs exact top-5; shared sims are exact cosines") {
    // sign-bit codes keep only the orientation octant — with a 25.6x
    // rerank margin (128 candidates for k=5; doubled in r11 when the
    // measured 0.72 sat 0.02 over the old 0.7 floor) the Hamming
    // pre-ranking retains the exact top-5 (E[ham] = d*theta/pi,
    // Charikar 2002); the tail re-scores at full precision so shared
    // pairs carry bit-identical sims.
    val exact = Sim.cosineKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val bin = Sim.binaryKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = (bin.keySet & exact.keySet).size.toDouble / exact.size
    info(s"binaryKnn recall=$recall at rerank=128")
    assert(recall >= 0.8, s"recall=$recall over ${exact.size} exact neighbors")
    (bin.keySet & exact.keySet).foreach { k =>
      assert(bin(k) == exact(k), s"rerank sim drifted for $k")
    }
  }

  test("pqKnn recall vs exact top-5; shared sims are exact cosines") {
    val exact = Sim.cosineKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pq = Sim.pqKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = (pq.keySet & exact.keySet).size.toDouble / exact.size
    // one refineSubCodebook Lloyd pass over the init codebooks (was
    // 0.52 unrefined — the r9 VERDICT item)
    assert(recall >= 0.7,
      s"recall=$recall over ${exact.size} exact neighbors")
    (pq.keySet & exact.keySet).foreach { k =>
      assert(pq(k) == exact(k), s"rerank sim drifted for $k")
    }
  }

  test("ivfpqKnn recall vs exact top-5; shared sims are exact cosines") {
    val exact = Sim.cosineKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivfpq = Sim.ivfpqKnn(emb, nQuery = 10, k = 5)
      .select("qid", "vec_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recall = (ivfpq.keySet & exact.keySet).size.toDouble / exact.size
    // two approximations compound (nprobe/nlist pruning × residual
    // codes); the refined residual codebooks (one Lloyd pass) clear
    // 0.7 anyway (was 0.46 unrefined — the r9 VERDICT item)
    assert(recall >= 0.7,
      s"recall=$recall over ${exact.size} exact neighbors")
    (ivfpq.keySet & exact.keySet).foreach { k =>
      assert(ivfpq(k) == exact(k), s"rerank sim drifted for $k")
    }
  }

  test("sortedNeighborhood equals the ideal single-window SNM on real titles") {
    import org.apache.spark.sql.functions.{concat_ws, slice, split}
    val titled = docs.select(col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " ", -1), 1, 5)).as("title"))
    val got = Dedup.sortedNeighborhood(titled, "doc_id", "title",
        w = 4, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // plain-Scala ideal: global sort by (title, id), pairs at rank
    // distance 1..3, Levenshtein <= 10
    val rows = titled.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, t) => (t, id) }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      i <- rows.indices; j <- (i + 1) until math.min(i + 4, rows.length)
      d = lev(rows(i)._2, rows(j)._2) if d <= 10
    } yield (math.min(rows(i)._1, rows(j)._1),
      math.max(rows(i)._1, rows(j)._1)) -> d.toLong).toMap
    assert(got == expect && got.nonEmpty, s"got=${got.size} expect=${expect.size}")
  }

  test("fuzzyJoin: perfect precision; measured blocking recall >= 0.4") {
    import org.apache.spark.sql.functions.{concat_ws, slice, split}
    // Brute-force all-pairs edit distance over the derived titles vs the
    // blocked path — the blocking contract quantified the way the
    // MinHash/ANN contracts are. Precision is exactly 1 (candidates are
    // exact-verified); recall measures 0.49 on THIS corpus, whose
    // titles are 5 anchor-free random vocab words — pairs within edit
    // 10 often share neither the first token nor (measured: unioning a
    // last-token key only lifts it to 0.58) any positional anchor.
    // Real titles share anchors; the floor pins the corpus-honest value.
    val titled = docs.select(col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " ", -1), 1, 5)).as("title"))
    val a = titled.select(col("doc_id").as("d1"), col("title").as("t1"))
    val b = titled.select(col("doc_id").as("d2"), col("title").as("t2"))
    val bf = a.join(b, col("d1") < col("d2"))
      .where(levenshtein(col("t1"), col("t2")) <= 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.fuzzyJoin(titled, "doc_id", "title", maxDist = 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(bf), "blocking must not invent pairs")
    val recall = (blocked & bf).size.toDouble / bf.size
    assert(bf.nonEmpty && recall >= 0.4, s"recall=$recall over ${bf.size} pairs")
  }

  test("fuzzyJoin maxBucket SPILLS degenerate blocks losslessly (r9)") {
    import spark.implicits._
    // 5 identical titles (one block past the cap) + a distinct
    // near-pair: the oversized block must route through the salted
    // spill join and still yield every within-block pair — maxBucket
    // is a routing threshold, never a drop (VERDICT r8 item 3).
    val titles = (0L until 5L).map(i => (i, "same same same"))
      .toSeq :+ (10L, "other title here") :+ (11L, "other title hare")
    val df = titles.toDF("doc_id", "title")
    val spilled = Dedup.fuzzyJoin(df, "doc_id", "title", maxDist = 5, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.fuzzyJoin(df, "doc_id", "title", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spilled == uncapped, s"spilled=$spilled uncapped=$uncapped")
    assert(uncapped.size == 11) // C(5,2) identical pairs + the near-pair
  }

  test("prefixFilterJoin stays brute-force-equal with a forced spill (r9)") {
    // cap of 2 forces EVERY >2-doc prefix bucket through the salted
    // spill path on the real corpus; the result must still equal the
    // default-cap (all in-task) run bit for bit — the lossless contract
    // the gate's brute-force oracle assumes at any bucket size.
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spilled = Dedup.prefixFilterJoin(real, "doc_id", "text",
        k = 3, tauNum = 1, tauDen = 2, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inTask = Dedup.prefixFilterJoin(real, "doc_id", "text",
        k = 3, tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(spilled == inTask, s"spilled=${spilled.size} inTask=${inTask.size}")
    assert(spilled.nonEmpty)
  }

  test("minhash candidate recall >= 0.8 vs brute force at jaccard 0.5") {
    // LSH banding is a high-similarity detector: with 16 bands of 4
    // bucket-mins the S-curve midpoint is ~(1/16)^(1/4) ≈ 0.5, so the
    // recall contract is over pairs with jaccard >= 0.5 (lower-jaccard
    // pairs fall below the curve by design).
    val bf = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, maxId = Long.MaxValue)
      .where(col("jaccard") >= 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (cand & bf).size.toDouble / bf.size
    assert(bf.nonEmpty && recall >= 0.8, s"recall=$recall over ${bf.size} pairs")
  }

  test("MinHash LSH recall vs the lossless prefix-filter join at J >= 0.5") {
    // The exact set is q132's machinery (prefix filtering loses
    // nothing); the LSH set is q18's banded MinHash at its declared
    // parameters, restricted to the same threshold. Verified LSH pairs
    // must be a subset of the exact set (no false positives survive
    // the exact verify), and the measured recall is the honest number
    // the q18 scaladoc's banding math promises (r=4 rows x b=16 bands
    // -> P(candidate) = 1-(1-J^4)^16; at J=0.5 that is ~0.65 PER PAIR,
    // rising steeply with J — so the floor here is deliberately 0.5,
    // not a marketing number).
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.prefixFilterJoin(corpus, "doc_id", "text",
        k = 3, tauNum = 1, tauDen = 2)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(corpus, "doc_id", "text",
        k = 3, nBuckets = 64, bandSize = 4, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty,
      "verified LSH pairs must be a subset of the exact >= 0.5 set")
    val recall = if (exact.isEmpty) 1.0 else (lsh & exact).size.toDouble / exact.size
    assert(exact.nonEmpty && recall >= 0.5,
      s"recall=$recall over ${exact.size} exact pairs")
  }
}

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("distributed shardPack equals the single-window reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = Pack.shardPack(docs, budget = 4096, nPartitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = Pack.shardPackNaive(docs, budget = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist.size == 500 && dist == naive)
  }

  test("shard boundaries: a doc belongs to the shard of its first token") {
    // token counts 4,4,4,4; budget 10 => starting offsets 0,4,8,12 =>
    // shards 0,0,0,1
    val docs = Seq((0L, "a b c d"), (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Pack.shardPack(docs, budget = 10, nPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("stratifiedSample is deterministic and matches the hash formula") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rates = Map("en" -> 50, "de" -> 30)
    val got = Pack.stratifiedSample(docs, rates, defaultRate = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.select("doc_id", "lang").collect().filter { r =>
      val h = (r.getLong(0) * 2654435761L) % 4294967296L % 100L
      h < rates.getOrElse(r.getString(1), 10)
    }.map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty && got.size < 500)
  }

  test("stratifiedSample hash survives the full doc_id domain (no Long wrap)") {
    // Above doc_id ~3.47e9 a direct doc_id * 2654435761 wraps Spark's
    // non-ANSI Long (and overflows DuckDB's BIGINT); the 16-bit-split
    // reduction must still equal the exact BigInt arithmetic.
    val ids = Seq(0L, 1L, 3470000000L, 4294967295L, 4294967296L,
      1234567890123L, Long.MaxValue)
    val docs = ids.map(id => (id, "en")).toDF("doc_id", "lang")
    val got = Pack.stratifiedSample(docs, Map("en" -> 50), defaultRate = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = ids.filter { id =>
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L))
        .mod(BigInt(100)) < 50
    }.toSet
    assert(got == expected)
  }
}

class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3×rsd of exact across cardinalities") {
    // rsd is a standard deviation, not a hard bound — individual
    // cardinalities can deviate ~1-2σ (measured 6.6% at card=5000 with
    // rsd=0.05), so the property bound is 3σ.
    for (card <- Seq(100, 5000, 50000)) {
      val df = (1 to 4 * card).map(i => (i % card).toLong).toDF("k")
      val r = df.agg(
        approx_count_distinct(col("k"), 0.05).cast("double").as("a"),
        countDistinct(col("k")).cast("double").as("e")).head()
      val rel = math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1)
      assert(rel < 0.15, s"card=$card rel=$rel")
    }
  }

  test("q30 bound holds on the real lineitem table (sf0.001)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).cast("double").as("a"),
      countDistinct(col("l_partkey")).cast("double").as("e")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1) < 0.05)
  }

  test("EmbeddingDim constant matches the driver data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(d == Seq(Queries.EmbeddingDim))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "der hund ist und bleibt", "de"),
    (2L, "el la que los gatos", "es"))
    .toDF("doc_id", "text", "lang")

  test("tokenStats counts ws and regex tokens") {
    val df = Seq((0L, "ab 12 c-d !x", "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.tokenStats(df).collect().head
    assert(r.getLong(1) == 4L) // ws tokens
    // regex: ab, 12, c, -, d, !, x
    assert(r.getLong(2) == 7L)
    assert(r.getLong(3) == 12L)
  }

  test("langId votes by stopword lists with deterministic tiebreak") {
    val got = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got == Map(0L -> "en", 1L -> "de", 2L -> "es"))
  }

  test("naiveBayes matches a plain-Scala recompute on a hand fixture") {
    // train (even ids): class x emits mostly 'a', class y mostly 'b'
    val fix = Seq(
      (0L, "a a b", "x"), (2L, "a a a", "x"), (4L, "b b a", "y"),
      (6L, "b b b", "y"),
      // test (odd ids)
      (1L, "a a", "x"), (3L, "b b", "y"), (5L, "a b", "x"),
      (7L, "b a b", "x"))
      .toDF("doc_id", "text", "lang")
    // plain-Scala recompute with the operator's own float discipline:
    // each ln truncated to 12 dp before summation, output rounded to 6
    def d12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val train = Map("x" -> Seq("a", "a", "b", "a", "a", "a"),
      "y" -> Seq("b", "b", "a", "b", "b", "b"))
    val vocab = Seq("a", "b")
    val priors = Map("x" -> 2, "y" -> 2) // train docs per class
    def score(tokens: Seq[String], cls: String): Double = {
      val cnt = train(cls).groupBy(identity).view.mapValues(_.size).toMap
      val tot = train(cls).size
      val s = tokens.filter(vocab.contains).map { t =>
        d12(math.log((cnt.getOrElse(t, 0) + 1.0) / (tot + vocab.size)))
      }.sum + d12(math.log(priors(cls).toDouble / 4.0))
      (s.setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
    }
    val tests = Map(1L -> Seq("a", "a"), 3L -> Seq("b", "b"),
      5L -> Seq("a", "b"), 7L -> Seq("b", "a", "b"))
    val expectPred = tests.map { case (id, ts) =>
      id -> Seq("x", "y").map(c => (c, score(ts, c)))
        .sortBy { case (c, sc) => (-sc, c) }.head._1
    }
    // doc1 -> x, doc3 -> y, doc7 -> y by construction
    assert(expectPred(1L) == "x" && expectPred(3L) == "y"
      && expectPred(7L) == "y")
    val trueLang = Map(1L -> "x", 3L -> "y", 5L -> "x", 7L -> "x")
    val expectConfusion = expectPred.toSeq
      .map { case (id, p) => (trueLang(id), p) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.naiveBayes(fix).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expectConfusion, s"engine=$got brute=$expectConfusion")
  }

  test("naiveBayes confusion rows cover every scored test doc") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextAnalysis.naiveBayes(corpus).collect()
    val scored = out.map(_.getLong(2)).sum
    val odd = corpus.where(pmod(col("doc_id"), lit(2L)) === 1L).count()
    // every odd doc with at least one train-vocab token gets exactly
    // one prediction; the synthetic corpus' 31-token vocab means all do
    assert(scored == odd, s"$scored scored vs $odd odd docs")
    val langs = corpus.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(out.map(_.getString(1)).toSet.subsetOf(langs))
  }

  test("decisionStump finds the perfectly-separating threshold") {
    val fix = Seq(
      (0L, 1L, "en"), (1L, 2L, "en"), (2L, 10L, "de"), (3L, 11L, "de"))
      .toDF("doc_id", "n_chars", "lang")
    val r = TextAnalysis.decisionStump(fix).collect().head
    assert(r.getLong(0) == 2L, s"threshold ${r.getLong(0)}") // x <= 2 left
    assert(r.getDouble(1) == 0.0, s"gini ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.5, s"gain ${r.getDouble(2)}") // parent gini
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L) // left: n=2, pos=2
    assert(r.getLong(5) == 2L && r.getLong(6) == 0L) // right: n=2, pos=0
  }

  test("decisionStump partitions the corpus: left + right = all docs") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = TextAnalysis.decisionStump(corpus).collect().head
    assert(r.getLong(3) + r.getLong(5) == corpus.count())
    val pos = corpus.where(col("lang") === "en").count()
    assert(r.getLong(4) + r.getLong(6) == pos)
    assert(r.getDouble(2) >= 0.0) // a best split never increases impurity
  }

  test("winnow matches the plain-Scala rightmost-min selection") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = "a b c d e f g h"
    val fix = Seq((0L, text)).toDF("doc_id", "text")
    val toksA = text.split(" ")
    val k = 3; val w = 4
    val hashes = (0 to toksA.length - k).map { j =>
      graft.functions.Fnv1a32.compute(
        UTF8String.fromString(toksA.slice(j, j + k).mkString(" ")),
        graft.functions.Fnv1a32.Seed)
    }
    val nk = hashes.length // 6
    val starts = 0 to math.max(0, nk - w)
    val sel = starts.map { i =>
      val win = (i until math.min(i + w, nk)).map(j => (j, hashes(j)))
      // rightmost minimum: min hash, max position on ties
      win.minBy { case (j, h) => (h, -j) }
    }.distinct
    val got = TextAnalysis.winnow(fix, k, w).collect().head
    assert(got.getLong(1) == nk.toLong, s"n_kgrams ${got.getLong(1)}")
    assert(got.getLong(2) == sel.length.toLong,
      s"n_fps ${got.getLong(2)} vs ${sel.length}")
    assert(got.getLong(3) == sel.map(_._2).min, "min_fp")
  }

  test("winnow guarantee: shared run of >= w+k-1 tokens shares a fingerprint") {
    // two docs sharing a 6-token run (w+k-1 = 6) amid distinct noise
    val shared = "p q r s t u"
    val fix = Seq((0L, s"n1 n2 n3 $shared m1 m2"),
      (1L, s"z1 $shared z2 z3 z4")).toDF("doc_id", "text")
    // recompute the full selected-(pos,hash) sets per doc
    import org.apache.spark.unsafe.types.UTF8String
    def sel(text: String): Set[(Int, Long)] = {
      val ts = text.split(" "); val k = 3; val w = 4
      val hs = (0 to ts.length - k).map(j =>
        graft.functions.Fnv1a32.compute(
          UTF8String.fromString(ts.slice(j, j + k).mkString(" ")),
          graft.functions.Fnv1a32.Seed))
      (0 to math.max(0, hs.length - w)).map { i =>
        (i until math.min(i + w, hs.length)).map(j => (j, hs(j)))
          .minBy { case (j, h) => (h, -j) }
      }.toSet
    }
    val s0 = sel(s"n1 n2 n3 $shared m1 m2")
    val s1 = sel(s"z1 $shared z2 z3 z4")
    // the winnowing guarantee: a shared hash survives in both docs
    assert(s0.map(_._2).intersect(s1.map(_._2)).nonEmpty)
    // and the engine selects exactly these (pos, hash) counts
    val got = TextAnalysis.winnow(fix, 3, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> s0.size.toLong, 1L -> s1.size.toLong),
      s"engine=$got brute=(${s0.size}, ${s1.size})")
  }

  test("minhashAccuracy: identical docs estimate 1.0; candidates share a band") {
    val fix = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // identical
      (2L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.minhashAccuracy(fix, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4, maxBucket = 1000).collect()
    val pair = got.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(pair.isDefined, got.mkString(","))
    assert(pair.get.getDouble(3) == 1.0 && pair.get.getDouble(4) == 1.0)
    assert(pair.get.getDouble(5) == 0.0)

    // corpus: every candidate pair shares at least one full band of
    // matching bucket-mins, so the estimate is bounded below
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = graft.llm.Dedup.minhashAccuracy(corpus, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4, maxBucket = 1000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // a shared band signature covers the band's OCCUPIED buckets —
      // sparse docs may agree on as little as one bucket-min
      assert(r.getLong(2) >= 1L, r.toString)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("containmentPairs scores a fully-embedded doc at 1.0") {
    val fix = Seq(
      (0L, "a b c d e"),            // 3 shingles, all inside doc 1
      (1L, "x y a b c d e z"),      // 6 shingles
      (2L, "p q r s t u v"))        // unrelated
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.containmentPairs(fix, "doc_id", "text",
      k = 3, dfCap = 20L, threshold = 0.5).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 6L)
    assert(r.getDouble(5) == 1.0, s"containment ${r.getDouble(5)}")
    // the symmetric score would NOT have flagged this pair at 0.5:
    // jaccard = 3 / (3 + 6 - 3) = 0.5 exactly at the boundary, while
    // containment saturates — the asymmetric axis is the signal
    assert(3.0 / 6.0 < r.getDouble(5))
  }

  test("containmentPairs respects the df cap (reduced space)") {
    // shingle "a b c" appears in 3 docs; cap 2 removes it everywhere
    val fix = Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.containmentPairs(fix, "doc_id", "text",
      k = 3, dfCap = 2L, threshold = 0.0).collect()
    assert(got.isEmpty, got.mkString(","))
  }

  test("heapsLaw curve equals the plain-Scala streaming recompute") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val docs = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    var seen = Set.empty[String]
    var cumTok = 0L
    val curve = docs.zipWithIndex.map { case ((_, text), i) =>
      val ts = text.split(" ", -1).filter(_.nonEmpty)
      cumTok += ts.length
      seen ++= ts
      (i + 1L, cumTok, seen.size.toLong)
    }
    val n = docs.length
    val expect = curve.filter { case (rk, _, _) => rk % 50 == 0 || rk == n }
      .map { case (rk, ct, v) => rk -> ((ct, v)) }.toMap
    val got = TextAnalysis.heapsLaw(corpus, every = 50).collect()
    assert(got.map(_.getLong(0)).toSet == expect.keySet)
    got.foreach { r =>
      val (ct, v) = expect(r.getLong(0))
      assert(r.getLong(1) == ct && r.getLong(2) == v, r.toString)
    }
    // β is constant across rows and sits in [0, 1]; the synthetic
    // corpus's 31-token vocabulary saturates inside the first
    // checkpoint, so its curve is flat (β = 0) — a real crawl fits a
    // positive exponent, which the hand-fixture test below pins
    val betas = got.map(_.getDouble(3)).distinct
    assert(betas.length == 1 && betas.head >= 0.0 && betas.head <= 1.0,
      betas.mkString(","))
  }

  test("heapsLaw fits beta = 1 on a corpus of all-new tokens") {
    // every doc introduces exactly 2 never-seen tokens: V(n) = n, so
    // the log-log fit is exactly slope 1, intercept 0
    val fix = (1L to 200L)
      .map(i => (i, s"w${2 * i} w${2 * i + 1}"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.heapsLaw(fix, every = 50).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), r.toString) // tokens == vocab
      assert(r.getDouble(3) == 1.0, s"beta ${r.getDouble(3)}")
      assert(math.abs(r.getDouble(4)) < 1e-6, s"ln_k ${r.getDouble(4)}")
    }
  }

  test("cohensKappa assembles the formula from the two prediction sets") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val nb = TextAnalysis.naiveBayesPred(corpus)
      .select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = TextAnalysis.langId(corpus)
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shared = nb.keySet.intersect(li.keySet.filter(_ % 2 == 1))
    val n = shared.size
    val agree = shared.count(d => nb(d) == li(d))
    val classes = (nb.values ++ li.values).toSet
    val sprod = classes.toSeq.map { c =>
      shared.count(d => nb(d) == c).toLong * shared.count(d => li(d) == c)
    }.sum
    val po = agree.toDouble / n
    val pe = sprod.toDouble / (n.toLong * n)
    val kappa = (po - pe) / (1.0 - pe)
    val got = TextAnalysis.cohensKappa(corpus).collect().head
    assert(got.getLong(0) == n.toLong && got.getLong(1) == agree.toLong)
    assert(math.abs(got.getDouble(4) - kappa) < 1e-5,
      s"kappa ${got.getDouble(4)} vs $kappa")
    assert(got.getDouble(4) >= -1.0 && got.getDouble(4) <= 1.0)
  }

  test("fingerprint is stable and order-sensitive") {
    val a = TextAnalysis.fingerprint(Seq((0L, "a b c")).toDF("doc_id", "text"))
      .collect().head.getLong(1)
    val b = TextAnalysis.fingerprint(Seq((0L, "c b a")).toDF("doc_id", "text"))
      .collect().head.getLong(1)
    val a2 = TextAnalysis.fingerprint(Seq((0L, "a b c")).toDF("doc_id", "text"))
      .collect().head.getLong(1)
    assert(a == a2 && a != b)
  }

  test("tfidf: term in every lang gets idf 0") {
    val all = Seq((0L, "x y", "en"), (1L, "x z", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.tfidf(all).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(rows(("en", "x")) == 0.0 && rows(("de", "x")) == 0.0)
    assert(rows(("en", "y")) > 0.0)
  }

  test("bm25: hand-computed goldens on a 2-doc fixture") {
    // docs: (0, "a b a"), (1, "a c") => N=2, sum_dl=5; df(a)=2, df(b)=df(c)=1
    // bm25(0,b) = ln(2)*2.2 / (1 + 1.2*(0.25 + 0.75*3*2/5)) = .640724
    // bm25(1,c) = ln(2)*2.2 / (1 + 1.2*(0.25 + 0.75*2*2/5)) = .754913
    // bm25(0,a) = ln(1.2)*2*2.2 / (2 + 1.38) = .237342 (common term scores low)
    val df = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got((0L, "b")) == 0.640724)
    assert(got((1L, "c")) == 0.754913)
    assert(got((0L, "a")) == 0.237342)
    assert(got((0L, "a")) < got((0L, "b")), "corpus-wide term ranks below rare term")
  }

  test("repetitionSignals: dup-token, dup-2gram, top-token goldens") {
    // "a a a b": 4 tokens, 2 distinct -> dup_tok 0.5;
    // 2-grams [a a, a a, a b]: 3 total, 2 distinct -> dup 1/3;
    // top token a: 3/4
    val df = Seq((0L, "a a a b"), (1L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
      .toMap
    assert(r(0L) == ((4L, 0.5, 1.0 - 2.0 / 3.0, 0.75)))
    assert(r(1L) == ((2L, 0.0, 0.0, 0.5)))
  }

  test("weight-table scorer matches the literal scorer to float tolerance") {
    // Same model, two accumulation orders: linearScore adds the terms
    // in a fixed literal order (IEEE rounding each step), the weighted
    // form sums w·x in exact DECIMAL — equal to a few ulps, which is
    // exactly the claim "a broadcast weight table changes nothing".
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lit = TextAnalysis.linearScore(real).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    val wtd = TextAnalysis.linearScoreWeighted(real,
        TextAnalysis.LinearWeights.toDF("feature", "weight")).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(lit.keySet == wtd.keySet && lit.nonEmpty)
    val maxDiff = lit.keys.map(k => math.abs(lit(k) - wtd(k))).max
    assert(maxDiff <= 1e-6, s"maxDiff=$maxDiff") // one round(6) step
  }

  test("bm25 term-table retrieval equals the isin-literal form exactly") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Queries.Bm25QueryTerms
    val a = TextAnalysis.bm25TopK(real, terms, 20).collect().map(_.toSeq)
    val b = TextAnalysis.bm25TopKTerms(real, terms.toDF("tok"), 20)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("scrub replaces emails, urls, long numbers and counts matches") {
    val df = Seq((0L, "mail a.b@x.io or http://x.io/p?q=1 tel 12345678 nope 123"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.scrub(df, org.apache.spark.sql.functions.col("text"))
      .collect().head
    assert(r.getString(1) == "mail <EMAIL> or <URL> tel <NUM> nope 123")
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L)))
  }
}

class KmeansSpec extends SparkSpec {

  test("kmeansRefine(1): centroids are the exact per-cluster dimension means") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // independent recompute: members per cluster from the assignment,
    // means in plain double (tolerance covers the decimal-vs-double gap)
    val members = Sim.ivfAssign(emb, 16)
      .selectExpr("cid", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val expect = members.groupBy(_._1).map { case (cid, rows) =>
      val vs: Seq[Seq[Double]] = rows.toSeq.map(_._2)
      cid -> vs.transpose.map(xs => xs.sum / xs.length).toIndexedSeq
    }
    val got = Sim.kmeansRefine(emb, nlist = 16, iters = 1).collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toIndexedSeq
      }
    assert(got.keySet == expect.keySet)
    got.foreach { case (cid, cs) =>
      cs.zip(expect(cid)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("kmeansRefine(2): second iteration runs in-plan and moves centroids") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val c1 = Sim.kmeansRefine(emb, 16, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c2 = Sim.kmeansRefine(emb, 16, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c2.nonEmpty && c1.exists { case (k, v) =>
      c2.get(k).exists(w => math.abs(w - v) > 1e-12) })
  }

  test("kmeansRefine: plan size is constant in iters (lineage truncated)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // With per-iteration localCheckpoint, the returned plan holds only
    // the LAST iteration over a checkpointed nlist-row frame — iters=5
    // must not analyze a 5x-nested tree. Node counts are compared (tree
    // strings differ only in RDD ids).
    def planNodes(iters: Int): Int =
      Sim.kmeansRefine(emb, 16, iters).queryExecution.analyzed.collect { case p => p }.size
    assert(planNodes(5) == planNodes(2))
  }
}

class ClusterDedupSpec extends SparkSpec {

  test("clusterDedup: reps are cluster minima, drops are same-cluster and above threshold") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val assigned = Sim.ivfAssign(emb, 16)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minByCluster = assigned.groupBy(_._2).map { case (c, m) => c -> m.keys.min }
    val out = Sim.clusterDedup(emb, threshold = 0.35, nlist = 16).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (vid, rep, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(assigned(vid) == assigned(rep), "member and rep share a cluster")
      assert(minByCluster(assigned(vid)) == rep, "rep is the cluster's min id")
      assert(sim >= 0.35 && vid != rep)
    }
  }
}

class MultimodalSpec extends SparkSpec {

  test("ingest -> extractFeatures: real PPM payload, deterministic, batched") {
    implicit val s = spark
    import s.implicits._
    val docs = Seq((0L, "hello world", "en"), (1L, "bye", "de"))
      .toDF("doc_id", "text", "lang")
    val media = Multimodal.ingest(docs)
    val m = media.collect().sortBy(_.doc_id)
    // the payload IS a parseable P6 file and byte_len is its exact size
    assert(new String(m(0).payload.take(3), "US-ASCII") == "P6\n")
    assert(m(0).byte_len == m(0).payload.length.toLong)
    assert(m(0).mime == "image/x-portable-pixmap")
    val f1 = Multimodal.extractFeatures(media, batchSize = 1).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 64).collect().sortBy(_.doc_id)
    assert(f1.map(_.width).toSeq == f2.map(_.width).toSeq, "batch size must not change results")
    assert(f1(0).feature.length == 8)
    assert(f1(0).width >= 8 && f1(0).height >= 8 && f1(0).n_frames >= 1)
    // parsed dims equal what the encoder wrote, and the raster size
    // accounts for the whole file
    val Some((w, fh, fr, px)) = Multimodal.decodePpm(m(0).payload)
    assert(w == f1(0).width && fh == f1(0).height && fr == f1(0).n_frames)
    assert(px.length == w * fh * fr * 3)
    // features come from decoded pixel row 0, and they equal the FNV
    // contract the oracle recomputes from text
    val expect = Multimodal.featureStub("hello world".getBytes("UTF-8"), 8)
    assert(f1(0).feature.toSeq == expect.toSeq)
  }

  test("decodePpm rejects malformed headers; extractFeatures falls back, never throws") {
    implicit val s = spark
    import s.implicits._
    val good = Multimodal.encodePpm("hello world")
    assert(Multimodal.decodePpm(good).isDefined)
    val truncated = good.dropRight(1)
    val wrongMagic = { val b = good.clone(); b(1) = '5'.toByte; b }
    val badMaxval = "P6\n2 2\n254\n".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte)
    val badFrames = "P6\n# frames=3\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(12)(0.toByte) // 2 rows not divisible into 3 frames
    val garbage = "not an image at all".getBytes("UTF-8")
    val overlong = ("P6\n" + "9" * 12 + " 2\n255\n").getBytes("US-ASCII")
    Seq(truncated, wrongMagic, badMaxval, badFrames, garbage, overlong)
      .foreach(p => assert(Multimodal.decodePpm(p).isEmpty, p.take(20).toSeq))
    // comment-skipping grammar: an unrelated comment parses fine
    val commented = "P6\n# camera=test\n1 1\n255\nABC".getBytes("US-ASCII")
    val parsed = Multimodal.decodePpm(commented)
    assert(parsed.exists { case (w, h, fr, px) =>
      w == 1 && h == 1 && fr == 1 && px.toSeq == "ABC".getBytes("US-ASCII").toSeq
    }, parsed.toString)
    // malformed payloads route through the stub fallback, no exception
    val bad = Seq(MediaDoc(9L, garbage, "application/octet-stream", "en",
      garbage.length.toLong)).toDS()
    val f = Multimodal.extractFeatures(bad).collect().head
    assert(f.width >= 16 && f.feature.length == 8)
  }

  test("q38 raw feature-array schema is pinned (the gate dump carries its integer sum)") {
    implicit val s = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Multimodal.extractFeatures(Multimodal.ingest(docs)).toDF()
    assert(df.schema.map(f => f.name -> f.dataType.simpleString) == Seq(
      "doc_id" -> "bigint", "byte_len" -> "bigint", "width" -> "int",
      "height" -> "int", "n_frames" -> "int", "feature" -> "array<float>"))
    assert(df.count() == 500)
  }

  test("substringDupCoverage: hand fixture incl. overlapping-window union") {
    import spark.implicits._
    // en: d1/d2 share exactly one 8-token window ⇒ 8 covered each.
    // fr: d3/d4 share a 9-token span ⇒ two overlapping windows whose
    // interval UNION is 9, not 16 — the merge step under test.
    // de: d5 unique ⇒ zero coverage.
    val docs = Seq(
      (1L, "en", "a b c d e f g h x y"),
      (2L, "en", "z a b c d e f g h w"),
      (3L, "fr", "p q r s t u v w k m"),
      (4L, "fr", "n p q r s t u v w k"),
      (5L, "de", "u1 u2 u3 u4 u5 u6 u7 u8 u9 u0"))
      .toDF("doc_id", "lang", "text")
    val got = Dedup.substringDupCoverage(docs, k = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got("en") == ((2L, 2L, 20L, 16L, 0.8)), got.toString)
    assert(got("fr") == ((2L, 2L, 20L, 18L, 0.9)), got.toString)
    assert(got("de") == ((1L, 0L, 10L, 0L, 0.0)), got.toString)
  }
}
