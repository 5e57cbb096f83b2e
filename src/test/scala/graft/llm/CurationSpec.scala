package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Curation operators: chunking vs a plain-Scala reference, planted
  * decontamination overlap, mixture-sample determinism vs a direct
  * hash recompute. */
class CurationSpec extends SparkSpec {

  test("chunk matches a plain-Scala sliding-window reference on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Curation.chunk(docs, "doc_id", "text", window = 32, stride = 24)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    val expect = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val ts = r.getString(1).split(" ", -1)
      val n = 1 + math.ceil(math.max(ts.length - 32, 0) / 24.0).toInt
      (0 until n).map { i =>
        val win = ts.slice(i * 24, i * 24 + 32)
        (id, i.toLong) -> (win.length.toLong, win.mkString(" "))
      }
    }.toMap
    assert(got == expect)
    // every token covered: the last chunk reaches the last token
    assert(expect.nonEmpty)
  }

  test("repeatedNgrams matches a plain-Scala recompute on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Curation.repeatedNgrams(docs, "doc_id", "text", k = 3, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // reference: distinct 3-gram sets per doc, grams in >=2 distinct docs
    val shOf = docs.select("doc_id", "text").collect().map { r =>
      val ts = r.getString(1).split(" ", -1)
      r.getLong(0) -> ts.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val dfreq = shOf.values.flatMap(_.toSeq).groupBy(identity)
      .map { case (g, occ) => g -> occ.size }
    val expect = shOf.map { case (id, sh) =>
      val nd = sh.count(g => dfreq(g) >= 2).toLong
      id -> ((sh.size.toLong, nd,
        if (sh.nonEmpty) nd.toDouble / sh.size else 0.0))
    }
    assert(got == expect)
    // non-vacuous: some doc shares a gram, some doc doesn't share all
    assert(expect.values.exists(_._2 > 0) &&
      expect.values.exists(v => v._2 < v._1))
  }

  test("weightedSample: deterministic, partitioning-invariant, weight-sensitive") {
    import spark.implicits._
    import graft.functions.{Fnv1a32}
    import org.apache.spark.unsafe.types.UTF8String
    val rows = (1L to 200L).map(i => (i, "g", if (i == 77L) 1.0e9 else 0.5))
    val df = rows.toDF("id", "grp", "w")
    val got = Curation.weightedSample(df, "id", "grp", "w", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap // rnk -> id
    // the 2e9x-weight row's key ln(u)/1e9 ~ 0 dominates: must be rank 1
    assert(got(1L) == 77L, got.toString)
    // partitioning cannot change the sample (pure function of content)
    val re = Curation.weightedSample(df.repartition(17), "id", "grp", "w", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(re == got)
    // matches a plain-Scala recompute of the A-ES keys
    val expect = rows.map { case (i, _, w) =>
      val h = Fnv1a32.compute(UTF8String.fromString(s"$i:wsamp"), Fnv1a32.Seed)
      i -> math.log((h + 1).toDouble / 4294967296.0) / w
    }.sortBy { case (i, k) => (-k, i) }.take(5).map(_._1)
    assert(got.toSeq.sortBy(_._1).map(_._2) == expect, got.toString)
  }

  test("chunk: stride == window degenerates to disjoint partitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val total = Curation.chunk(docs, "doc_id", "text", 16, 16)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    val tokens = docs.select(size(split(col("text"), " ", -1)).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(total == tokens, "disjoint chunks must partition the token stream")
  }

  test("decontaminate flags exactly the docs sharing a k-gram with eval") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),          // eval
      (2L, "lazy quick brown fox sits here"),     // shares "quick brown fox"
      (3L, "entirely different words only here"), // clean
      (4L, "the quick brown fox jumps again")     // shares two 3-grams
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, "doc_id", "text",
      evalPred = col("doc_id") === 1, k = 3).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L))
    val byId = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(2L) == 1L) // "quick brown fox"
    // doc4 shares its first 3 of 4 shingles ("...jumps" vs "...jumps again")
    assert(byId(4L) == 3L)
  }

  test("stratum sample: exactly min(k, |group|) rows, stable under repartitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = Curation.stratumSample(docs, "doc_id", "lang", 5).collect()
    val got = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    docs.groupBy("lang").count().collect().foreach { r =>
      assert(got(r.getString(0)) == math.min(5L, r.getLong(1)),
        s"lang ${r.getString(0)}")
    }
    val again = Curation.stratumSample(docs.repartition(9), "doc_id", "lang", 5)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.map(_.getLong(0)).toSet,
      "the sample must not depend on physical partitioning")
  }

  test("truncated kNN's recall flag is informative at 16 of 64 dims") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = Sim.truncatedKnn(emb, nQuery = 10, k = 5, dims = 16).collect()
    assert(out.length == 50)
    val flags = out.map(_.getBoolean(4))
    assert(flags.contains(true) && flags.contains(false),
      "random 64-dim vectors truncated to 16 dims should hit AND miss")
  }

  test("mixture sample equals the direct hash rule and survives repartitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def keptOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Curation.mixtureSample(df, "doc_id", "lang",
        Curation.MixtureWeights, Curation.MixtureDenom)
        .collect().map(_.getLong(0)).toSet
    val kept = keptOf(docs)
    assert(keptOf(docs.repartition(7)) == kept,
      "the sample must be a pure function of the row, not the partitioning")
    val w = Curation.MixtureWeights.toMap
    val expect = docs.select("doc_id", "lang").collect().filter { r =>
      val h = graft.functions.Fnv1a32.compute(
        UTF8String.fromString(s"${r.getLong(0)}:mix"),
        graft.functions.Fnv1a32.Seed)
      h % Curation.MixtureDenom < w(r.getString(1))
    }.map(_.getLong(0)).toSet
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < docs.count())
  }

  test("q174 BPE merge table equals a plain-Scala reference on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // Textbook single-machine BPE: weighted pair counts over the word
    // vocabulary, (count DESC, a, b) argmax, greedy left-to-right merge.
    var vocab: Vector[(Vector[String], Long)] = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.length.toLong) }.toVector
    val expect = (1 to 4).map { r =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.length - 1)
        pairs.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + cnt))
      val ((a, b), w) = pairs.toVector
        .sortBy { case ((pa, pb), c) => (-c, pa, pb) }.head
      vocab = vocab.map { case (syms, cnt) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms)
          if (buf.nonEmpty && buf.last == a && x == b) buf(buf.length - 1) = a + b
          else buf += x
        (buf.toVector, cnt)
      }
      (r.toLong, a, b, w)
    }
    val got = Curation.bpeTrain(docs, "text", rounds = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expect, s"got $got vs reference $expect")
  }
}
