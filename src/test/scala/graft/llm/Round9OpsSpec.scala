package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operator semantics: SemDeDup keep-rule, LSH planner S-curve
  * monotonicity, DP-count noise calibration, DSIR target-profile
  * ordering, pretokenizer fertility on hand-counted fixtures,
  * beta-binomial shrinkage direction, Page-Hinkley vs a plain-Scala
  * decimal-lattice reference. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def femitRef(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (math.abs(x) < 1e9) math.floor(x * 1e6 + 0.5) / 1e6 + 0.0
    else x + 0.0

  test("semDedup drops the prototypical member, keeps the outlier") {
    // ids 0,1 are the nlist=2 centroids (first by vec_id); 2 and 3 are
    // near-dups of their respective centroids. The paper's rule keeps
    // the member FARTHEST from the centroid, so the centroids
    // themselves (csim = 1) are the ones dropped.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.01f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Sim.semDedup(emb, nlist = 2, tau = 0.9).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == ((2L, 1L, 2L)), s"cluster 0: ${got(0L)}")
    assert(got(1L) == ((2L, 1L, 3L)), s"cluster 1: ${got(1L)}")
  }

  test("semDedup with tau above all pair sims drops nothing") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.9f, 0.45f))
    ).toDF("vec_id", "embedding")
    val got = Sim.semDedup(emb, nlist = 2, tau = 0.999).collect()
    assert(got.map(_.getLong(2)).sum == 0L, "no drops")
    // every member survives: min_kept_id is the cluster min id
    assert(got.map(r => r.getLong(0) -> r.getLong(3)).toMap
      .forall { case (cid, kept) => kept == cid })
  }

  test("lshPlan: S-curve error masses are monotone across the band grid") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = Dedup.lshPlan(docs, nSig = 128, tau = 0.5, maxId = 120L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.length == 8, "8 factorizations of 128")
    assert(rows.map(_._6).sorted.toSeq == (1L to 8L), "dense ranks")
    rows.foreach { t =>
      assert(t._1 * t._2 == 128L, s"b*r: $t")
      assert(t._3 >= 0 && t._4 >= 0, s"masses nonneg: $t")
      assert(math.abs(t._5 - (t._3 + t._4)) <= 2e-6, s"total = fp+fn: $t")
    }
    // more bands (fewer rows/band) => candidacy more likely at every j:
    // fp mass non-decreasing, fn mass non-increasing in bands
    val byBands = rows.sortBy(_._1)
    byBands.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._3 >= lo._3 - 1e-6, s"fp monotone: $lo -> $hi")
        assert(hi._4 <= lo._4 + 1e-6, s"fn monotone: $lo -> $hi")
      case _ =>
    }
  }

  test("dpCounts: noise ledger is self-consistent and scales as 1/eps") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = Curation.dpCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { t =>
      // noisy_count and abs_noise are rounded separately; they must
      // agree to within the two emission quanta
      assert(math.abs(math.abs(t._5 - t._4) - t._6) <= 2e-6, t.toString)
    }
    val byEps = rows.groupBy(_._3).view
      .mapValues(g => g.map(_._6).sum / g.length).toMap
    // eps_id 1 is eps=0.1 (mean |Lap| = 10), eps_id 2 is eps=1.0 (mean 1)
    assert(byEps(1) > byEps(2), s"noise must shrink with eps: $byEps")
    // derandomized: a second run is bit-identical
    val again = Curation.dpCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.toSeq == again.toSeq)
  }

  test("dsirWeights ranks target-profile docs above off-profile docs") {
    val docs = Seq(
      (0L, "en", "alpha beta gamma alpha beta"),
      (1L, "en", "beta gamma alpha gamma"),
      (2L, "en", "gamma alpha beta beta"),
      (3L, "fr", "chien chat loup chien chat"),
      (4L, "fr", "chat loup chien loup"),
      (5L, "fr", "loup chien chat chat")
    ).toDF("doc_id", "lang", "text")
    val got = Curation.dsirWeights(docs, targetLang = "en", topK = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 6L), "dense ranks")
    val (en, fr) = got.partition(_._3 == "en")
    assert(en.map(_._4).min > fr.map(_._4).max,
      s"every en weight above every fr weight: ${got.mkString(",")}")
    assert(en.forall(_._4 > 0) && fr.forall(_._4 < 0),
      "target-only vocab scores positive, off-profile negative")
    // emitted in rank order = weight desc, doc_id asc
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._4 ||
        (a._4 == b._4 && a._2 < b._2), s"$a -> $b")
      case _ =>
    }
  }

  test("pretokenFertility matches hand-counted GPT-2-style splits") {
    val docs = Seq(
      (0L, "xx", "Hello world 123!"), // "Hello"," world"," 123","!"
      (1L, "yy", "a+b==c"), //           "a","+","b","==","c"
      (2L, "zz", " a") //                " a"
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.pretokenFertility(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got("xx") == ((1L, 4L, 16L, 3L, femitRef(16.0 / 4),
      femitRef(4.0 / 3))), got("xx").toString)
    assert(got("yy") == ((1L, 5L, 6L, 1L, femitRef(6.0 / 5),
      femitRef(5.0 / 1))), got("yy").toString)
    assert(got("zz") == ((1L, 1L, 2L, 1L, femitRef(2.0), femitRef(1.0))),
      got("zz").toString)
  }

  test("betaBinomialQuality shrinks every group rate toward the prior mean") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = TextAnalysis.betaBinomialQuality(docs).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(rows.nonEmpty)
    val m = rows.map(t => t._2.toDouble / t._1).sum / rows.length
    rows.foreach { t =>
      val p = t._2.toDouble / t._1
      assert(math.abs(femitRef(p) - t._3) <= 1e-12, s"raw rate: $t")
      (t._4, t._5, t._6) match {
        case (Some(s), Some(a), Some(b)) =>
          assert(a > 0 && b > 0, s"positive prior: $t")
          // shrinkage: s strictly between p and m (within emission quanta)
          assert(s >= math.min(p, m) - 2e-6 && s <= math.max(p, m) + 2e-6,
            s"shrunk toward m=$m: p=$p s=$s")
        case (None, None, None) => // degenerate moment fit: all-null row
        case other => fail(s"mixed nullity: $other")
      }
    }
    // alpha/beta are corpus constants: one distinct non-null value each
    assert(rows.flatMap(_._5).distinct.length <= 1)
    assert(rows.flatMap(_._6).distinct.length <= 1)
  }

  test("pageHinkley matches a plain-Scala decimal-lattice reference") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val delta = 5.0; val lambda = 1000.0
    def dec(x: Double): JBD =
      JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    val ev = graft.rel.Queries.events(spark, sf0001)
      .where(col("value").isNotNull)
      // unix_micros, not cast("long") (epoch SECONDS): sub-second ts
      // differences must order the reference exactly like the engine's
      // full-precision (ts, event_id) sort.
      .select(col("event_type"), col("event_id"), expr("unix_micros(ts)"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).view.mapValues { g =>
      val sorted = g.sortBy(t => (t._3, t._2))
      var ps = JBD.ZERO; var u = JBD.ZERO; var umin: JBD = null
      var firstAlarm = -1
      val all = sorted.zipWithIndex.map { case (t, i) =>
        val rn = i + 1
        ps = ps.add(dec(t._4))
        val mean = ps.doubleValue / rn
        u = u.add(dec(t._4 - mean - delta))
        if (umin == null || u.compareTo(umin) < 0) umin = u
        val ph = femitRef(u.subtract(umin).doubleValue)
        if (ph > lambda && firstAlarm < 0) firstAlarm = rn
        (rn, femitRef(mean), ph)
      }
      val last = all.length
      all.filter(t => t._1 % 200 == 0 || t._1 == last || t._1 == firstAlarm)
        .map(t => (t._1.toLong, t._2, t._3, t._3 > lambda,
          t._1 == firstAlarm)).toSeq
    }.toMap
    val got = graft.rel.Queries.pageHinkley(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4), r.getBoolean(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, rows) =>
      assert(rows == expect(k), s"$k: $rows vs ${expect(k)}")
      rows.foreach(t => assert(t._3 >= 0.0, s"PH nonneg: $t"))
      assert(rows.count(_._5) <= 1, "at most one first-alarm row")
    }
  }
}
