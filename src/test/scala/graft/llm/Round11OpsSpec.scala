package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-11 operators: Kneser–Ney bigram LM (q376),
  * late-interaction MaxSim retrieval (q378), the filter-cascade
  * waterfall (q379), cross-source quantile normalization (q375), and
  * the IPW treatment-effect estimator (q377). */
class Round11OpsSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val docs =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("knBigram: finite held-out perplexity, KN discount never yields p<=0") {
    val r = TextAnalysis.knBigram(docs).collect().head
    val n = r.getAs[Long]("n_bigrams")
    val ppl = r.getAs[Double]("held_out_ppl")
    assert(n > 0)
    // a ln(0) anywhere would surface as NULL/NaN through the femit route
    assert(!ppl.isNaN && ppl > 1.0 && ppl.isFinite, s"ppl=$ppl")
    // unseen contexts exist in any real split but must be a minority
    val oov = r.getAs[Long]("n_unseen_ctx")
    assert(oov >= 0 && oov < n)
    // KN's continuation back-off should not be WORSE than the raw
    // add-one bigram route on the same split by an order of magnitude
    assert(ppl < 10000, s"ppl=$ppl looks degenerate")
  }

  test("maxSimKnn equals the brute-force MaxSim ranking (exact operator)") {
    val got = Sim.maxSimKnn(emb, nQuery = 3, k = 5)
      .select("qid", "rnk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: the same (doc, tok_pos) rotation relation (r13 —
    // fnv token count, rotate-by-t generator) computed independently
    // via collected arrays
    val vs = emb.select(col("vec_id"),
        Sim.asDouble(col("embedding")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def nTok(id: Long): Int = (1L + graft.functions.Fnv1a32.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"$id:ntok"),
      graft.functions.Fnv1a32.Seed) % 8L).toInt
    def subs(id: Long, v: Array[Double]) =
      (0 until nTok(id)).map(t =>
        Array.tabulate(64)(j => v((j + t) % 64)))
        .filter(sv => math.sqrt(sv.map(x => x * x).sum) > 0.0)
    def cos(a: Array[Double], b: Array[Double]) = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val expect = (0L until 3L).flatMap { qid =>
      val qsub = subs(qid, vs(qid))
      val scored = vs.keys.filter(_ != qid)
        .filter(did => subs(did, vs(did)).nonEmpty).map { did =>
        val dsub = subs(did, vs(did))
        val score = qsub.map(q => dsub.map(d => cos(q, d)).max).sum
        (did, math.floor(score * 1e6 + 0.5) / 1e6)
      }.toSeq.sortBy { case (did, s) => (-s, did) }.take(5)
      scored.zipWithIndex.map { case ((did, _), i) =>
        (qid, (i + 1).toLong, did)
      }
    }.toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("filterCascade: waterfall identities hold") {
    val rows = Curation.filterCascade(docs).collect()
    assert(rows.length == 5)
    val total = docs.count()
    // n_in of stage 1 is the corpus; each stage chains n_out -> n_in
    assert(rows.head.getAs[Long]("n_in") == total)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"),
        s"chain broken ${a.getAs[String]("stage")} -> ${b.getAs[String]("stage")}")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") ==
        r.getAs[Long]("n_in") - r.getAs[Long]("n_killed"))
    }
    val killed = rows.map(_.getAs[Long]("n_killed")).sum
    assert(killed + rows.last.getAs[Long]("n_out") == total)
    // the fixture exercises at least two distinct kill stages
    assert(rows.count(_.getAs[Long]("n_killed") > 0) >= 2,
      rows.map(r => s"${r.getAs[String]("stage")}=${r.getAs[Long]("n_killed")}")
        .mkString(","))
  }

  test("quantileNorm: normalized values land inside the pooled range and " +
      "per-source means converge to the pooled mean") {
    val out = graft.rel.Queries.quantileNorm(spark, sf0001).collect()
    assert(out.length > 1)
    val stats = docs.agg(min(col("n_chars")), max(col("n_chars")),
      avg(col("n_chars"))).collect().head
    val (lo, hi, pooledMean) =
      (stats.getLong(0), stats.getLong(1), stats.getDouble(2))
    out.foreach { r =>
      assert(r.getAs[Long]("min_qnorm") >= lo &&
        r.getAs[Long]("max_qnorm") <= hi)
      // quantile normalization aligns SHAPES: each source's normalized
      // mean sits near the pooled mean even when its raw mean doesn't
      assert(math.abs(r.getAs[Double]("mean_qnorm") - pooledMean)
        <= math.abs(r.getAs[Double]("mean_raw") - pooledMean) + 15.0,
        s"source=${r.getString(0)}")
    }
  }

  test("rm3Expansion: full top-k, scores non-increasing, expansion reaches " +
      "docs the raw query cannot") {
    val rm3 = TextAnalysis.rm3Expansion(docs).collect()
    assert(rm3.length == 10)
    val scores = rm3.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    // docs matched only via expansion terms are the operator's point:
    // every doc must match at least one weighted term, and the weight
    // table is wider than the raw query
    assert(rm3.forall(_.getAs[Long]("n_terms") >= 1))
    val raw = TextAnalysis.bm25TopK(docs, Seq("spark", "join"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = rm3.map(_.getAs[Long]("doc_id")).toSet
    assert(got != raw, "expansion left the ranking identical — suspicious")
  }

  test("shapleyAttribution: efficiency axiom sums phi to v(C) - v(empty)") {
    val out = graft.rel.Queries.shapleyAttribution(spark, sf0001).collect()
    assert(out.length == 4)
    val phiSum = out.map(_.getAs[Double]("shapley")).sum
    // brute-force v at the two endpoint coalitions
    val ev = graft.rel.Queries.events(spark, sf0001)
      .select("user_id", "event_id", "ts", "event_type").collect()
    val byUser = ev.groupBy(_.getLong(0))
    val chans = Set("click", "error", "signup", "view")
    val sets = byUser.map { case (u, rows) =>
      val ordered = rows.sortBy(r =>
        (r.getTimestamp(2).getTime, r.getLong(1)))
      val pIdx = ordered.indexWhere(_.getString(3) == "purchase")
      val pre = if (pIdx < 0) ordered else ordered.take(pIdx)
      val set = pre.map(_.getString(3)).filter(chans).toSet
      (set, pIdx >= 0)
    }
    def v(s: Set[String]): Double = {
      val exact = sets.filter(_._1 == s)
      if (exact.isEmpty) 0.0
      else exact.count(_._2).toDouble / exact.size
    }
    val expect = v(chans) - v(Set.empty)
    // each phi is femit'd (1e-6 grid): allow 4 rounding granules
    assert(math.abs(phiSum - expect) < 4e-6,
      s"sum(phi)=$phiSum expected ${expect}")
  }

  test("qiniUplift: decile partition + cumulative identity") {
    val rows = graft.rel.Queries.qiniUplift(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val nUsers = graft.rel.Queries.events(spark, sf0001)
      .where(col("value").isNotNull).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == nUsers)
    // ntile: sizes differ by at most 1, larger first
    val sizes = rows.map(_.getAs[Long]("n"))
    assert(sizes.max - sizes.min <= 1 && sizes.sorted.reverse.sameElements(sizes))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_t") + r.getAs[Long]("n_c") == r.getAs[Long]("n"))
    }
    // the last cumulative qini equals the sum of per-decile increments
    val incs = rows.map { r =>
      r.getAs[Long]("conv_t").toDouble -
        r.getAs[Long]("conv_c").toDouble * r.getAs[Long]("n_t") /
          r.getAs[Long]("n_c").toDouble
    }
    assert(math.abs(rows.last.getAs[Double]("qini") - incs.sum) < 1e-5)
  }

  test("wordpieceFertility: segmentation is total and piece counts bounded") {
    val rows = Curation.wordpieceFertility(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppt = r.getAs[Double]("pieces_per_token")
      val cpp = r.getAs[Double]("chars_per_piece")
      // every word segments fully (single chars are always in vocab):
      // 1 <= pieces/token and 1 <= chars/piece <= 3 (max piece length)
      assert(ppt >= 1.0, s"ppt=$ppt")
      assert(cpp >= 1.0 && cpp <= 3.0, s"cpp=$cpp")
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_tokens"))
    }
  }

  test("blockingEval: metric identities and the union dominance") {
    val rows = Dedup.blockingEval(
      docs.select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " ", -1), 1, 5)).as("title")),
      "doc_id", "title").collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    assert(rows.size == 3)
    rows.values.foreach { r =>
      val rr = r.getAs[Double]("reduction_ratio")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(r.getAs[Long]("n_found") <=
        math.min(r.getAs[Long]("n_cand_pairs"), r.getAs[Long]("n_true_pairs")))
    }
    val u = rows("union_first_last"); val f = rows("first_tok_len4")
    val l = rows("last_tok_len4")
    // the union can only find MORE true pairs than either scheme alone
    assert(u.getAs[Long]("n_found") >=
      math.max(f.getAs[Long]("n_found"), l.getAs[Long]("n_found")))
    assert(u.getAs[Long]("n_cand_pairs") <=
      f.getAs[Long]("n_cand_pairs") + l.getAs[Long]("n_cand_pairs"))
  }

  test("sourceAblation: deltas match the brute-force recompute off q24 scores") {
    val out = Curation.sourceAblation(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val perDoc = TextAnalysis.qualityScore(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "quality").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = perDoc.length.toLong
    val tot = perDoc.map(_._2).sum
    assert(out.values.map(_.getAs[Long]("n_docs")).sum == n)
    out.foreach { case (src, row) =>
      val mine = perDoc.filter(_._1 == src)
      val exp = (tot - mine.map(_._2).sum) / (n - mine.length) - tot / n
      assert(math.abs(row.getAs[Double]("delta_mean_quality") - exp) < 2e-6,
        s"$src: got ${row.getAs[Double]("delta_mean_quality")} expected $exp")
    }
  }

  test("aucBootstrap: CI is ordered and brackets the point estimate loosely") {
    val r = graft.rel.Queries.aucBootstrap(spark, sf0001).collect().head
    val (pt, lo, hi) = (r.getAs[Double]("auc_point"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo <= hi, s"lo=$lo hi=$hi")
    // 38/40 of the replicate mass lies between the order statistics;
    // the point estimate sits inside a slightly padded band
    assert(pt >= lo - 0.05 && pt <= hi + 0.05, s"pt=$pt not near [$lo, $hi]")
    assert(r.getAs[Long]("n_replicates") == 40L)
  }

  test("stlStrength: strengths in [0,1] and variance decomposition sane") {
    val r = graft.rel.Queries.stlStrength(spark, sf0001).collect().head
    val (ft, fs) = (r.getAs[Double]("f_trend"), r.getAs[Double]("f_seasonal"))
    assert(ft >= 0.0 && ft <= 1.0, s"f_trend=$ft")
    assert(fs >= 0.0 && fs <= 1.0, s"f_seasonal=$fs")
    assert(r.getAs[Long]("n_days") > 7)
    assert(r.getAs[Double]("var_remainder") >= 0.0)
  }

  test("frameNearDups: containment bounds, exact dups score 1, spill lossless") {
    val out = Multimodal.frameNearDups(docs, tau = 0.5)
    val rows = out.collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0, s"containment=$c")
      assert(r.getAs[Long]("n_shared") <=
        math.min(r.getAs[Long]("nfa"), r.getAs[Long]("nfb")))
    }
    // forced spill must not change the pair set
    val spilled = Multimodal.frameNearDups(docs, tau = 0.5, maxBucket = 1)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spilled ==
      rows.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet)
  }

  test("randomizedResponse: debiasing identity holds exactly") {
    val r = Curation.randomizedResponse(
      graft.rel.Queries.events(spark, sf0001)).collect().head
    val n = r.getAs[Long]("n_users").toDouble
    // pi_hat recomputed from the emitted counts matches the emitted value
    val expect = (r.getAs[Long]("n_reported") / n - 0.25) / 0.5
    assert(math.abs(r.getAs[Double]("pi_hat") - expect) < 1e-6)
    // the derandomized coin keeps ~p of reports truthful: debias error
    // bounded well inside the binomial envelope at this n
    assert(r.getAs[Double]("abs_err") < 0.25, s"err=${r.getAs[Double]("abs_err")}")
  }

  test("recsysEval: rates bounded, hits cannot exceed eval users") {
    val r = graft.rel.Queries.recsysEval(spark, sf0001).collect().head
    val n = r.getAs[Long]("n_users_eval")
    val h = r.getAs[Long]("n_users_hit")
    assert(n > 0 && h >= 0 && h <= n)
    val hr = r.getAs[Double]("hit_rate")
    val mr = r.getAs[Double]("mean_recall")
    assert(hr >= 0.0 && hr <= 1.0 && math.abs(hr - h.toDouble / n) < 1e-6)
    // recall per user <= 1, so the mean is too; hit-rate dominates
    // mean recall (a hit user contributes <= 1, a miss user 0)
    assert(mr >= 0.0 && mr <= hr + 1e-9)
  }

  test("stlAnomalies: top-5 by |z| descending, flags consistent") {
    val rows = graft.rel.Queries.stlAnomalies(spark, sf0001).collect()
    assert(rows.length == 5)
    val az = rows.map(r => math.abs(r.getAs[Double]("z")))
    // ranked by ROUNDED |z| — allow equal neighbors at the 1e-6 grid
    az.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-6) }
    rows.foreach { r =>
      assert(r.getAs[Boolean]("anomalous") ==
        (math.floor(math.abs(r.getAs[Double]("z")) * 1e6 + 0.5) / 1e6 >= 2.0))
      // decomposition identity: y = t + s + r at the emitted precision
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(recon - r.getAs[Long]("n_events")) < 1e-4, s"recon=$recon")
    }
  }

  test("ipwAte: weighting shrinks the covariate gap it targets") {
    val r = graft.rel.Queries.ipwAte(spark, sf0001).collect().head
    val nUsers = r.getAs[Long]("n_users")
    val nTreated = r.getAs[Long]("n_treated")
    assert(nUsers > 0 && nTreated > 0 && nTreated < nUsers)
    val rawGap = math.abs(r.getAs[Double]("x1_gap_raw"))
    val wGap = math.abs(r.getAs[Double]("x1_gap_weighted"))
    // FIXTURE-DEPENDENT floor (the recall-floor convention, ADVICE
    // r11): with a FIXED (non-fitted) logistic propensity, IPW is not
    // mathematically guaranteed to shrink the gap — on this fixture it
    // does, and a small tolerance band absorbs regeneration jitter
    // without losing the balance-audit signal.
    assert(wGap <= rawGap + 0.05, s"raw=$rawGap weighted=$wGap")
    assert(!r.getAs[Double]("ate_ipw").isNaN)
  }
}
