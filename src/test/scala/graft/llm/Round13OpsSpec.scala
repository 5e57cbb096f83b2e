package graft.llm

import graft.SparkSpec

/** Property pins for the r13 operator batch (q432–q438) — each test
  * asserts the DEFINING invariant of its operator, not fixture
  * values, so a refactor that silently breaks the semantics fails
  * here even if it still hash-matches some oracle revision. */
class Round13OpsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("q432 bloom: ZERO false negatives (the Bloom guarantee) and sane rates") {
    val rows = TextAnalysis.bloomFilter(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_false_neg") == 0L,
        s"${r.getAs[String]("lang")}: a member missed the filter")
      assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_nonmembers"))
      // femit rounds to 6 decimals — a tiny analytic rate lands on 0.0
      val fa = r.getAs[Double]("fpr_analytic")
      assert(fa >= 0.0 && fa < 1.0)
      if (!r.isNullAt(r.fieldIndex("fpr_measured")))
        assert(r.getAs[Double]("fpr_measured") <= 1.0)
    }
  }

  test("q434 maxscore: pruned top-k EQUALS the unpruned q79 ranking and certifies") {
    val terms = Seq("dup", "scan", "join", "query")
    val pruned = TextAnalysis.maxScoreTopK(docs, terms, kTop = 10).collect()
    assert(pruned.length == 10)
    pruned.foreach(r => assert(r.getAs[Boolean]("certified"),
      "outside bound beat the k-th exact score — pruning was lossy"))
    // the sufficient set must actually prune on this term mix
    assert(pruned.head.getAs[Long]("n_candidates")
      < pruned.head.getAs[Long]("n_matching"))
    // losslessness cross-check against the existing unpruned operator
    val exact = TextAnalysis.bm25TopK(docs, terms, kTop = 10).collect()
    assert(pruned.map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSeq ==
      exact.map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSeq)
  }

  test("q437 rendezvous: minimal disruption — survivors only GAIN, moved = dropped") {
    val rows = Pack.rendezvousShards(docs).collect()
      .map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[Long]("n_gained")))).toMap
    val n = docs.count()
    assert(rows.values.map(_._1).sum == n && rows.values.map(_._2).sum == n)
    val (dropBefore, dropAfter, _) = rows(3L)
    assert(dropAfter == 0L)
    // HRW's defining property: every survivor keeps its population and
    // only inherits from the dropped shard
    rows.filter(_._1 != 3L).foreach { case (s, (b, a, g)) =>
      assert(a == b + g, s"shard $s lost or double-counted docs")
    }
    assert(rows.filter(_._1 != 3L).values.map(_._3).sum == dropBefore,
      "moved docs != dropped shard's former population")
  }

  test("q435 mutual-knn: census partitions the corpus, clusters are >= 2") {
    val rows = Sim.mutualKnnClusters(emb).collect()
    val n = emb.count()
    rows.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      val nc = r.getAs[Long]("n_clusters")
      val nd = r.getAs[Long]("n_docs")
      assert(nd == sz * nc, s"size $sz: census arithmetic broken")
      if (sz > 1L) assert(nc >= 0L)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n,
      "census rows must partition the corpus")
  }

  test("q433 b-bit: more bits -> closer to the full estimator on average") {
    val rows = Dedup.bbitMinhash(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty)
    def mean(f: org.apache.spark.sql.Row => Double) =
      rows.map(f).sum / rows.length
    val d1 = mean(r => math.abs(r.getAs[Double]("est_b1")
      - r.getAs[Double]("est_full")))
    val d4 = mean(r => math.abs(r.getAs[Double]("est_b4")
      - r.getAs[Double]("est_full")))
    assert(d4 <= d1 + 1e-9, s"4-bit ($d4) should track full better than 1-bit ($d1)")
    rows.foreach { r =>
      val j = r.getAs[Double]("exact_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Double]("est_full") >= 0.0
        && r.getAs[Double]("est_full") <= 1.0 + 1e-9)
    }
  }

  test("q436 ips: clipping never raises the estimate; snips is a reward mean") {
    val r = graft.rel.Queries.ipsEval(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_match") > 0L)
    assert(r.getAs[Long]("n_match") <= r.getAs[Long]("n_logged"))
    val mr = r.getAs[Double]("match_rate")
    assert(mr > 0.0 && mr <= 1.0)
    // rewards are nonnegative, so capping weights can only lower V
    assert(r.getAs[Double]("v_ips_clipped")
      <= r.getAs[Double]("v_ips") + 1e-9)
    // SNIPS is a convex combination of matched rewards
    assert(r.getAs[Double]("v_snips") >= 0.0)
    assert(r.getAs[Double]("v_dm") >= 0.0)
  }

  test("q439 quantile sketch: every estimate honors the certified rank bound") {
    val rows = graft.rel.Queries.quantileSketch(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // one-sided by construction: exact rank >= cumw >= target
      assert(r.getAs[Long]("exact_rank") >= r.getAs[Long]("target_rank"))
      assert(r.getAs[Long]("rank_err") <= r.getAs[Long]("err_bound"),
        s"phi=${r.getAs[Double]("phi")}: bound violated")
    }
    // estimates are monotone in phi
    val est = rows.sortBy(_.getAs[Double]("phi"))
      .map(_.getAs[Long]("est_value_micro"))
    assert(est.zip(est.tail).forall { case (a, b) => a <= b })
  }

  test("q441 store merge: union of per-gen summaries == one-pass composite summary") {
    import org.apache.spark.sql.functions._
    val vals = graft.rel.Queries.sketchVals(spark, sf0001).localCheckpoint()
    // one pass over composite (gen, id-cell) cells
    val onePass = graft.rel.Queries.sketchKept(
      vals.withColumn("cell",
        expr("event_id div 4096 * 3 + event_id % 3")), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // per-generation builds, merged by plain union — the store path
    val merged = (0 to 2).map { g =>
      graft.rel.Queries.sketchKept(
        vals.where(col("event_id") % 3L === g.toLong)
          .withColumn("cell", expr(s"event_id div 4096 * 3 + $g")), 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }.reduce(_ ++ _)
    assert(merged == onePass,
      "summary construction must be cell-local (merge associativity)")
    // and the served quantiles honor the summed bound
    graft.rel.Queries.quantileStoreMerge(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("rank_err") <= r.getAs[Long]("err_bound"))
      assert(r.getAs[Long]("exact_rank") >= r.getAs[Long]("target_rank"))
    }
  }

  test("q440 feature hashing: collisions are real at 16 buckets, algebra is exact") {
    val rows = TextAnalysis.featureHashing(docs).collect()
    assert(rows.length == 25)
    val h = rows.head
    assert(h.getAs[Long]("max_bucket_load") >= 2L,
      "16 buckets over this vocabulary must collide")
    assert(h.getAs[Long]("n_buckets_used") <= 16L)
    assert(h.getAs[Long]("n_vocab") >= h.getAs[Long]("n_buckets_used"))
    rows.foreach { r =>
      assert(r.getAs[Long]("abs_err") ==
        math.abs(r.getAs[Long]("dot_hashed") - r.getAs[Long]("dot_exact")))
      assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n2") > 0L)
    }
  }

  test("q442 unigram tokenize: segmentations reconstruct words and are OPTIMAL") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.unigramTokenize(docs).collect()
    assert(rows.nonEmpty)
    // independent model rebuild: word freqs -> substring counts -> lp
    val freqs = docs.select(explode(split(col("text"), " ", -1)).as("t"))
      .where(col("t") =!= "").groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    freqs.foreach { case (w, f) =>
      for (i <- 1 to w.length; j <- math.max(0, i - 4) until i)
        cnt.updateWith(w.substring(j, i))(c => Some(c.getOrElse(0L) + f))
    }
    val tot = cnt.values.sum.toDouble
    def lp(p: String) = math.log(cnt(p).toDouble) - math.log(tot)
    // brute force: best score over ALL <=4-char-piece segmentations
    def best(w: String): Double = {
      def rec(pos: Int, acc: Double): Double =
        if (pos == w.length) acc
        else (pos + 1 to math.min(w.length, pos + 4))
          .map(e => rec(e, acc + lp(w.substring(pos, e)))).max
      rec(0, 0.0)
    }
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val seg = r.getAs[String]("segmentation")
      val pieces = seg.split(" ")
      assert(pieces.mkString == w, s"$w: segmentation '$seg' broken")
      assert(pieces.forall(_.length <= 4))
      assert(pieces.length.toLong == r.getAs[Long]("n_pieces"))
      assert(math.abs(r.getAs[Double]("viterbi_logp") - best(w)) < 1e-6,
        s"$w: DP score ${r.getAs[Double]("viterbi_logp")} != optimum ${best(w)}")
    }
  }

  test("q438 coreset: weights estimate N unbiasedly and the census is consistent") {
    val rows = Sim.coresetKmeans(emb).collect()
    val n = emb.count()
    assert(rows.map(_.getAs[Long]("n_full")).sum == n,
      "full assignment must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_core_pts") <= r.getAs[Long]("n_full"))
      assert(r.getAs[Double]("w_core") >= 0.0)
      assert(r.getAs[Double]("score_full") >= 0.0)
    }
    // E[sum of 1/p weights] = N — allow wide sampling slack at m=64
    val w = rows.map(_.getAs[Double]("w_core")).sum
    assert(w > 0.3 * n && w < 3.0 * n, s"sum weights $w vs N=$n")
  }
}
