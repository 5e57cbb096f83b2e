package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the scale paths — the properties
  * that matter at 1000 executors, pinned so a refactor can't silently
  * regress them. Plans are inspected after an action so AQE has
  * finalized. */
class PlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** r15 (the q446 lesson): windows PARTITIONED by a content-derived
    * group column sort one task per group value, and a group keyed by
    * corpus CONTENT (a gram's name, an LSH band bucket, a signature)
    * has no cardinality cap — a boilerplate cookie-banner gram holds
    * 10^8+ occurrences at web scale, so such a window is a skew sort
    * unless something bounds or subdivides the group. Flags every
    * WindowExec whose partition keys are ALL drawn from the
    * content-group name families below with no structural mitigation:
    *  - a co-key outside the families (doc_id, a salt column, a query
    *    id) subdivides the group;
    *  - a WindowGroupLimit below caps the per-group work (rank<=k);
    *  - a limit head below bounds the whole input.
    * Everything else is the q446-r14 failure shape. */
  private def unsaltedContentWindows(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    val fams = Set("nm", "gram", "band", "bkey", "bucket", "bval", "sig",
      "shingle", "g1", "g2", "pk", "minhash", "simhash", "phash", "fp")
    def boundedBelow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case _: org.apache.spark.sql.execution.GlobalLimitExec => ()
        case _: org.apache.spark.sql.execution.LocalLimitExec => ()
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => ()
        case _: org.apache.spark.sql.execution.CollectLimitExec => ()
        case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => ()
      }.isDefined
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty =>
        val keys = w.partitionSpec
          .flatMap(_.references.toSeq.map(_.name.toLowerCase)).distinct
        if (keys.nonEmpty && keys.forall(fams.contains) && !boundedBelow(w))
          Some(s"window partitioned by content group (${keys.mkString(",")})")
        else None
    }.flatten
  }

  test("q36 at-scale: candidate generation is one grouped shuffle, no self-join") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale join shape
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      // AQE's toString appends the Initial Plan — count in the final only
      val p = finalPlan(llm.Sim.cosineNearDupsLsh(emb, 0.35))
        .split("== Initial Plan ==").head
      // the banded corpus is shuffled on (t, bucket) exactly once — the
      // bucket-grouped expansion has no second pass over the signatures
      assert("hashpartitioning\\(t".r.findAllIn(p.toLowerCase).size == 1,
        p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q18 verify scans the corpus exactly 3 times (shingles once, text twice)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val df = llm.Dedup.minhashNearDups(docs, "doc_id", "text",
      k = 3, nBuckets = 64, bandSize = 4, threshold = 0.1)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // candidates (shingle expression) + the two candidate-only verify
    // sides (raw text, shingles recomputed post-join) — a regression to
    // corpus-wide shingle re-evaluation shows up as extra scans of the
    // shingle projection
    assert(scans.size == 3, s"${scans.size} scans")
  }

  test("q37 broadcasts the tiny query side (corpus streams once)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val p = finalPlan(llm.Sim.annKnn(emb, nQuery = 10, k = 5))
    assert(p.contains("BroadcastHashJoin"), "candidate join must be broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join on the corpus side")
  }

  test("q42 as-of join plans as one keyed window — no join, no pair blowup") {
    val p = finalPlan(rel.Queries.asofClickView(spark, sf0001))
    assert(!p.contains("Join"), "as-of must be the union+window form, not a theta join")
    assert(p.contains("Window"), "expected the ordered-window match pass")
  }

  test("q43 band join is an equi-join on time cells, never nested-loop") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val p = finalPlan(rel.Queries.bandPairs(spark, sf0001))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "band join must never fall back to a quadratic join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a keyed equi-join on (user, cell)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q214 attribution pairs touches via the cell equi-join, never nested-loop") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val p = finalPlan(rel.Queries.positionAttribution(spark, sf0001))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "touch-purchase pairing must never fall back to a quadratic join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a keyed equi-join on (user, cell)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q131 aggregate-state merge rides the state table's bucket layout") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val p = finalPlan(rel.Queries.incrementalAgg(spark, sf0001))
        .split("== Initial Plan ==").head
      // the persisted state side contributes NO exchange (bucketed by
      // exactly the merge key); only the delta aggregate shuffles —
      // O(delta), never O(history)
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("disabled by query planner"), p.take(1500))
      assert("exchange hashpartitioning\\(user_id".r
        .findAllIn(p.toLowerCase).size == 1, p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q136 interval join plans as a cell equi-join, never nested-loop") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = finalPlan(rel.Queries.intervalOverlap(spark, sf0001))
        .split("== Initial Plan ==").head
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        p.take(1200))
      // the overlap-start dedup rule means NO distinct/dedup aggregate
      // over the pair stream — exactly-once by construction
      assert("hashaggregate".r.findAllIn(p.toLowerCase).isEmpty ||
        !p.toLowerCase.contains("distinct"), p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q137 triangles: equi-joins only, no cartesian wedge explosion") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val prs = spark.read.parquet(s"$sf0001/documents.parquet")
        .select(org.apache.spark.sql.functions.expr(
          "filter(split(text, ' '), t -> t <> '')").as("ts"))
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr(
            "filter(transform(ts, (t, i) -> struct(t AS src, try_element_at(ts, i + 2) AS dst)), " +
              "p -> p.dst IS NOT NULL)")).as("p"))
        .select(org.apache.spark.sql.functions.col("p.src").as("src"),
          org.apache.spark.sql.functions.col("p.dst").as("dst"))
      val p = finalPlan(rel.Graph.triangles(prs))
        .split("== Initial Plan ==").head
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        p.take(1200))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q139 conjunctive probe prunes the posting index to the terms' buckets") {
    llm.TextAnalysis.postingIndexWrite(
      spark.read.parquet(s"$sf0001/documents.parquet"),
      "doc_id", "text", "planspec_postings", buckets = 8)
    val df = llm.TextAnalysis.conjunctiveQuery(spark, "planspec_postings",
      Seq("spark", "join"))
    val p = finalPlan(df).split("== Initial Plan ==").head
    // the isin filter selects at most 2 of 8 buckets — the index is
    // consulted, not scanned (6+ buckets never leave disk)
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(p)
    assert(sel.isDefined, p.take(1500))
    assert(sel.get.group(1).toInt <= 2, p.take(1500))
  }

  test("q75 probe join rides the signature store's bucket layout") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val history = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val fresh = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      rel.Layout.writeBucketedBy(
        llm.Dedup.minhashSignatureStore(history, "doc_id", "text"),
        "minhash_store_plan", 8, "band", "bkey")
      val cand = llm.Dedup.bandKeysFromShingles(
          fresh.select(org.apache.spark.sql.functions.col("doc_id"),
            llm.Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3).as("sh")))
        .join(spark.table("minhash_store_plan"), Seq("band", "bkey"))
      val p = finalPlan(cand).split("== Initial Plan ==").head
      // The store side must contribute NO exchange: bucketed by exactly
      // the probe keys (band, bkey), its scan feeds the SMJ directly
      // (Bucketed: true) and only the new batch's band keys shuffle to
      // the bucket count — O(new batch), never O(history). A bucket key
      // that is a strict SUBSET of the join keys silently loses this
      // ("Bucketed: false (disabled by query planner)" + re-shuffle),
      // which is exactly the regression this test pins.
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("disabled by query planner"), p.take(1500))
      // exactly one join-key exchange: the probe side's
      assert("exchange hashpartitioning\\(band".r
        .findAllIn(p.toLowerCase).size == 1, p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q392 perceptual probe rides the banded-word store's bucket layout") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val history = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val fresh = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      rel.Layout.writeBucketedBy(
        llm.Multimodal.perceptualSignatureStore(history, maxDist = 3),
        "phash_store_plan", 8, "band", "bval")
      val probe = llm.Multimodal.perceptualIncrementalNearDups(
        fresh, spark.table("phash_store_plan"), maxDist = 3)
      val p = finalPlan(probe).split("== Initial Plan ==").head
      // The store side must contribute NO exchange: bucketed by exactly
      // the probe keys (band, bval) its scan feeds the join directly —
      // probing history stays O(batch), never O(history) (the q75
      // discipline applied to the perceptual modality).
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("disabled by query planner"), p.take(1500))
      // exactly one join-key exchange: the batch side's
      assert("exchange hashpartitioning\\(band".r
        .findAllIn(p.toLowerCase).size == 1, p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q397 frame probe rides the inverted-index store's bucket layout") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val history = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val fresh = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
      rel.Layout.writeBucketedBy(
        llm.Multimodal.frameSignatureStore(history),
        "frame_store_plan", 8, "sig")
      val probe = llm.Multimodal.frameIncrementalNearDups(
        fresh, spark.table("frame_store_plan"))
      val p = finalPlan(probe).split("== Initial Plan ==").head
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("disabled by query planner"), p.take(1500))
      // exactly one sig-key exchange: the batch fingerprints'
      assert("exchange hashpartitioning\\(sig".r
        .findAllIn(p.toLowerCase).size == 1, p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q448 probe rides the hash-bucketed exact-substring store (r14/r15)") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val history = docs.where(col("doc_id") % 2 === 0)
      val fresh = docs.where(col("doc_id") % 2 === 1)
      rel.Layout.writeBucketedBy(
        llm.Dedup.exactSubstrStore(history, "doc_id", "text", windowL = 6),
        "exact_substr_store_plan", 8, "g1", "g2")
      val probe = llm.Dedup.incrementalExactSubstr(
        fresh, spark.table("exact_substr_store_plan"), "doc_id", "text",
        windowL = 6)
      val p = finalPlan(probe).split("== Initial Plan ==").head
      assert(p.contains("Bucketed: true"), p.take(1500))
      assert(!p.contains("disabled by query planner"), p.take(1500))
      // exactly one hash-key exchange: the batch windows' — the store
      // side reads its (g1, g2) buckets directly; the store schema is
      // the r15 128-bit-hash pair, no literal gram column anywhere
      assert("exchange hashpartitioning\\(g1".r
        .findAllIn(p.toLowerCase).size == 1, p.take(1500))
      assert(!spark.table("exact_substr_store_plan").columns.contains("gram"),
        "store must carry hash pairs, not literal grams")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q446 cut carries no per-name-group sort window (r15)") {
    // The r14 VERDICT's one weak row: the canonical-occurrence pick ran
    // a row_number window partitioned by the content-derived name group
    // — an uncapped skew sort at web scale (a boilerplate gram's group
    // holds 10^8+ occurrences). r15 replaced it with a min-struct/count
    // aggregate + join; the cut's physical plan must now be entirely
    // window-free (reassembly is a groupBy, the store probe a join).
    val df = SparkEntry.queries("q446_exact_substr_cut")(spark, sf0001)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty,
      s"q446 must not sort any window partition: ${wins.map(_.partitionSpec)}")
  }

  test("q100 store merge and the next probe both ride the bucket layout") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val gen0 = docs.where(col("doc_id") % 3 === 0)
      val gen1 = docs.where(col("doc_id") % 3 === 1)
      val gen2 = docs.where(col("doc_id") % 3 === 2)
      rel.Layout.writeBucketedBy(
        llm.Dedup.minhashSignatureStore(gen0, "doc_id", "text"),
        "minhash_store_g0_plan", 8, "band", "bkey")
      // (a) the UPDATE: the full-outer merge must not exchange the
      // store side — update cost O(new batch), never O(history)
      val merged = llm.Dedup.mergeSignatureStore(
        spark.table("minhash_store_g0_plan"), gen1, "doc_id", "text",
        storeBuckets = 8)
      val mp = finalPlan(merged).split("== Initial Plan ==").head
      assert(mp.contains("Bucketed: true"), mp.take(1500))
      assert(!mp.contains("disabled by query planner"), mp.take(1500))
      assert("exchange hashpartitioning\\(band".r
        .findAllIn(mp.toLowerCase).size == 1, mp.take(1500))
      // (b) the NEXT probe: after the bucketed REWRITE of the merged
      // store, generation 2's probe join still rides the layout — the
      // property that makes the loop sustainable across generations
      rel.Layout.writeBucketedBy(merged, "minhash_store_g1_plan", 8, "band", "bkey")
      val probe = llm.Dedup.bandKeysFromShingles(
          gen2.select(col("doc_id"), llm.Dedup.shingles(col("text"), 3).as("sh")))
        .join(spark.table("minhash_store_g1_plan"), Seq("band", "bkey"))
      val pp = finalPlan(probe).split("== Initial Plan ==").head
      assert(pp.contains("Bucketed: true"), pp.take(1500))
      assert(!pp.contains("disabled by query planner"), pp.take(1500))
      assert("exchange hashpartitioning\\(band".r
        .findAllIn(pp.toLowerCase).size == 1, pp.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q106 persisted-index probe broadcasts; cid maintenance rides the bucket layout") {
    import org.apache.spark.sql.functions.{col, count, lit, size}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    llm.Sim.ivfIndexWrite(emb, nlist = 16, "ivf_assign_plan",
      "ivf_centroids_plan", buckets = 8)
    // (a) the probe: centroids and the nprobe probe set are broadcast,
    // so the persisted inverted lists stream once with no shuffle join
    // — query cost stays O(corpus·nprobe/nlist), never a corpus shuffle
    val p = finalPlan(llm.Sim.ivfKnnFromIndex(emb, nQuery = 10, k = 5,
      nprobe = 4, "ivf_assign_plan", "ivf_centroids_plan"))
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), "probe join must be broadcast")
    assert(!p.contains("SortMergeJoin"), "no shuffle join on the list side")
    // (b) index maintenance: any cid-keyed pass over the lists (size
    // stats, rebalance scans, merging a new batch's assignments) rides
    // the bucket layout with NO exchange — the property that makes the
    // persisted index maintainable at 100 TB
    val stats = spark.table("ivf_assign_plan").groupBy("cid")
      .agg(count(lit(1)).as("list_len"))
    val sp = finalPlan(stats).split("== Initial Plan ==").head
    assert(sp.contains("Bucketed: true"), sp.take(1500))
    assert(!sp.contains("disabled by query planner"), sp.take(1500))
    assert("exchange hashpartitioning\\(cid".r
      .findAllIn(sp.toLowerCase).isEmpty, sp.take(1500))
  }

  test("q76 BM25 derives dl/df from tf: ≤3 corpus scans, ≥1 reused stage") {
    // Pins the measured shape the bm25 scaladoc records: before the
    // derive-from-tf change the corpus was tokenized 4×; now ≤3 scans
    // with at least one shuffle stage reused across the derived aggs.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val df = llm.TextAnalysis.bm25(docs)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scans = "Scan parquet|FileScan".r.findAllIn(p).size
    val reused = "ReusedExchange|ReusedQueryStage".r.findAllIn(p).size
    assert(scans <= 3, s"$scans corpus scans")
    assert(reused >= 1, "expected the tf exchange to be reused")
  }

  test("q114 appended index batch keeps the bucket layout, loses nothing") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val base = emb.where(col("vec_id") % 5 =!= 4)
    val batch = emb.where(col("vec_id") % 5 === 4)
    llm.Sim.ivfIndexWrite(base, nlist = 16, "ivf_assign_plan_upd",
      "ivf_centroids_plan_upd", buckets = 8)
    llm.Sim.ivfIndexAppend(batch, "ivf_assign_plan_upd",
      "ivf_centroids_plan_upd", buckets = 8)
    val t = spark.table("ivf_assign_plan_upd")
    // the append is lossless and duplicate-free
    assert(t.count() == emb.count())
    assert(t.select("vec_id").distinct().count() == emb.count())
    // cid-keyed maintenance stays exchange-free over the now
    // multi-file-per-bucket table — the property that makes the
    // persisted index APPENDABLE, not just buildable
    val sp = finalPlan(t.groupBy("cid").agg(count(lit(1)).as("n")))
      .split("== Initial Plan ==").head
    assert(sp.contains("Bucketed: true"), sp.take(1500))
    assert(!sp.contains("disabled by query planner"), sp.take(1500))
    assert("exchange hashpartitioning\\(cid".r
      .findAllIn(sp.toLowerCase).isEmpty, sp.take(1500))
  }

  test("q111 decontamination broadcasts the eval grams; corpus never shuffles whole") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = finalPlan(llm.Curation.decontaminate(docs, "doc_id", "text",
      evalPred = col("doc_id") % 17 === 0, k = 5))
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    assert(!p.contains("SortMergeJoin"), "the corpus side must stream")
    // exactly two shuffles, neither of the corpus: the eval-side gram
    // distinct (benchmark-sized) and the per-doc count of MATCHED rows
    assert("exchange hashpartitioning".r.findAllIn(p.toLowerCase).size == 2,
      p.take(1500))
  }

  test("q112/q113 mixture sample and chunking are shuffle-free single passes") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p1 = finalPlan(llm.Curation.mixtureSample(docs, "doc_id", "lang",
      llm.Curation.MixtureWeights, llm.Curation.MixtureDenom))
      .split("== Initial Plan ==").head
    assert(!p1.toLowerCase.contains("exchange hashpartitioning"), p1.take(1500))
    assert(p1.contains("BroadcastHashJoin"), "weights ride a broadcast table")
    val p2 = finalPlan(llm.Curation.chunk(docs, "doc_id", "text", 32, 24))
      .split("== Initial Plan ==").head
    assert(!p2.toLowerCase.contains("exchange"), p2.take(1500))
  }

  test("q39 prefix sum distributes over data-derived buckets, no pid capture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val df = llm.Pack.shardPack(docs, 4096)
    val p = finalPlan(df)
    assert(p.toLowerCase.contains("hashpartitioning(pid"),
      "running sums must distribute over doc_id-range buckets")
    // The bucket id must be a pure function of the data: a
    // spark_partition_id() after a sampled exchange only agrees across
    // the window/offsets branches while exchange reuse fires.
    assert(!p.contains("SPARK_PARTITION_ID") &&
           !df.queryExecution.analyzed.toString.contains("SPARK_PARTITION_ID"),
      "bucket id must not be derived from physical partition ids")
  }

  test("q232 grid radius join is an equi-join on cell keys, never a nested loop") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val p = finalPlan(llm.Sim.gridRadiusJoin(emb, 0.02, 4096))
        .split("== Initial Plan ==").head
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"), p.take(1500))
      // candidate generation is a keyed join on the cell columns (AQE
      // collapses exchange printouts, so assert the join node itself)
      assert("(SortMergeJoin|ShuffledHashJoin) \\[bcx".r.findFirstIn(p).isDefined,
        p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q256 join hints steer the physical strategy (MERGE honored, BROADCAST honored)") {
    val p = finalPlan(rel.Queries.joinHints(spark, sf0001))
      .split("== Initial Plan ==").head
    // the hinted fact-fact join must be sort-merge even though the
    // sf0.001 sides are broadcastable; the dimension must broadcast
    assert(p.contains("SortMergeJoin"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q234 link prediction: wedge + anti joins stay equi-joins") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val bounded = li.withColumn("bsize", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("ok")))
        .where(col("bsize") <= 64).select("ok", "pk")
      val edges = bounded.select(col("ok"), col("pk").as("a"))
        .join(bounded.select(col("ok"), col("pk").as("b")), Seq("ok"))
        .where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cooc"))
        .where(col("cooc") >= 2L)
        .select(col("a").as("src"), col("b").as("dst"))
      val p = finalPlan(rel.Graph.linkPrediction(edges, 8, 30))
        .split("== Initial Plan ==").head
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"), p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q299 containment self-join is shingle-keyed, never nested-loop") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // at-scale shape
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val p = finalPlan(llm.Dedup.containmentPairs(docs, "doc_id", "text",
        k = 3, dfCap = 20L, threshold = 0.5))
        .split("== Initial Plan ==").head
      // the d1 < d2 predicate must stay a residual on the sh equi-join
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"), p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q291 naive Bayes broadcasts the model sides; score join is equi") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = finalPlan(llm.TextAnalysis.naiveBayes(docs))
      .split("== Initial Plan ==").head
    // priors, vocab size and train-doc count are broadcast scalars /
    // C-row frames; the V×C grid joins the token stream on `tok` —
    // nothing may plan as a nested loop over the corpus
    assert(p.contains("BroadcastExchange"), p.take(1200))
    // Exactly three INTENDED cross joins plan as BNLJ: the dense V×C
    // grid (vocab × per-class totals — C rows) and the 1-row vsize and
    // nTrain scalars. Anything beyond that bound means a corpus-wide
    // nested loop crept in (the vacuous || form of this pin was
    // flagged in ADVICE r8).
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 3,
      s"$bnlj BroadcastNestedLoopJoins — only the V×C grid and the " +
        s"two 1-row scalars (vsize, nTrain) may nest-loop\n${p.take(1500)}")
    assert(p.contains("HashJoin"), "score join must be hash-keyed")
  }

  test("q286 TPC-H Q2 decorrelates: min-aggregate join, no per-row subquery") {
    val p = finalPlan(rel.Queries.tpchQ2(spark, sf0001))
      .split("== Initial Plan ==").head
    // the correlated scalar subquery must become an aggregate-then-join
    // on l_partkey (visible as a min(s_acctbal) partial agg), never a
    // re-executed per-row plan (which would appear as Subquery nodes)
    assert(p.toLowerCase.contains("min(s_acctbal"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q277 per-order aggregate rides the DISTRIBUTE BY exchange") {
    // The explicit DISTRIBUTE BY l_orderkey is the ONLY hash exchange:
    // the l_orderkey group-by must reuse the declared clustering, not
    // add its own shuffle (the output-partitioning contract this
    // operator exists to demonstrate).
    val p = finalPlan(rel.Queries.distributeBy(spark, sf0001))
      .split("== Initial Plan ==").head
    assert("hashpartitioning\\(l_orderkey".r.findAllIn(p).size == 1,
      p.take(1500))
  }

  test("prefixFilterJoin spill path: salted bucket join stays hash-keyed (r9)") {
    // The lossless oversized-bucket spill routes big prefix buckets
    // through a (gram, salt) self-join. At scale that join MUST plan
    // as a keyed hash/merge join — a nested loop over a degenerate
    // bucket would reintroduce exactly the quadratic blowup the salting
    // exists to spread — and the probe side must pin ONE salt per doc
    // (pmod) while only the build side replicates across SpillSalts.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val p = finalPlan(llm.Dedup.prefixFilterJoin(
          docs, "doc_id", "text", k = 3, tauNum = 1, tauDen = 2,
          maxBucket = 2)) // force every >2-doc bucket through the spill
        .split("== Initial Plan ==").head
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"), p.take(1500))
      // the spill join keys on (g, salt): visible as a join whose key
      // list contains the salt expression's column
      assert("(SortMergeJoin|ShuffledHashJoin).*salt".r.findFirstIn(p).isDefined,
        p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q322 semDedup: within-cluster compare is an equi-join on cid (r10)") {
    // The paper's whole point is Σ|cluster|² not N²: the member-vs-
    // member comparison must shuffle-partition BY CLUSTER (equi-join on
    // cid) so each cluster compares independently — a nested loop or
    // cartesian here is the all-pairs blowup SemDeDup exists to avoid.
    // (The centroid-assignment stage is the shared assignTo broadcast
    // pass, pinned via the q106 index tests; it sits behind the
    // assignment localCheckpoint and is not visible in this plan.)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val p = finalPlan(llm.Sim.semDedup(emb))
        .split("== Initial Plan ==").head
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"), p.take(1500))
      assert("hashpartitioning\\(cid".r.findAllIn(p).nonEmpty,
        s"within-cluster join must key on cid\n${p.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q325 dsirWeights: bucket LM broadcasts; corpus never shuffles whole (r10)") {
    // The nBuckets-row LM delta table must BROADCAST into the per-doc
    // bucket-count stream (a shuffle join would move the corpus to meet
    // a 256-row table), and the LM is localCheckpoint'd so the corpus
    // token scan behind it runs once, not once per consumer.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = finalPlan(llm.Curation.dsirWeights(docs))
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"delta join must broadcast\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join anywhere in the scoring path\n${p.take(1500)}")
  }

  test("q323 lshPlan: histogram reused, pair join runs once (r10)") {
    // The O(maxId²) Jaccard pair join reduces to a 20-row histogram
    // with TWO consumers (total-mass broadcast branch + grid cross).
    // The eager localCheckpoint pins reduce-once-probe-many: the
    // declared plan must contain ZERO document scans — every corpus
    // pass sits behind the single checkpoint. Removing the checkpoint
    // re-inlines the pair join per consumer (4 scans reappear).
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val df = llm.Dedup.lshPlan(docs)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"${scans.size} document scans — histogram consumers recompute the pair join")
  }

  test("q344 clusterEval: all metrics run on checkpointed cells, zero re-scans (r10)") {
    // Everything after the (cluster, label) contingency checkpoint is
    // cell algebra: a lingering embedding scan means some consumer
    // (tp/byc/byl/n) re-runs the broadcast assignment pipeline.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val df = llm.Sim.clusterEval(emb)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"${scans.size} embedding scans — a metric consumer bypasses the cells checkpoint")
  }

  test("q341 facilityLocation: greedy rounds never re-scan raw vectors (r10)") {
    // The cand x corpus similarity table materializes once; each round
    // reads it plus broadcast coverage. A parquet scan in the final
    // plan means a round re-derived sims from the embeddings.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val df = llm.Sim.facilityLocationSelect(emb)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"${scans.size} embedding scans — a greedy round bypassed the sims checkpoint")
  }

  test("q300/q192 prefix windows are two-phase: no single-partition " +
      "WindowExec over corpus-grain input (r11)") {
    // VERDICT r10 item 1: the only admissible unpartitioned windows in
    // either plan run over the O(cells) cell-totals table (its output
    // carries the `cell` column and nothing at row grain). A global
    // window whose child still carries doc_id / o_custkey means the
    // corpus-grain sort regressed to one task.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plans = Seq(
      "q300" -> llm.TextAnalysis.heapsLaw(docs, every = 50),
      "q192" -> rel.Queries.rfmSegments(spark, sf0001))
    plans.foreach { case (name, df) =>
      val globals = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globals.nonEmpty, s"$name: expected the cell-totals window")
      globals.foreach { w =>
        val out = w.child.output.map(_.name).toSet
        assert(out.contains("cell"),
          s"$name: single-partition window over non-cell grain: $out")
        assert(!out.contains("doc_id") && !out.contains("o_custkey"),
          s"$name: corpus-grain column under a global window: $out")
      }
    }
  }

  test("q373 perceptual candidates are one grouped shuffle, no self-join (r11)") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      val p = finalPlan(llm.Multimodal.perceptualNearDups(docs, maxDist = 3))
        .split("== Initial Plan ==").head
      // banded signatures shuffle on (band, bval) for the size census +
      // the bucket expansion — the q36/q54 grouped shape, never a
      // signature-side SortMergeJoin pair blowup
      assert(!p.contains("SortMergeJoin") || p.contains("hashpartitioning(band"),
        p.take(1500))
      assert("hashpartitioning\\(band".r.findAllIn(p.toLowerCase).size >= 1,
        p.take(1500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("q378 maxsim broadcasts the query side — corpus streams once, no pair table (r11)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val p = finalPlan(llm.Sim.maxSimKnn(emb, nQuery = 5, k = 5))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "query subvectors must broadcast\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "corpus side must not shuffle to meet the 40-row query table\n" + p.take(1200))
  }

  test("q348/q352 bounded-sample kernels broadcast the small side (r10)") {
    // Both ops are one-pass streams against a broadcast bounded batch;
    // a SortMergeJoin or CartesianProduct means the corpus shuffled to
    // meet a ~200-row table.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Seq(llm.Sim.knnClassify(emb), llm.Sim.mmdDrift(emb)).foreach { df =>
      val p = finalPlan(df).split("== Initial Plan ==").head
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        p.take(1500))
      assert(p.contains("Broadcast"), s"expected a broadcast pass\n${p.take(1500)}")
    }
  }

  test("q403 psm matching is a blocked cell join — no cartesian, no corpus-grain global window (r12)") {
    // The 1-NN match must ride the cell equi-join; a CartesianProduct
    // means treated×controls blew up, and an unpartitioned WindowExec
    // whose child carries user ids means someone sorted the panel
    // globally (the matching window is PARTITIONED by tu).
    val df = rel.Queries.psmAtt(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    val globals = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"psm must not sort the panel globally: ${globals.size}")
  }

  test("q411 average precision keeps the two-phase cell discipline (r12)") {
    // Same contract as q300/q192: any single-partition window must run
    // over the O(cells) offset table (child output carries `cell`),
    // never over score-grain rows.
    val df = rel.Queries.averagePrecision(spark, sf0001)
    val globals = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty, "expected the cell-offset window")
    globals.foreach { w =>
      val out = w.child.output.map(_.name).toSet
      assert(out.contains("cell"),
        s"single-partition window over non-cell grain: $out")
      assert(!out.contains("score"),
        s"score-grain rows under a global window: $out")
    }
  }

  test("registry sweep: global windows, broadcast hints and content-group windows stay bounded grain (r13/r14/r15)") {
    // VERDICT r12 item 1: the q300/q192/q411 cell-grain pin, extended
    // to the WHOLE registry. A WindowExec with an empty partitionSpec
    // sorts its input in ONE task, so it is admissible only over
    // bounded-grain input, recognized structurally:
    //  (a) an O(cells) two-phase offset table — child output carries
    //      the `cell` column;
    //  (b) a limit-k head — GlobalLimit / TakeOrderedAndProject /
    //      CollectLimit / LocalLimit below the window;
    //  (c) a rank<=k form the planner rewrote through
    //      WindowGroupLimit (partial per-partition top-k before the
    //      single-partition final);
    //  (d) a named bounded grid from the allowlist below (each entry
    //      justified at its definition site — distinct-value grids,
    //      fixed sweeps, <=nlist cell tables, shard-offset tables).
    // Anything else is a corpus-grain global sort — the q360 failure
    // mode this round two-phased away.
    import org.apache.spark.sql.execution.SparkPlan
    // Adjudicated bounded-grain globals (each window's input is O(grid),
    // independent of corpus size — the VERDICT r12 item 1 categories):
    val allow: Set[String] = Set(
      "q165_sorted_neighborhood", // distinct leading-char bucket table (≤ alphabet)
      "q188_chisq",               // (event_type × dow) contingency grid
      "q191_kaplan_meier",        // day-grain life table, O(days)
      "q193_seasonal_index",      // dow grid (7)
      "q199_decile_lift",         // decile grid (10)
      "q261_rolling_corr",        // day-grain series, O(days)
      "q292_decision_stump",      // distinct-threshold value grid
      "q323_lsh_planner",         // (bands, rows/band) parameter sweep
      "q340_ada_boost",           // distinct-threshold value grid per round
      "q342_mi_rank",             // feature grid (4)
      "q351_jm_interp",           // λ sweep grid
      "q375_quantile_norm",       // distinct n_chars value grid
      "q379_filter_cascade",      // cascade-stage grid
      "q382_qini_uplift",         // decile grid (10)
      "q386_auc_bootstrap",       // bootstrap-replicate grid (B)
      "q394_logrank",             // day-grain risk table
      "q39_shard_pack",           // ≤32-row shard-offset table
      "q41_corpus_clean",         // ≤32-row shard-offset table
      "q70_pack_sequences",       // ≤32-row shard-offset table
      "q419_kendall_w",           // criterion value-grid midranks
      "q422_ljung_box",           // lag grid
      "q423_runs_test",           // day-grain sign series
      "q425_nelson_aalen",        // day-grain risk table
      "q428_rmst")                // day-grain risk table
    def boundedBelow(p: SparkPlan): Boolean = p.collectFirst {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => ()
      case _: org.apache.spark.sql.execution.LocalLimitExec => ()
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => ()
      case _: org.apache.spark.sql.execution.CollectLimitExec => ()
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => ()
    }.isDefined
    // The BROADCAST counterpart (VERDICT r13 item 2, the q360 vocab
    // broadcast): an AUTHORED broadcast() hint pins its side into every
    // executor regardless of runtime stats, so it is admissible only
    // over provably bounded grain — a 1-row/scalar aggregate, a
    // limit-k head, a literal/range grid, a cell/centroid table — or an
    // adjudicated entry in the allowlist below. Planner-chosen (stats
    // driven) broadcasts are exempt: they re-decide at real scale.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg,
      GlobalLimit => LGlobalLimit, LocalLimit => LLocalLimit,
      Join => LJoin, LocalRelation => LLocalRelation, Range => LRange,
      OneRowRelation => LOneRow, LogicalPlan, BROADCAST}
    // Adjudicated bounded-grain broadcasts. localCheckpoint() erases a
    // subtree's structural boundedness evidence (limit/aggregate →
    // LogicalRDD), so checkpointed bounded tables land here, grouped by
    // family; each family's boundedness argument is at its members'
    // definition sites. The sweep's first run caught and fixed three
    // REAL corpus-grain hints: q3/q213 broadcast(customer),
    // q202 broadcast(supplier) — both tables scale with SF.
    val allowBcast: Set[String] = Set(
      // persisted-index probes: centroid/cell tables read from the
      // catalog (nlist grain) + the literal-bounded query slice
      "q106_ivf_persisted", "q114_ivf_update",
      // two-phase offset-grid broadcasts (ADVICE r14: these passed by
      // the 'cell' column name before; the name is the codebase's
      // marker for the O(distinct-cell) offset table a two-phase
      // window ships, but it is not structural evidence — each entry's
      // grid is bounded by construction at its definition site:
      // deciles/thresholds/day-grain/distinct-count grids, and
      // localCheckpoint erases the aggregate that built them)
      "q166_auc", "q168_skyline", "q198_pareto_abc", "q199_decile_lift",
      "q274_kruskal_wallis", "q300_heaps_law", "q360_negative_sampling",
      "q382_qini_uplift", "q386_auc_bootstrap", "q411_average_precision",
      "q439_quantile_sketch", "q441_quantile_store",
      // centroid table at k grain (k=8 refinement)
      "q47_kmeans_refine",
      // literal-bounded query/audit slices (vec_id < nQuery heads,
      // anchor/outlier/query-token slices), usually checkpointed
      "q21_cosine_knn", "q32_cosine_knn_native", "q37_ann_knn",
      "q108_sq8_knn", "q122_matryoshka_knn", "q140_pq_knn",
      "q164_ivfpq_knn", "q175_mmr_diversify", "q176_rrf_fusion",
      "q196_hard_negatives", "q228_filtered_knn", "q231_ndcg",
      "q334_binary_knn", "q348_knn_classify", "q354_knn_outlier",
      "q355_infonce", "q356_retrieval_eval", "q378_maxsim", "q412_err",
      "q417_nn_descent", "q418_team_draft", "q421_exposure_fairness",
      "q424_rbp",
      // eval-suite grain: the benchmark n-gram set a decontamination
      // pass ships to every executor BY DESIGN (eval sets are small)
      "q111_decontaminate",
      // O(increment) by contract: fresh-batch node/component lists
      "q141_incremental_cc",
      // bounded grids and per-group scalar tables (event_type/day/dow/
      // class/bin/bucket/cohort/source/lang/stratum/fold/criterion
      // grain aggregates; construction-bounded tables: q432's
      // mBits/32-word bitmap, q358's limit-M vocabulary, q375's
      // distinct-length value grid, q365's k-th order statistic)
      "q162_rolling_distinct", "q163_markov_eval",
      "q165_sorted_neighborhood", "q170_cusum", "q178_outlier_fence",
      "q185_conformal", "q193_seasonal_index", "q200_mad_robust",
      "q201_theil_sen", "q202_hhi", "q208_cohort_ltv",
      "q209_weighted_median", "q265_standardize", "q291_naive_bayes",
      "q294_t_closeness", "q295_msprt", "q309_cohens_kappa",
      "q337_cv_ridge", "q338_ar_forecast", "q342_mi_rank",
      "q352_mmd_drift", "q358_source_kl", "q365_hill_tail",
      "q369_temporal_psi", "q371_trimmed_mean", "q375_quantile_norm",
      "q384_blocking_eval", "q385_source_ablation", "q396_aipw_dr",
      "q399_data_shapley", "q400_shapley_reweight", "q419_kendall_w",
      "q432_bloom_filter", "q436_ips_eval",
      // the SQL hint-surface demo: BROADCAST(c) is the demonstrated form
      "q256_join_hints")
    // Adjudicated content-keyed windows (r15 sweep): each entry's
    // window group is bounded at its definition site.
    val allowContentWin: Set[String] = Set.empty
    def boundedBcast(p: LogicalPlan): Boolean = {
      // ADVICE r14: no name-based acceptance — a 'cell'/'cid' output
      // column is not boundedness evidence (a vocab-grain table can
      // carry one, the exact r13-item-2 failure). Only STRUCTURAL
      // evidence passes: scalar aggregate, limit head, local relation,
      // bounded range, or the fixed TPC-H dims; everything else goes
      // through the per-query allowlist with a written justification.
      // spec-fixed TPC-H dims: every leaf is region (5 rows) or nation
      // (25 rows) — cardinality fixed regardless of scale factor
      val leaves = p.collectLeaves()
      val dimLeavesOnly = leaves.nonEmpty && leaves.forall {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.forall { rp =>
                val b = rp.getName
                b == "region.parquet" || b == "nation.parquet"
              }
            case _ => false
          }
        case _: LLocalRelation | _: LOneRow => true
        case r: LRange => r.numElements <= BigInt(4096)
        case _ => false
      }
      dimLeavesOnly ||
        p.collectFirst {
          case a: LAgg if a.groupingExpressions.isEmpty => ()
          case _: LGlobalLimit => ()
          case _: LLocalLimit => ()
          case _: LLocalRelation => ()
          case r: LRange if r.numElements <= BigInt(4096) => ()
        }.isDefined
    }
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val globals = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      globals.foreach { w =>
        val out = w.child.output.map(_.name).toSet
        val ok = out.contains("cell") || boundedBelow(w.child) ||
          allow.contains(name)
        if (!ok) bad += s"$name: global window over ${out.mkString(",")}"
      }
      df.queryExecution.optimizedPlan.foreach {
        case j: LJoin =>
          Seq((j.left, j.hint.leftHint, "left"),
            (j.right, j.hint.rightHint, "right")).foreach {
            case (side, hint, lbl) =>
              if (hint.exists(_.strategy.contains(BROADCAST)) &&
                  !boundedBcast(side) && !allowBcast.contains(name))
                bad += s"$name: unbounded broadcast ($lbl side: " +
                  s"${side.output.map(_.name).take(8).mkString(",")})"
          }
        case _ => ()
      }
      // r15, the q446 lesson: no window may be partitioned purely by a
      // content-derived group (nm/gram/band/bucket/sig families) with
      // no cap, salt, or subdividing co-key — see unsaltedContentWindows
      if (!allowContentWin.contains(name))
        unsaltedContentWindows(df.queryExecution.sparkPlan)
          .foreach(msg => bad += s"$name: $msg")
    }
    assert(bad.isEmpty,
      s"${bad.size} unbounded single-partition windows / broadcasts:\n" +
      bad.mkString("\n"))
  }

  test("content-window detector flags a re-skewed q446-shaped plan (r15)") {
    // The detector must catch exactly the r14 failure shape: a
    // row_number window partitioned by a content-derived gram column
    // over corpus-grain rows (no cap, no salt, no co-key)...
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val grams = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "gram")))
    val skewed = grams.withColumn("rk",
      row_number().over(W.partitionBy("gram")
        .orderBy(col("doc_id"), col("pos"))))
    skewed.collect()
    assert(unsaltedContentWindows(skewed.queryExecution.sparkPlan).nonEmpty,
      "detector missed the re-skewed gram window")
    // ...while passing the mitigated forms: a doc_id co-key subdivides
    // the group, and a rank<=k the planner rewrites through
    // WindowGroupLimit caps it
    val cokeyed = grams.withColumn("rk",
      row_number().over(W.partitionBy("gram", "doc_id").orderBy("pos")))
    cokeyed.collect()
    assert(unsaltedContentWindows(cokeyed.queryExecution.sparkPlan).isEmpty,
      "doc_id co-key wrongly flagged")
    val capped = grams.withColumn("rk",
        row_number().over(W.partitionBy("gram")
          .orderBy(col("doc_id"), col("pos"))))
      .where(col("rk") <= 3)
    capped.collect()
    assert(unsaltedContentWindows(capped.queryExecution.sparkPlan).isEmpty,
      "WindowGroupLimit-capped rank wrongly flagged")
  }

  test("q417 nn-descent is equi-join only: no cartesian, no corpus global sort (r12)") {
    // Seed = cell equi-join, expansion = middle-node equi-join, audit
    // = broadcast of the bounded query slice. The only admissible
    // cartesian is the 1-row scalar combine class; a CartesianProduct
    // or BroadcastNestedLoopJoin over vectors means a pair blowup.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val df = llm.Sim.nnDescent(emb)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q417/q435 probe the stamped nn_graph_store, never rebuild the chain (r14)") {
    // q417's declared plan must read the stage graphs from the store's
    // parquet (scan-only probe, zero checkpoint RDDs — an inline stage
    // rebuild would show its localCheckpointed rounds); q435 consumes
    // the store during construction (its CC loop is checkpoint-paced),
    // so its pin is idempotence: a second construction must NOT rewrite
    // the store files (probe, not rebuild).
    val df417 = SparkEntry.queries("q417_nn_descent")(spark, sf0001)
    val p417 = df417.queryExecution.sparkPlan
    val storeScans = p417.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("nn_graph_store")) => f
    }
    assert(storeScans.nonEmpty, "q417 does not scan nn_graph_store")
    val rddScans = p417.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(rddScans.isEmpty,
      s"q417 carries ${rddScans.size} checkpointed-chain scans — " +
        "the stage chain is being rebuilt inline")
    val storeDir = new java.io.File(Scratch.dir("nn_graph_store"))
    def mtimes() = storeDir.listFiles().map(f => f.getName -> f.lastModified)
      .toMap
    val before = mtimes()
    SparkEntry.queries("q435_mutual_knn")(spark, sf0001).collect()
    assert(mtimes() == before,
      "q435 rewrote the nn_graph_store on an unchanged fixture")
  }
}
