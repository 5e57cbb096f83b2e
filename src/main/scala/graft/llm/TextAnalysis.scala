package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, term frequencies / TF-IDF,
  * document fingerprinting. All per-document computation is narrow and
  * codegen'd; only the term-frequency family shuffles (standard
  * partial-agg group-bys).
  */
object TextAnalysis {

  private def toks(text: Column): Column =
    filter(split(text, " ", -1), t => t =!= "")

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs | digit runs | single non-space symbol). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("n_tokens_ws"),
      size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^ a-zA-Z0-9]', 0)"))
        .cast("long").as("n_tokens_re"),
      length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  val Stopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "a", "is", "for", "on", "with")

  /** CCNet-style line-level dedup (boilerplate removal): split each
    * document into '. '-delimited lines, count each distinct line's
    * document frequency across the corpus, drop lines appearing in more
    * than `maxDf` documents, and reassemble the survivors in original
    * order. This is the standard crawl-cleaning pass that strips nav
    * bars / cookie banners / footers which exact- and near-dup document
    * dedup both miss (the lines repeat; the documents differ).
    *
    * Scale: one hash-agg over exploded lines (the line-frequency table —
    * distributed, map-side partial), one equi-join of lines to their
    * frequencies (hot boilerplate lines are ordinary join skew — AQE
    * splits them), one per-doc regroup for reassembly. Order is restored
    * from the carried position, so the regroup needs no sort of the
    * corpus. Output: (doc_id, n_lines, n_dropped, clean). */
  def lineDedup(docs: DataFrame, text: Column, maxDf: Long): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(text, "\\. ")).as(Seq("pos", "line")))
    val freq = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
    lines.join(freq, "line")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(". ", transform(
          array_sort(collect_list(
            when(col("df") <= maxDf, struct(col("pos"), col("line"))))),
          e => e.getField("line"))).as("clean"))
      .orderBy("doc_id")
  }

  /** Unigram-LM average log-probability per document — the dataflow of a
    * CCNet/perplexity-style model-based quality filter, with the LM being
    * the corpus's own unigram distribution (a real pipeline swaps in a
    * trained model's broadcast table; the plan shape is identical). Two
    * shuffles: corpus token frequencies (hash-agg on token, map-side
    * partial), then tokens equi-joined back to their frequencies (AQE
    * skew-splittable — hot tokens are ordinary join skew) and averaged
    * per document. The log-prob sum accumulates in exact DECIMAL(38,12)
    * ([[graft.rel.Queries.dsum]]) so the average is order-independent;
    * the final `round(.,6)` absorbs the one-ulp libm `ln` divergence
    * between engines (q27's proven pattern). Output:
    * (doc_id, n_tokens, avg_logp). */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    tok.join(freq, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        log(col("cnt").cast("double") / col("total").cast("double")).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        graft.rel.Queries.femit(
          graft.rel.Queries.dsum(col("logp")) / count(lit(1))).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** Bigram-LM average log-probability with add-one smoothing — the
    * conditional-probability upgrade of [[unigramLogProb]] (a CCNet-
    * style perplexity filter runs a trained Kneser–Ney model; the
    * corpus's own add-one bigram model keeps the dataflow identical
    * and the gate oracle exact): per adjacent token pair,
    * `P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)`, averaged per doc.
    *
    * Scale: pairs are generated PER ROW (an indexed `transform` +
    * `try_element_at` over the token array — no positional self-join),
    * then two hash-aggs (bigram and left-context counts, map-side
    * partial) and the equi-join of pairs back to their counts (AQE
    * skew-splittable, the q58 shape); V is a broadcast 1-row distinct
    * count. Log-prob sums ride the exact DECIMAL route; round(.,6)
    * absorbs libm ln drift. Output: (doc_id, n_bigrams, avg_logp). */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), toks(col("text")).as("ts"))
    val prs = base.select(col("doc_id"), explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1, try_element_at(ts, i + 2) AS w2)), " +
          "p -> p.w2 IS NOT NULL)")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = prs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val left = prs.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = docs.select(explode(toks(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    prs.join(bi, Seq("w1", "w2")).join(left, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((col("cb") + 1).cast("double") /
          (col("cu") + col("v")).cast("double")).as("logp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        graft.rel.Queries.femit(
          graft.rel.Queries.dsum(col("logp")) / count(lit(1))).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length, mean token length, alpha-token ratio,
    * stopword ratio, and a blended score. Pure per-row double arithmetic
    * (identical expression shape on the DuckDB side → bit-equal). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    val n = size(ts)
    val alpha = size(filter(ts, t => t.rlike("^[a-z-_]+$")))
    val stop = size(filter(ts, t => t.isin(Stopwords: _*)))
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      n.cast("long").as("n_tokens"),
      (length(col("text")).cast("double") / n).as("avg_tok_len"),
      (alpha.cast("double") / n).as("alpha_ratio"),
      (stop.cast("double") / n).as("stop_ratio"))
      .withColumn("quality",
        lit(0.5) * col("alpha_ratio") + lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.2) * least(col("n_tokens").cast("double") / lit(64.0), lit(1.0)))
      .orderBy("doc_id")
  }

  private val LangLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "que"))

  /** Language-ID heuristic: stopword-hit voting against small per-language
    * profiles, deterministic tiebreak en &gt; de &gt; es. (A real system
    * would use char n-gram profiles; the dataflow shape is identical.) */
  def langId(docs: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    val scores = LangLists.map { case (l, ws) =>
      size(filter(ts, t => t.isin(ws: _*))).cast("long").as(s"s_$l")
    }
    docs.select((col("doc_id") +: scores): _*)
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_es"), "de")
          .otherwise("es"))
      .orderBy("doc_id")
  }

  /** Top-k terms per language by frequency (deterministic tiebreak). */
  def langTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok").asc)
    docs.select(col("lang"), explode(split(col("text"), " ", -1)).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .orderBy("lang", "rn")
  }

  /** TF-IDF with languages as the document unit: tf(lang, term) ×
    * ln(n_langs / df(term)), rounded to 6 dp for cross-engine libm
    * stability. */
  /** Cluster labeling: the top-`topK` tokens per embedding cluster by
    * cluster-level TF-IDF — the human-readable "what is this cluster
    * about" report a curation pipeline runs right after k-means
    * (cluster via [[Sim.ivfAssign]], label here). The cluster plays the
    * document role: tf = token count within the cluster, df = number of
    * clusters containing the token, score = tf·ln(n_clusters/df).
    *
    * Scale: the corpus tokenizes once (one exchange feeds both the tf
    * and df aggs), the 1-row cluster count broadcasts, and the rank
    * window partitions by cid over the already-reduced (cid, tok)
    * table — O(vocab) per cluster, never O(tokens). The only float is
    * tf·ln(ratio) in one fixed order, round(6) absorbing the one-ulp
    * libm divergence (q27's proven pattern); ties break on token ASC. */
  def clusterLabels(docs: DataFrame, asg: DataFrame, topK: Int = 3): DataFrame = {
    val tok = docs.join(asg, docs("doc_id") === asg("vec_id"))
      .select(col("cid"), explode(split(col("text"), " ", -1)).as("tok"))
      .where(col("tok") =!= "")
    val tf = tok.groupBy("cid", "tok").agg(count(lit(1)).as("tf"))
    val dfp = tok.select("cid", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = asg.agg(countDistinct(col("cid")).as("n_clusters"))
    val w = Window.partitionBy("cid").orderBy(col("score").desc, col("tok").asc)
    tf.join(dfp, "tok").crossJoin(broadcast(n))
      .withColumn("score",
        graft.rel.Queries.femit(col("tf") * log(col("n_clusters").cast("double") / col("df"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= topK)
      .select("cid", "rnk", "tok", "tf", "df", "score")
      .orderBy("cid", "rnk")
  }

  def tfidf(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("lang"), explode(split(col("text"), " ", -1)).as("tok"))
      .where(col("tok") =!= "")
    val tf = tok.groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
    val dft = tok.select("lang", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("lang")).as("n_langs"))
    tf.join(dft, "tok").crossJoin(broadcast(n))
      .select(col("lang"), col("tok"), col("tf"), col("df"),
        graft.rel.Queries.femit(col("tf") * log(col("n_langs").cast("double") / col("df"))).as("tfidf"))
      .orderBy("lang", "tok")
  }

  /** Okapi BM25 at document granularity (Robertson et al., TREC-3; the
    * idf is the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` non-negative
    * variant) — the retrieval-style relevance score a data-curation
    * pipeline uses to mine documents matching a quality corpus. q27
    * computes TF-IDF with *languages* as the document unit; this is the
    * per-document scoring a user actually ranks with.
    *
    * Three standard shuffles, all exact-count aggregations (tf, dl, df
    * — no float accumulation anywhere), plus one broadcast 1-row stats
    * frame; the per-row BM25 arithmetic is single-expression IEEE
    * double math whose operation ORDER the DuckDB oracle mirrors
    * exactly, emitted through the [[graft.rel.Queries.femit]] IEEE
    * lattice to match the oracle's femitSql twin bit-for-bit (a mixed
    * round/femit pair diverges at 7th-decimal half boundaries). The
    * k1/b constants are
    * pre-combined in Scala and interpolated into BOTH plans so each
    * engine parses the identical double literal.
    * Output: (doc_id, tok, tf, df, bm25). */
  def bm25(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // dl/df/stats all DERIVE from tf rather than re-tokenizing the
    // corpus: sum(tf) per doc IS the doc length, count per tok IS the
    // df. Measured effect: corpus scans 4 → 3 with one shuffle stage
    // reused (AQE reuses tf's exchange for one of the two derived aggs;
    // the other's stage canonicalizes differently and re-executes). A
    // pipeline scoring MANY term sets against one corpus would
    // materialize tf once (checkpoint/table) and reuse it — the plan
    // shape is unchanged.
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(dl, "doc_id").join(dft, "tok").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        graft.rel.Queries.femit(
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) +
              lit(b) * col("dl").cast("double") * col("n_docs") / col("sum_dl")))).as("bm25"))
      .orderBy("doc_id", "tok")
  }

  /** Top-k retrieval over the [[bm25]] scores: rank documents by summed
    * BM25 across a query term set — the "mine documents resembling the
    * quality corpus" lookup a curation pipeline runs. The per-doc score
    * sums ≤|terms| already-rounded values in exact DECIMAL
    * ([[graft.rel.Queries.dsum]]) so the total is order-independent;
    * the top-k is `orderBy().limit()` (TakeOrderedAndProject — per-
    * partition top-k, never a global sort of the match set) and only
    * the k survivors pay the rank window. Output:
    * (rnk, doc_id, n_terms, score). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], kTop: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25(docs, k1, b)
      .where(col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        graft.rel.Queries.dsum(col("bm25")).as("score")), kTop)

  /** Shared retrieval epilogue for [[bm25TopK]], [[bm25TopKTerms]] and
    * [[rm3Expansion]] (one home for the ranking rule — VERDICT r11
    * item 5): exact top-k by (score DESC, doc_id ASC) plans as
    * TakeOrderedAndProject (per-partition top-k, never a global sort
    * of the match set), and only the k survivors pay the rank
    * window. Input must carry (doc_id, n_terms, score). */
  private def rankTopK(scored: DataFrame, kTop: Int): DataFrame =
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(kTop)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("rnk", "doc_id", "n_terms", "score")
      .orderBy("rnk")

  /** RM3 pseudo-relevance-feedback query expansion (Lavrenko &amp;
    * Croft SIGIR 2001's relevance model; the RM3 interpolation of
    * Abdul-Jaleel et al., TREC 2004 — THE classical query-expansion
    * baseline IR systems still report against): BM25 top-`fbDocs`
    * for the original query → RM1 term distribution
    * P(w|R) = Σ_d w_d·tf(w,d)/|d| with w_d the doc's normalized
    * retrieval score → top-`fbTerms` expansion terms (ranked by
    * ROUNDED weight with the term tiebreak, the q207 rule; original
    * terms excluded) → final weighted-BM25 rescoring with weights
    * λ·uniform(original) ⊕ (1−λ)·RM1 normalized over the SELECTED
    * terms (keeps the emitted weights a distribution without the
    * full-vocab partition function; documented deviation from
    * textbook RM3's vocab-wide normalizer).
    *
    * Determinism: doc scores, rm1 masses, and both normalizers ride
    * dsum; expansion selection is by femit'd weight; the final
    * ranking is the q79 rule (exact dsum score, doc_id tiebreak).
    *
    * Scale: one tf shuffle (dl/df/stats derive from tf — the q76
    * plan shape, checkpointed here because FOUR consumers read it);
    * the feedback set is fbDocs rows and the weight table
    * |q|+fbTerms rows, both broadcast; the final pass is the q79
    * weighted-sum scan. No new shuffle shape at any corpus size. */
  def rm3Expansion(docs: DataFrame,
                   query: Seq[String] = Seq("spark", "join"),
                   fbDocs: Int = 10, fbTerms: Int = 5,
                   lambda: Double = 0.5, kTop: Int = 10): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val sp = docs.sparkSession
    import sp.implicits._
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds dl/df/stats + rm1 + both scoring passes
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val k1 = 1.2; val b = 0.75
    val bm = tf.join(dl, "doc_id").join(dft, "tok").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        femit(
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) +
              lit(b) * col("dl").cast("double") * col("n_docs") / col("sum_dl"))))
          .as("bm25"))
      .localCheckpoint() // initial + final scoring passes
    val init = bm.where(col("tok").isin(query: _*))
      .groupBy("doc_id").agg(dsum(col("bm25")).as("s0"))
      .orderBy(col("s0").desc, col("doc_id").asc).limit(fbDocs)
      .localCheckpoint() // feeds its own normalizer
    val fb = init.crossJoin(broadcast(init.agg(dsum(col("s0")).as("st"))))
      .select(col("doc_id"), (col("s0") / col("st")).as("wd"))
    val rm1 = tf.join(dl, "doc_id").join(broadcast(fb), "doc_id")
      .where(!col("tok").isin(query: _*))
      .groupBy("tok")
      .agg(dsum(col("wd") * col("tf").cast("double") / col("dl").cast("double"))
        .as("rm1"))
    val sel = rm1
      .withColumn("rw", femit(col("rm1")))
      .orderBy(col("rw").desc, col("tok").asc).limit(fbTerms)
      .localCheckpoint() // feeds its own normalizer
    val selTot = sel.agg(dsum(col("rm1")).as("rt"))
    val wexp = sel.crossJoin(broadcast(selTot))
      .select(col("tok"), (lit(1.0 - lambda) * col("rm1") / col("rt")).as("wt"))
    val worig = query.toDF("tok")
      .select(col("tok"), lit(lambda / query.size).as("wt"))
    val weights = worig.unionByName(wexp)
    rankTopK(bm.join(broadcast(weights), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        dsum(col("wt") * col("bm25")).as("score")), kTop)
  }

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models" §A1.1 quality-filter flavor): duplicate-token fraction,
    * duplicate-2-gram fraction, and top-token fraction — the standard
    * boilerplate/degenerate-text detectors in a pretraining pipeline.
    * Per-row array math (codegen'd, no shuffle) except the top-token
    * count, a standard exploded partial-agg group-by keyed by doc.
    * Ratios are single IEEE divisions of exact longs — bit-identical on
    * any engine. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    val g2 = (t: Column) => slice(
      transform(t, (x, i) => concat_ws(" ", x, try_element_at(t, i + lit(2)))),
      lit(1), greatest(size(t) - lit(1), lit(0)))
    val perRow = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
          .as("dup_tok_ratio"),
        when(size(col("ts")) >= 2,
          lit(1.0) - size(array_distinct(g2(col("ts")))).cast("double")
            / (size(col("ts")) - lit(1)))
          .otherwise(lit(0.0)).as("dup_2gram_ratio"))
    val top = docs.select(col("doc_id"), explode(ts).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("top_cnt"))
    perRow.join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("dup_tok_ratio"),
        col("dup_2gram_ratio"),
        (col("top_cnt").cast("double") / col("n_tokens")).as("top_tok_ratio"))
      .orderBy("doc_id")
  }

  /** Linear-model quality scoring — the fastText-style classifier
    * filter shape (score = σ(w·x + b) over cheap per-doc features) with
    * a literal weight vector standing in for trained parameters: in
    * production the weights arrive as a broadcast table and NOTHING
    * else changes, so the declared plan is the production plan. Pure
    * per-row double arithmetic in a pinned evaluation order; round(6)
    * absorbs the one-ulp libm `exp` divergence (the q27/q58/q76 `ln`
    * pattern). Output: (doc_id, n_tokens, alpha_ratio, stop_ratio,
    * score, keep). */
  def linearScore(docs: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    val n = size(ts)
    val alpha = size(filter(ts, t => t.rlike("^[a-z-_]+$")))
    val stop = size(filter(ts, t => t.isin(Stopwords: _*)))
    docs.select(col("doc_id"),
      n.cast("long").as("n_tokens"),
      (alpha.cast("double") / n).as("alpha_ratio"),
      (stop.cast("double") / n).as("stop_ratio"))
      .withColumn("z",
        lit(3.0) * col("alpha_ratio") - lit(2.0) * col("stop_ratio")
          + lit(0.01) * least(col("n_tokens").cast("double"), lit(100.0)) - lit(2.0))
      .withColumn("score", graft.rel.Queries.femit(lit(1.0) / (lit(1.0) + exp(-col("z")))))
      .drop("z")
      .withColumn("keep", col("score") >= 0.5)
      .orderBy("doc_id")
  }

  /** [[linearScore]] with the parameters as a REAL (feature, weight)
    * TABLE — the shape a trained scorer actually ships (weights land in
    * storage, not in code), proving the linearScore scaladoc's "a
    * broadcast table changes nothing" claim in-plan. Features go long-
    * form (one map explode per doc — bias rides along as a constant-1
    * feature), join the broadcast weight table, and the per-doc w·x
    * accumulates in exact DECIMAL ([[graft.rel.Queries.dsum]]) so the
    * sum is order-independent — the one semantic difference from the
    * literal form's fixed-order double adds (equal to a few ulps;
    * pinned by a tolerance test, while the gate row carries its own
    * decimal-sum oracle). Scale: the corpus streams once, the weight
    * table broadcasts, one doc-keyed hash-agg — a 10⁶-feature model
    * changes the broadcast size, not the plan.
    * Output: (doc_id, score, keep). */
  def linearScoreWeighted(docs: DataFrame, weights: DataFrame): DataFrame = {
    val ts = toks(col("text"))
    val n = size(ts)
    val alpha = size(filter(ts, t => t.rlike("^[a-z-_]+$")))
    val stop = size(filter(ts, t => t.isin(Stopwords: _*)))
    val feats = docs.select(col("doc_id"),
      explode(map(
        lit("alpha_ratio"), alpha.cast("double") / n,
        lit("stop_ratio"), stop.cast("double") / n,
        lit("len_capped"), least(n.cast("double"), lit(100.0)),
        lit("bias"), lit(1.0))).as(Seq("feature", "x")))
    feats.join(broadcast(weights), "feature")
      .groupBy("doc_id")
      .agg(graft.rel.Queries.dsum(col("x") * col("weight")).as("z"))
      .withColumn("score", graft.rel.Queries.femit(lit(1.0) / (lit(1.0) + exp(-col("z")))))
      .drop("z")
      .withColumn("keep", col("score") >= 0.5)
      .orderBy("doc_id")
  }

  /** The q88/q104 weight vector as (feature, weight) rows — shared by
    * the declared query and its oracle CTE so both engines join the
    * identical table. */
  val LinearWeights: Seq[(String, Double)] = Seq(
    "alpha_ratio" -> 3.0, "stop_ratio" -> -2.0,
    "len_capped" -> 0.01, "bias" -> -2.0)

  /** [[bm25TopK]] with the query term set as a TABLE joined into the
    * plan instead of `isin` literals — the production retrieval shape
    * (term sets come from a query log / anchor corpus, not code).
    * Identical dataflow: the term table broadcasts into the tf join,
    * everything downstream is [[bm25TopK]] verbatim, and the result
    * must equal q79's exactly (same oracle modulo the term CTE). */
  def bm25TopKTerms(docs: DataFrame, terms: DataFrame, kTop: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25(docs, k1, b)
      .join(broadcast(terms), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        graft.rel.Queries.dsum(col("bm25")).as("score")), kTop)

  // Scrub patterns: simple enough to behave identically under Java
  // regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val LongNumRe = "[0-9]{7,}"

  /** PII/URL scrubbing: emails, URLs, then long digit runs replaced by
    * typed placeholders, with per-class match counts. Pure per-row
    * regexp projection — no shuffle, codegen'd, scales like any map. */
  def scrub(docs: DataFrame, text: Column): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        LongNumRe, "<NUM>").as("clean"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(text, lit(LongNumRe)).cast("long").as("n_longnums"))

  /** Collocation scoring over adjacent bigrams: PMI (Church &amp; Hanks,
    * CL 1990) and Dunning's log-likelihood ratio ("Accurate Methods for
    * the Statistics of Surprise and Coincidence", CL 1993) — the
    * relative-frequency upgrade of the reference's raw co-occurrence
    * counts (Lin &amp; Dyer ch. 3 presents exactly this progression):
    * counts say "the pair is frequent", PMI/LLR say "more frequent than
    * its parts predict". PMI = ln(n11·N / (n1dot·ndot2));
    * LLR = 2·Σ x·ln x over the 2×2 contingency table minus its
    * marginals — the statistically robust score for sparse counts.
    *
    * Scale: ONE bigram hash-agg over the corpus (O(tokens) shuffle,
    * partial-agged); the marginals derive from the already-reduced
    * bigram table (two more tiny aggs), the 1-row total broadcasts.
    * Parity: all counts exact longs; ln is the q58/q79 libm class;
    * every ln argument is an exact integer-valued double, the
    * xlogx/term chains are written in one fixed order in both engines,
    * and the scores ship round(6). */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long): DataFrame = {
    val bg = docs
      .select(expr(s"filter(split($textCol, ' ', -1), t -> t != '')").as("ts"))
      .select(explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1, try_element_at(ts, i + 2) AS w2)), " +
          "p -> p.w2 IS NOT NULL)")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n11"))
    val left = cnt.groupBy("w1").agg(sum(col("n11")).as("n1dot"))
    val right = cnt.groupBy("w2").agg(sum(col("n11")).as("ndot2"))
    val tot = cnt.agg(sum(col("n11")).as("nn"))
    def xlx(x: Column): Column =
      when(x > 0, x.cast("double") * log(x.cast("double"))).otherwise(lit(0.0))
    val k12 = col("n1dot") - col("n11")
    val k21 = col("ndot2") - col("n11")
    val k22 = col("nn") - col("n1dot") - col("ndot2") + col("n11")
    cnt.join(left, "w1").join(right, "w2").crossJoin(broadcast(tot))
      .where(col("n11") >= minCount)
      .select(col("w1"), col("w2"), col("n11"), col("n1dot"), col("ndot2"),
        graft.rel.Queries.femit(log((col("n11") * col("nn")).cast("double"))
          - log((col("n1dot") * col("ndot2")).cast("double"))).as("pmi"),
        graft.rel.Queries.femit(
          lit(2.0) * (xlx(col("n11")) + xlx(k12) + xlx(k21) + xlx(k22)
          - xlx(col("n1dot")) - xlx(col("nn") - col("n1dot"))
          - xlx(col("ndot2")) - xlx(col("nn") - col("ndot2"))
          + xlx(col("nn")))).as("llr"))
  }

  /** Out-of-vocabulary rate against a corpus-derived top-V vocabulary —
    * the coverage check run before committing to a tokenizer/vocab: the
    * vocab is the V most frequent tokens (ties broken by token — a
    * deterministic total order, so both engines derive the identical
    * vocab), and each doc reports how many of its token OCCURRENCES
    * fall outside it. Docs with no tokens have no rate and are absent.
    *
    * Scale: one token-count agg (O(tokens) shuffle, partial-agged), a
    * top-V that is a TakeOrderedAndProject (never a global sort), and a
    * broadcast left join back onto the exploded stream — the corpus
    * streams once more with no shuffle before the per-doc agg. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val toksEx = docs.select(col(idCol).as("doc_id"),
      explode(expr(s"filter(split($textCol, ' ', -1), t -> t != '')")).as("tok"))
    val vocab = toksEx.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    toksEx.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Build half of the persisted INVERTED INDEX (search-engine posting
    * lists — the retrieval analogue of q106's ANN index): flat
    * (tok, doc_id, tf) postings written as a table bucketed AND sorted
    * by `tok`. A term-keyed probe then reads only the buckets its terms
    * hash to (Spark bucket pruning on `isin`) and, within them, skips
    * row groups via the sorted min/max stats — the index is consulted,
    * not scanned. Rebuild-per-pass is the q131 convention (the write IS
    * the declared operator); incremental maintenance would ride
    * [[graft.rel.Layout.appendBucketedBy]] exactly like q114. */
  def postingIndexWrite(docs: DataFrame, idCol: String, textCol: String,
                        table: String, buckets: Int): Unit = {
    val postings = docs.select(col(idCol).as("doc_id"),
        explode(expr(s"filter(split($textCol, ' ', -1), t -> t != '')")).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
    graft.rel.Layout.writeBucketedBy(postings, table, buckets, "tok")
  }

  /** Probe half: conjunctive (AND) term query over the persisted
    * posting table — docs containing EVERY query term, scored by
    * summed tf. Shuffle volume is O(matched postings) only: the scan is
    * bucket-pruned to the terms' buckets, and the doc-keyed agg sees
    * just those rows — at 100 TB the candidate set is ≪ corpus, which
    * is the whole point of an index. */
  def conjunctiveQuery(s: org.apache.spark.sql.SparkSession, table: String,
                       terms: Seq[String]): DataFrame =
    s.table(table).where(col("tok").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("tok")).as("nt"), sum(col("tf")).as("score"))
      .where(col("nt") === terms.size)
      .select(col("doc_id"), col("score"))

  /** Lang-ID confusion matrix: [[langId]]'s stopword-count prediction
    * evaluated against the labeled `lang` column — the eval every
    * classifier in the curation pipeline needs next to its scores
    * (q166/q180 grade rankings; this grades a hard classifier). One
    * matrix cell per (label, prediction) with per-label recall; counts
    * exact int64, recall a single division. The prediction recomputes
    * langId's plan inline (same stopword filters), the label joins by
    * doc_id — one corpus scan, one tiny hash-agg, a label-grain window
    * for the row totals. */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val pred = langId(docs).select(col("doc_id"), col("pred_lang"))
    docs.select(col("doc_id"), col("lang"))
      .join(pred, "doc_id")
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("label_total",
        sum(col("n")).over(Window.partitionBy("lang")))
      .select(col("lang"), col("pred_lang"), col("n"),
        graft.rel.Queries.femit(col("n").cast("double") / col("label_total").cast("double"))
          .as("recall"))
      .orderBy("lang", "pred_lang")
  }

  /** Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the
    * top-K vocabulary — the corpus-health scalar every data-curation
    * report carries (natural text slopes ≈ −1; a slope far off flags
    * boilerplate floods or synthetic junk). The corpus reduces to
    * (token, count) in one hash-agg, the top-K survives via
    * TakeOrderedAndProject (count DESC, token ASC — total order), and
    * the rank window + OLS reduction run on K rows only. ln on exact
    * integers is bit-identical across engines (the q181/q191
    * precedent); the ΣX/ΣY/ΣXY/ΣX² reductions ride the DECIMAL dsum
    * route so accumulation order cannot split them. */
  def zipfSlope(docs: DataFrame, topK: Int = 1000): DataFrame = {
    val dsum = graft.rel.Queries.dsum _
    val top = docs
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(topK)
    val xy = top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok").asc)).cast("long"))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
    xy.agg(count(lit(1)).as("k"), dsum(col("x")).as("sx"),
        dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
        dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y") * col("y")).as("syy"))
      .select(col("k"),
        graft.rel.Queries.femit((col("k") * col("sxy") - col("sx") * col("sy"))
          / (col("k") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        graft.rel.Queries.femit(
          (col("sy") - (col("k") * col("sxy") - col("sx") * col("sy"))
          / (col("k") * col("sxx") - col("sx") * col("sx")) * col("sx"))
          / col("k")).as("intercept"),
        graft.rel.Queries.femit((col("k") * col("sxy") - col("sx") * col("sy"))
          * (col("k") * col("sxy") - col("sx") * col("sy"))
          / ((col("k") * col("sxx") - col("sx") * col("sx"))
            * (col("k") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** Heaps'-law vocabulary-growth curve and exponent (Heaps 1978;
    * V(n) = K·n^β): stream the corpus in doc_id order, checkpoint the
    * running (token count, distinct-vocabulary size) every `every`
    * docs, and fit ln V = ln K + β·ln n by OLS over the checkpoints.
    * The curve is the standard corpus-health diagnostic — a crawl
    * whose β drifts up is accumulating junk tokens (boilerplate IDs,
    * mojibake); one whose β collapses is duplicating itself.
    *
    * The cumulative-distinct trick: a token's contribution to the
    * vocabulary happens exactly once, at min(doc_id) containing it —
    * so running vocab is a prefix sum of per-doc NEW-token counts, one
    * hash-agg plus one window, never a running set. Checkpoint
    * counters are exact longs; only the final ln-moments ride the
    * DECIMAL lattice (the q205 zipf-fit route).
    *
    * Scale: the first-occurrence agg and the per-doc join are
    * map-side-partial hash-aggs / equi-joins. The running rank/token/
    * vocab prefix sums are the TWO-PHASE distributed form (the q166
    * range-cell discipline; VERDICT r10 item 1 retired the former
    * single-partition Window.orderBy(doc_id) here): docs land in
    * fixed 4096-wide doc_id range cells, the within-cell prefix sums
    * are cell-local windows (parallel across cells), and the
    * cross-cell offsets come from an O(cells) cell-totals table whose
    * own prefix window is the only single-partition one — at 10⁹ docs
    * that table is ~250k skinny rows, megabytes. The fit stays a
    * broadcast 1-row combine. PlanSpec pins the no-corpus-grain-
    * global-window shape. */
  def heapsLaw(docs: DataFrame, every: Int = 50): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val newTok = tok.groupBy("tok").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("nv"))
    val perDoc = docs.select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("ntk"))
      .join(newTok, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ntk"),
        coalesce(col("nv"), lit(0L)).as("nv"))
    // Two-phase prefix sums: cell-local windows + an O(cells) offset
    // table. rank/cum_tokens/vocab reproduce the retired global
    // window's longs exactly (offset + within-cell running value).
    val celled = perDoc.withColumn("cell", expr("doc_id div 4096"))
    val inCell = Window.partitionBy("cell").orderBy(col("doc_id").asc)
    val cwl = inCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preCell = Window.orderBy(col("cell").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellTotals = celled.groupBy("cell")
      .agg(count(lit(1)).as("c_n"), sum(col("ntk")).as("c_tk"),
        sum(col("nv")).as("c_nv"))
      .withColumn("off_n", coalesce(sum(col("c_n")).over(preCell), lit(0L)))
      .withColumn("off_tk", coalesce(sum(col("c_tk")).over(preCell), lit(0L)))
      .withColumn("off_nv", coalesce(sum(col("c_nv")).over(preCell), lit(0L)))
      .withColumn("total_n", sum(col("c_n")).over(Window.partitionBy()))
      .select("cell", "off_n", "off_tk", "off_nv", "total_n")
    val cum = celled
      .withColumn("rn_in", row_number().over(inCell).cast("long"))
      .withColumn("ctk_in", sum(col("ntk")).over(cwl))
      .withColumn("cvb_in", sum(col("nv")).over(cwl))
      .join(broadcast(cellTotals), "cell")
      .select((col("off_n") + col("rn_in")).as("rank"),
        (col("off_tk") + col("ctk_in")).as("cum_tokens"),
        (col("off_nv") + col("cvb_in")).as("vocab"),
        col("total_n").as("last"))
    val cp = cum
      .where((col("rank") % every === 0 || col("rank") === col("last"))
        && col("cum_tokens") > 0 && col("vocab") > 0)
      .select(col("rank").as("ckpt"), col("cum_tokens"), col("vocab"))
    val dsum = graft.rel.Queries.dsum _
    val xy = cp.select(col("ckpt"), col("cum_tokens"), col("vocab"),
      log(col("cum_tokens").cast("double")).as("x"),
      log(col("vocab").cast("double")).as("y"))
    val fit = xy.agg(count(lit(1)).as("k"), dsum(col("x")).as("sx"),
      dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
      dsum(col("x") * col("x")).as("sxx"))
    // OLS degenerate-input guard (ADVICE r8): a corpus smaller than
    // `every` docs leaves ONE surviving checkpoint, where k·sxx − sx²
    // is exactly 0 and the fit is undefined — emit NULL beta/ln_k
    // (mirrored CASE in the oracle) instead of ±Inf/NaN.
    val den = col("k") * col("sxx") - col("sx") * col("sx")
    val beta = (col("k") * col("sxy") - col("sx") * col("sy")) / den
    xy.crossJoin(broadcast(fit))
      .select(col("ckpt"), col("cum_tokens"), col("vocab"),
        graft.rel.Queries.femit(
          when(col("k") >= 2L && den =!= 0.0, beta)).as("beta"),
        graft.rel.Queries.femit(
          when(col("k") >= 2L && den =!= 0.0,
            (col("sy") - beta * col("sx")) / col("k"))).as("ln_k"))
      .orderBy("ckpt")
  }

  /** In-plan multinomial naive Bayes language classifier (Laplace
    * smoothing) — the classic counts-only text classifier, trained and
    * scored entirely as one declarative plan (the supervised sibling of
    * [[unigramLogProb]]'s LM and `linearScore`'s fixed-weight filter;
    * production curation pipelines train exactly this shape for cheap
    * doc-level routing, cf. Joulin et al., "Bag of Tricks for Efficient
    * Text Classification", EACL 2017 — fastText's count base).
    *
    * Train on even doc_ids, score odd ones (disjoint halves, no
    * leakage): per-class token counts + class totals + vocab size give
    * the smoothed conditionals ln((cnt+1)/(tot+V)); doc score per class
    * = Σ token conditionals + ln prior; prediction = argmax. Output is
    * the confusion matrix (true lang × predicted) with the exact-route
    * mean winning score.
    *
    * Cross-engine float discipline: every ln() is truncated to
    * DECIMAL(38,12) before accumulation (the q58 route), the prior
    * joins the same DECIMAL lattice, and the argmax orders by the
    * ROUNDED score with the class name as tiebreak — the verify-skill
    * top-K rule.
    *
    * Scale: two hash-aggs over the train token stream (token×class
    * counts, class totals — map-side partial); the conditional grid is
    * O(V·C) rows, equi-joined to the test token stream on `tok` (AQE
    * splits hot tokens); priors and V broadcast as 1-row/C-row sides;
    * the argmax is a C-row window per doc. Nothing is driver-side;
    * tokens unseen in training are dropped by the inner join (the
    * standard closed-vocabulary convention), which the oracle mirrors. */
  def naiveBayes(docs: DataFrame): DataFrame =
    naiveBayesPred(docs)
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"),
        graft.rel.Queries.femit(
          graft.rel.Queries.dsum(col("score")) / count(lit(1)))
          .as("avg_score"))
      .orderBy("lang", "pred")

  /** [[naiveBayes]]'s per-document prediction stage: (doc_id, lang,
    * pred, score) for every scored test doc — exposed so downstream
    * agreement/calibration operators (q309) can consume the raw
    * predictions instead of the confusion rollup. */
  def naiveBayesPred(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(toks(col("text"))).as("tok"))
    val train = tok.where(pmod(col("doc_id"), lit(2L)) === 0L)
    val test = tok.where(pmod(col("doc_id"), lit(2L)) === 1L)
    // Priors from the documents table itself (not the token stream —
    // a token-free doc still counts toward its class).
    val trainDocs = docs.where(pmod(col("doc_id"), lit(2L)) === 0L)
    val priors = trainDocs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_cls"))
    val nTrain = trainDocs.agg(count(lit(1)).as("n_train"))
    val tc = train.groupBy(col("lang").as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val classTot = tc.groupBy("cls").agg(sum(col("cnt")).as("tot"))
    val vocab = train.select("tok").distinct()
    val vsize = vocab.agg(count(lit(1)).as("v"))
    // Dense V×C conditional grid: every class scores every vocab token.
    val grid = vocab.crossJoin(broadcast(classTot))
      .join(tc, Seq("cls", "tok"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("cls"), col("tok"),
        log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0)
          / (col("tot") + col("v")).cast("double"))
          .cast("decimal(38,12)").as("logp"))
    val scored = test.join(grid, Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("logp")).as("sumlogp"))
      .join(broadcast(priors), Seq("cls"))
      .crossJoin(broadcast(nTrain))
      .select(col("doc_id"), col("lang"), col("cls"),
        graft.rel.Queries.femit((col("sumlogp")
          + log(col("n_cls").cast("double") / col("n_train").cast("double"))
            .cast("decimal(38,12)")).cast("double")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred"),
        col("score"))
  }

  /** Cohen's κ agreement (Cohen 1960) between the library's two
    * language classifiers on the shared test half: the stopword-vote
    * heuristic ([[langId]]) vs the trained naive Bayes
    * ([[naiveBayesPred]]) — the inter-annotator metric every labeling
    * pipeline reports before trusting auto-labels. κ = (p_o − p_e) /
    * (1 − p_e) with chance agreement p_e from the marginal products;
    * all counts exact, two closing divisions. Scale: two classifier
    * plans joined on doc_id plus two C-row marginal aggs. */
  def cohensKappa(docs: DataFrame): DataFrame = {
    val nb = naiveBayesPred(docs).select(col("doc_id"),
      col("pred").as("p_nb"))
    val li = langId(docs)
      .where(pmod(col("doc_id"), lit(2L)) === 1L)
      .select(col("doc_id"), col("pred_lang").as("p_li"))
    val j = nb.join(li, "doc_id")
    val tot = j.agg(count(lit(1)).as("n"),
      sum(when(col("p_nb") === col("p_li"), 1L).otherwise(0L)).as("agree"))
    val rt = j.groupBy(col("p_nb").as("cls")).agg(count(lit(1)).as("rt"))
    val ct = j.groupBy(col("p_li").as("cls")).agg(count(lit(1)).as("ct"))
    val chance = rt.join(ct, Seq("cls"), "full_outer")
      .select((coalesce(col("rt"), lit(0L))
        * coalesce(col("ct"), lit(0L))).as("prod"))
      .agg(sum(col("prod")).as("sprod"))
    tot.crossJoin(chance)
      .select(col("n"), col("agree"),
        graft.rel.Queries.femit(col("agree").cast("double") / col("n")).as("po"),
        graft.rel.Queries.femit(col("sprod").cast("double") / (col("n") * col("n")))
          .as("pe"),
        graft.rel.Queries.femit((col("agree").cast("double") / col("n")
          - col("sprod").cast("double") / (col("n") * col("n")))
          / (lit(1.0) - col("sprod").cast("double")
            / (col("n") * col("n")))).as("kappa"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS algorithm): hash every k-token k-gram, slide a
    * window of `w` consecutive hashes, keep the RIGHTMOST minimum of
    * each window, and dedupe the selected (position, hash) pairs. The
    * guarantee that makes it the plagiarism/near-dup standard: any
    * shared substring of ≥ w+k−1 tokens yields at least one shared
    * fingerprint, while only ~2/(w+1) of the k-grams are kept.
    *
    * Layout: per (doc, k-gram position j, FNV hash h), each j is
    * exploded into the ≤ w windows containing it (windows start at
    * i ∈ [0, max(0, nk−w)]; a short doc gets the single window that
    * covers everything), the per-window rightmost-min is a
    * row_number over (h asc, j desc), and survivors dedupe on j.
    * Everything is integer/hash arithmetic — bit-portable, no float
    * discipline needed.
    *
    * Scale: k-gram hashing is a per-row codegen'd transform (no
    * self-join); the ≤ w× window explode is bounded fanout; the one
    * shuffle keys on (doc_id, window) — fingerprint selection is
    * embarrassingly parallel per document, exactly why winnowing is
    * the 100 TB fingerprinter. Output: (doc_id, n_kgrams, n_fps,
    * density). */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    val seed = graft.functions.Fnv1a32.Seed
    val kg = docs
      .select(col("doc_id"), toks(col("text")).as("ts"))
      .where(size(col("ts")) >= k)
      .select(col("doc_id"), (size(col("ts")) - lit(k - 1)).as("nk"),
        posexplode(expr(
          s"transform(sequence(1, size(ts) - ${k - 1}), " +
            s"p -> fnv1a32(concat_ws(' ', slice(ts, p, $k)), ${seed}L))")))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "h")
    // windows containing position j: i in [max(0, j-w+1), min(j, nk-w)]
    val lastStart = greatest(lit(0), col("nk") - lit(w))
    val windows = kg.select(col("doc_id"), col("nk"), col("j"), col("h"),
      explode(sequence(
        greatest(lit(0), col("j") - lit(w - 1)),
        least(col("j"), lastStart))).as("i"))
    val sel = windows
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id", "i")
          .orderBy(col("h").asc, col("j").desc)))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("nk"), col("j"), col("h")).distinct()
    sel.groupBy("doc_id")
      .agg(max(col("nk")).cast("long").as("n_kgrams"),
        count(lit(1)).as("n_fps"),
        min(col("h")).as("min_fp"))
      .withColumn("density",
        graft.rel.Queries.femit(col("n_fps").cast("double") / col("n_kgrams")))
      .orderBy("doc_id")
  }

  /** One-round decision-stump induction (the CART split search, depth
    * 1): over labelled points (x = n_chars, y = doc is English), find
    * the threshold minimizing weighted Gini impurity — the inner loop
    * of every tree/GBDT trainer, run as ONE declarative plan instead
    * of a driver-side sweep.
    *
    * The search is a cumulative-count trick: group points by distinct
    * x (candidate thresholds), running (count, positives) prefix sums
    * over the sorted distinct values give each split's left/right
    * class totals in one pass, and the Gini of every candidate is
    * plain arithmetic on those exact integers. Argmin orders by the
    * ROUNDED impurity with the threshold as tiebreak.
    *
    * Scale: one hash-agg to distinct values (map-side partial), one
    * sort over DISTINCT x (≪ rows — production pre-bins continuous
    * features exactly like this), totals broadcast; nothing driver-
    * side. All doubles derive from exact longs through an identical
    * expression tree on both engines. Bound on the single-partition
    * window: it runs over DISTINCT x only — n_chars has ≤ a few
    * thousand distinct values at any corpus size, and a production
    * run pre-bins continuous features to ≤ 255 cells (the LightGBM
    * convention), so the window input is KBs regardless of rows. */
  def decisionStump(docs: DataFrame): DataFrame = {
    val pts = docs.select(col("n_chars").as("x"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val byX = pts.groupBy("x")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val cw = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byX.select(col("x"),
      sum(col("n")).over(cw).as("ln"), sum(col("p")).over(cw).as("lp"))
    val tot = pts.agg(count(lit(1)).as("nn"), sum(col("y")).as("pp"))
    val cand = cum.crossJoin(broadcast(tot)).where(col("ln") < col("nn"))
    val lnd = col("ln").cast("double"); val lpd = col("lp").cast("double")
    val rnd = (col("nn") - col("ln")).cast("double")
    val rpd = (col("pp") - col("lp")).cast("double")
    val nnd = col("nn").cast("double"); val ppd = col("pp").cast("double")
    val gl = lit(1.0) - (lpd / lnd) * (lpd / lnd) -
      ((lnd - lpd) / lnd) * ((lnd - lpd) / lnd)
    val gr = lit(1.0) - (rpd / rnd) * (rpd / rnd) -
      ((rnd - rpd) / rnd) * ((rnd - rpd) / rnd)
    val wg = (lnd / nnd) * gl + (rnd / nnd) * gr
    val parent = lit(1.0) - (ppd / nnd) * (ppd / nnd) -
      ((nnd - ppd) / nnd) * ((nnd - ppd) / nnd)
    cand.select(col("x").as("threshold"),
      graft.rel.Queries.femit(wg).as("gini"), graft.rel.Queries.femit(parent - wg).as("gain"),
      col("ln").as("left_n"), col("lp").as("left_pos"),
      (col("nn") - col("ln")).as("right_n"),
      (col("pp") - col("lp")).as("right_pos"))
      .orderBy(col("gini").asc, col("threshold").asc)
      .limit(1)
  }

  /** Two-round discrete AdaBoost over decision stumps (Freund &amp;
    * Schapire 1997) — [[decisionStump]]'s single split search promoted
    * to ENSEMBLE training, still as declarative plans: each round
    * finds the (threshold, polarity) stump minimizing the WEIGHTED
    * 0/1 error via the same distinct-x prefix-sum sweep (weights
    * accumulate on the DECIMAL window lattice — window-sum association
    * is engine-specific for doubles, the q294 rule), sets
    * α = ½ln((1−ε)/ε), and reweights w ← exp(−α·y·h(x)) for the next
    * round (unnormalized — ε is a ratio, normalization cancels). Each
    * round's row reports the stump, its weighted error, α, and the
    * cumulative ensemble's training accuracy under the
    * score&gt;0 → +1 decision rule.
    *
    * Determinism: candidate sweep totals are exact decimal sums;
    * argmin orders by the ROUNDED error rate with (threshold,
    * polarity) tiebreaks — the q207 ranked-by-rounded rule; exp/ln
    * are the libm parity class; ε clamps to [1e−10, 1−1e−10] so a
    * perfect stump cannot produce ±Inf on either engine.
    *
    * Scale: per round, one hash-agg to distinct x (map-side partial),
    * a prefix window over DISTINCT values (≪ rows — the pre-binned
    * split search every production GBDT uses), a 1-row broadcast stump,
    * and one reweighting map. Rounds are unrolled (T=2), not a driver
    * loop over collected data. Bound on the single-partition window:
    * its input is the distinct-x table — bounded by the feature's
    * value domain, not the corpus; a production run pre-bins to
    * ≤ 255 cells (the GBDT histogram convention), keeping it KBs. */
  def adaBoost(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val pts = docs.select(col("n_chars").cast("long").as("x"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      .localCheckpoint() // feeds both rounds' sweeps + both accuracy maps
    val cw = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // weighted stump search: 1 row (thr, pol, erate) minimizing the
    // weighted error of [x <= thr -> pol, else -pol]
    def stump(w: Column): DataFrame = {
      val p = pts.withColumn("w", w)
      val byX = p.groupBy("x").agg(
        sum(when(col("y") === 1, col("w")).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("wp"),
        sum(when(col("y") === -1, col("w")).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("wn"),
        count(lit(1)).as("n"))
      val cum = byX.select(col("x"),
        sum(col("wp")).over(cw).cast("double").as("lwp"),
        sum(col("wn")).over(cw).cast("double").as("lwn"),
        sum(col("n")).over(cw).as("ln"))
      val tot = byX.agg(sum(col("wp")).cast("double").as("twp"),
        sum(col("wn")).cast("double").as("twn"), sum(col("n")).as("nn"))
      val cand = cum.crossJoin(broadcast(tot)).where(col("ln") < col("nn"))
      val epos = col("lwn") + (col("twp") - col("lwp"))
      val eneg = col("lwp") + (col("twn") - col("lwn"))
      val tw = col("twp") + col("twn")
      cand.select(col("x").as("thr"),
        when(epos <= eneg, lit(1L)).otherwise(lit(-1L)).as("pol"),
        femit(when(epos <= eneg, epos).otherwise(eneg) / tw).as("erate"))
        .orderBy(col("erate").asc, col("thr").asc, col("pol").desc)
        .limit(1)
    }
    def alpha(erate: Column): Column = {
      val r = least(greatest(erate, lit(1e-10)), lit(1.0 - 1e-10))
      lit(0.5) * log((lit(1.0) - r) / r)
    }
    def h(thr: Column, pol: Column): Column =
      when(col("x") <= thr, pol).otherwise(-pol)
    // round 1: uniform weights
    val s1 = stump(lit(1.0))
      .select(col("thr").as("thr1"), col("pol").as("pol1"),
        col("erate").as("er1"))
    // round 2: w = exp(-alpha1 * y * h1(x))
    val w2 = { // pts crossJoin s1 carries thr1/pol1 into the lambda
      val a1 = alpha(col("er1"))
      exp(-a1 * (col("y") * h(col("thr1"), col("pol1"))).cast("double"))
    }
    val pts1 = pts.crossJoin(broadcast(s1))
    val s2 = {
      val p = pts1.withColumn("w", w2)
      val byX = p.groupBy("x").agg(
        sum(when(col("y") === 1, col("w")).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("wp"),
        sum(when(col("y") === -1, col("w")).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("wn"),
        count(lit(1)).as("n"))
      val cum = byX.select(col("x"),
        sum(col("wp")).over(cw).cast("double").as("lwp"),
        sum(col("wn")).over(cw).cast("double").as("lwn"),
        sum(col("n")).over(cw).as("ln"))
      val tot = byX.agg(sum(col("wp")).cast("double").as("twp"),
        sum(col("wn")).cast("double").as("twn"), sum(col("n")).as("nn"))
      val cand = cum.crossJoin(broadcast(tot)).where(col("ln") < col("nn"))
      val epos = col("lwn") + (col("twp") - col("lwp"))
      val eneg = col("lwp") + (col("twn") - col("lwn"))
      val tw = col("twp") + col("twn")
      cand.select(col("x").as("thr2"),
        when(epos <= eneg, lit(1L)).otherwise(lit(-1L)).as("pol2"),
        femit(when(epos <= eneg, epos).otherwise(eneg) / tw).as("er2"))
        .orderBy(col("er2").asc, col("thr2").asc, col("pol2").desc)
        .limit(1)
    }
    // cumulative ensemble accuracy after each round (score>0 -> +1)
    val both = pts.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
    val a1 = alpha(col("er1")); val a2 = alpha(col("er2"))
    val sc1 = a1 * h(col("thr1"), col("pol1")).cast("double")
    val sc2 = sc1 + a2 * h(col("thr2"), col("pol2")).cast("double")
    def accOf(score: Column): Column =
      dsum(when((score > 0.0) === (col("y") === 1), 1.0).otherwise(0.0))
        .cast("double") / count(lit(1)).cast("double")
    val acc = both.agg(accOf(sc1).as("acc1"), accOf(sc2).as("acc2"),
      first(col("thr1")).as("thr1"), first(col("pol1")).as("pol1"),
      first(col("er1")).as("er1"), first(col("thr2")).as("thr2"),
      first(col("pol2")).as("pol2"), first(col("er2")).as("er2"))
    val r1 = acc.select(lit(1L).as("round"), col("thr1").as("threshold"),
      col("pol1").as("polarity"), col("er1").as("err_rate"),
      femit(alpha(col("er1"))).as("alpha"), femit(col("acc1")).as("ens_acc"))
    val r2 = acc.select(lit(2L).as("round"), col("thr2").as("threshold"),
      col("pol2").as("polarity"), col("er2").as("err_rate"),
      femit(alpha(col("er2"))).as("alpha"), femit(col("acc2")).as("ens_acc"))
    r1.unionAll(r2).orderBy("round")
  }

  /** CCNet-style perplexity filtering census (Wenzek et al., LREC 2020
    * filter low-quality web text by LM perplexity): score every doc
    * with the in-corpus add-one bigram LM ([[bigramLogProb]]'s exact
    * pipeline, UNROUNDED per-doc average), ppl = exp(−avg_logp), and
    * report per language how the corpus-mean-ppl threshold would cut:
    * docs scored, docs unscoreable (&lt; 2 tokens — no bigram evidence),
    * docs kept (ppl ≤ corpus mean), per-language mean/min/max ppl, and
    * the threshold itself.
    *
    * Determinism: per-doc avg_logp is DECIMAL-dsum / exact count;
    * exp/ln are the libm parity class; the corpus-mean threshold is a
    * dsum ratio, so the keep comparison is bit-deterministic on both
    * engines; min/max of bit-identical doubles are safe; every emitted
    * float rides femit.
    *
    * Scale: the LM is two map-side-combined hash-aggs the q120 family
    * already pays; per-doc scores localCheckpoint once and feed the
    * threshold + census + unscored probe; the threshold is ONE
    * broadcast row. */
  def perplexityFilter(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val base = docs.select(col("doc_id"), toks(col("text")).as("ts"))
    val prs = base.select(col("doc_id"), explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1, try_element_at(ts, i + 2) AS w2)), " +
          "p -> p.w2 IS NOT NULL)")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = prs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val left = prs.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = base.select(explode(col("ts")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val perDoc = prs.join(bi, Seq("w1", "w2")).join(left, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((col("cb") + 1).cast("double") /
          (col("cu") + col("v")).cast("double")).as("logp"))
      .groupBy("doc_id")
      .agg((dsum(col("logp")) / count(lit(1))).as("avg_logp"))
      .select(col("doc_id"), exp(-col("avg_logp")).as("ppl"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .localCheckpoint() // feeds the threshold, the census, the anti-join
    val thr = perDoc.agg((dsum(col("ppl")) / count(lit(1))).as("mean_ppl"))
    val census = perDoc.crossJoin(broadcast(thr))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("ppl") <= col("mean_ppl"), 1L).otherwise(0L))
          .as("n_keep"),
        femit(dsum(col("ppl")) / count(lit(1))).as("lang_mean_ppl"),
        femit(min(col("ppl"))).as("min_ppl"),
        femit(max(col("ppl"))).as("max_ppl"),
        femit(min(col("mean_ppl"))).as("corpus_mean_ppl"))
    val unscored = docs.select(col("doc_id"), col("lang"))
      .join(perDoc.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).as("n_unscored"))
    census.join(unscored, Seq("lang"), "left")
      .select(col("lang"), col("n_scored"),
        coalesce(col("n_unscored"), lit(0L)).as("n_unscored"),
        col("n_keep"), col("lang_mean_ppl"), col("min_ppl"),
        col("max_ppl"), col("corpus_mean_ppl"))
      .orderBy("lang")
  }

  /** Mutual-information feature ranking (the filter-method feature
    * selection step before training a quality/language classifier —
    * Battiti's MIFS line, IEEE TNN 1994): for each candidate feature,
    * I(X;Y) = Σ_{x,y} p(x,y)·ln(p(x,y)/(p(x)p(y))) against the binary
    * label y = [lang = 'en'], from EXACT contingency counts. Features
    * are the curation standbys: source, length bucket (n_chars DIV
    * 200), token-count bucket (DIV 50), has-digit flag.
    *
    * Determinism: every probability is a ratio of exact BIGINT counts;
    * each cell's term is one fixed-order IEEE expression (ln is the
    * libm parity class); per-feature sums ride the DECIMAL dsum
    * lattice; ranking orders by the ROUNDED MI with the feature name
    * as tiebreak (the q207 rule). A cell with c ≥ 1 has a strictly
    * positive log argument, so no NaN path exists.
    *
    * Scale: ONE corpus scan fans out to 4 (feature, level) rows per
    * doc via stack (no join, no shuffle before aggregation); the
    * contingency table is a map-side-combined hash-agg on (feature,
    * level, y) — thousands of cells regardless of corpus size; the
    * label marginal and N broadcast. */
  def miFeatureRank(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val f = docs.select(
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      coalesce(col("source"), lit("__null__")).as("f_source"),
      expr("CAST(n_chars DIV 200 AS STRING)").as("f_len"),
      expr("CAST(size(filter(split(text, ' '), t -> t <> '')) DIV 50 AS STRING)")
        .as("f_tok"),
      when(col("text").rlike("[0-9]"), "y").otherwise("n").as("f_digit"))
    val lv = f.selectExpr("y",
      "stack(4, 'source', f_source, 'len_bucket', f_len, " +
        "'tok_bucket', f_tok, 'has_digit', f_digit) AS (feature, level)")
    val cells = lv.groupBy("feature", "level", "y")
      .agg(count(lit(1)).as("c"))
    val flm = cells.groupBy("feature", "level").agg(sum(col("c")).as("cl"))
    val ym = f.groupBy("y").agg(count(lit(1)).as("cy"))
    val n = f.agg(count(lit(1)).as("nn"))
    val term = cells.join(flm, Seq("feature", "level"))
      .join(broadcast(ym), "y").crossJoin(broadcast(n))
      .select(col("feature"), col("level"),
        ((col("c").cast("double") / col("nn").cast("double")) *
          log((col("c").cast("double") * col("nn").cast("double")) /
            (col("cl").cast("double") * col("cy").cast("double"))))
          .as("term"))
    val mi = term.groupBy("feature")
      .agg(countDistinct(col("level")).as("n_levels"),
        dsum(col("term")).as("mi0"))
      .select(col("feature"), col("n_levels"), femit(col("mi0")).as("mi"))
    val byMi = Window.orderBy(col("mi").desc, col("feature").asc)
    mi.withColumn("rank", row_number().over(byMi).cast("long"))
      .select("rank", "feature", "n_levels", "mi")
      .orderBy("rank")
  }

  /** Rank-biased overlap between two token rankings (Webber, Moffat
    * &amp; Zobel, TOIS 2010 — the top-weighted rank-similarity metric IR
    * evaluation uses where Kendall's τ (q273) weights all depths
    * equally): ranking A orders tokens by DOCUMENT frequency, ranking
    * B by COLLECTION frequency (the classic df-vs-cf diagnostic — they
    * diverge exactly where burstiness lives). For each depth d ≤ k,
    * the prefix agreement A_d = |A_1:d ∩ B_1:d| / d enters with
    * geometric weight p^(d−1); the emitted per-depth rows carry
    * overlap, agreement, weight, and contribution, and the TOTAL row's
    * `rbo` is the truncated lower bound (1−p)·Σ A_d·p^(d−1) (RBO_min
    * without the extrapolation tail — documented choice, deterministic).
    *
    * Determinism: both rankings order by exact integer counts with the
    * token as tiebreak; prefix intersections are exact integers over
    * the joined top-k lists; p^(d−1) is exp(ln(p)·(d−1)) on both
    * engines (exp/ln libm parity, and d=1 gives exactly 1.0);
    * contributions sum through dsum.
    *
    * Scale: two map-side-combined token aggregates (the shuffles the
    * term-frequency family already pays), two top-k TakeOrdered heads,
    * then all RBO algebra runs on ≤ k² joined rows. */
  def rboRankings(docs: DataFrame, k: Int = 20,
                  p: Double = 0.9): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val dfRank = tok.groupBy("t").agg(countDistinct(col("doc_id")).as("m"))
      .orderBy(col("m").desc, col("t").asc).limit(k)
      .select(col("t"), row_number().over(
        Window.orderBy(col("m").desc, col("t").asc)).as("ra"))
    val cfRank = tok.groupBy("t").agg(count(lit(1)).as("m"))
      .orderBy(col("m").desc, col("t").asc).limit(k)
      .select(col("t"), row_number().over(
        Window.orderBy(col("m").desc, col("t").asc)).as("rb"))
    val both = dfRank.join(cfRank, "t")
      .select(col("ra"), col("rb")).localCheckpoint() // ≤ k rows
    val depths = docs.sparkSession.range(1, k + 1).toDF("d")
    val w = exp(log(lit(p)) * (col("d") - 1).cast("double"))
    val perDepth = depths.crossJoin(broadcast(both))
      .groupBy("d")
      .agg(sum(when(col("ra") <= col("d") && col("rb") <= col("d"), 1L)
        .otherwise(0L)).as("overlap"))
      .select(col("d").as("depth"), col("overlap"),
        (col("overlap").cast("double") / col("d").cast("double"))
          .as("agree0"),
        w.as("w0"))
      .localCheckpoint() // k rows; feeds the rows AND the total
    val rows = perDepth.select(col("depth"), col("overlap"),
      femit(col("agree0")).as("agreement"), femit(col("w0")).as("weight"),
      femit(col("agree0") * col("w0")).as("contrib"),
      lit(null).cast("double").as("rbo"))
    val total = perDepth.agg(
      dsum(col("agree0") * col("w0")).as("s"),
      max(col("overlap")).as("overlap")) // prefix overlap is monotone: max = |A∩B| at depth k
      .select(lit(0L).as("depth"), col("overlap"),
        lit(null).cast("double").as("agreement"),
        lit(null).cast("double").as("weight"),
        lit(null).cast("double").as("contrib"),
        // (1-p) as an IN-PLAN double subtraction: DuckDB's bare
        // 1.0 - 0.9 runs in DECIMAL and yields exactly 0.1, a
        // different double than IEEE 1.0-0.9 — both sides must
        // subtract in DOUBLE (the q319 boundary-arithmetic gotcha)
        femit((lit(1.0) - lit(p)) * col("s")).as("rbo"))
    rows.unionAll(total).orderBy("depth")
  }

  /** Jelinek–Mercer interpolation sweep with held-out perplexity
    * (Jelinek &amp; Mercer 1980; the λ grid search Chen &amp; Goodman's
    * smoothing study runs): train bigram ML + add-one unigram models
    * on the `vec_id % 5 ≠ 0`-style train split (docs `doc_id % 5 ≠ 0`),
    * score every held-out bigram with
    * p_λ = λ·p_bi + (1−λ)·p_uni for λ ∈ {0.1 … 0.9}, and report each
    * λ's held-out perplexity with the argmin rank — in-plan
    * hyperparameter selection (the q337 cross-validation discipline
    * applied to LM smoothing). p_bi = c(w1,w2)/c(w1·) is 0 for unseen
    * contexts/bigrams; p_uni = (c(w2)+1)/(T+V) is add-one over the
    * TRAIN vocab, so OOV held-out tokens score (0+1)/(T+V) and the
    * mixture stays strictly positive for λ &lt; 1.
    *
    * Determinism: all probabilities are ratios of exact BIGINT counts
    * in one fixed order; λ = d/10 is the same IEEE division on both
    * engines, as is 1−λ (DuckDB's bare decimal literals would run the
    * subtraction in DECIMAL — both sides subtract in DOUBLE); ln/exp
    * are the libm parity class; per-λ sums ride dsum; rank orders by
    * the ROUNDED perplexity with λ as tiebreak (the q207 rule).
    *
    * Scale: train counts are the two hash-aggs the LM family pays;
    * the held-out pair table joins them once (skew-splittable
    * equi-joins) and the ×9 λ fan-out happens on the already-joined
    * row inside codegen — the aggregate is 9 cells. */
  def jmInterpolation(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val base = docs.select(col("doc_id"), toks(col("text")).as("ts"))
    def pairsOf(d: DataFrame) = d.select(col("doc_id"), explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1, try_element_at(ts, i + 2) AS w2)), " +
          "p -> p.w2 IS NOT NULL)")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val train = base.where(pmod(col("doc_id"), lit(5L)) =!= 0)
    val heldOut = base.where(pmod(col("doc_id"), lit(5L)) === 0)
    val tp = pairsOf(train)
    val bi = tp.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val lf = tp.groupBy("w1").agg(count(lit(1)).as("cu"))
    val uni = train.select(explode(col("ts")).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("cw"))
    val tot = train.select(explode(col("ts")).as("t"))
      .agg(count(lit(1)).as("tt"), countDistinct(col("t")).as("v"))
    val scored = pairsOf(heldOut)
      .join(bi, Seq("w1", "w2"), "left")
      .join(lf, Seq("w1"), "left")
      .join(uni, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(
        when(col("cu").isNull, lit(0.0))
          .otherwise(coalesce(col("cb"), lit(0L)).cast("double") /
            col("cu").cast("double")).as("p_bi"),
        ((coalesce(col("cw"), lit(0L)) + 1).cast("double") /
          (col("tt") + col("v")).cast("double")).as("p_uni"))
    val lams = docs.sparkSession.range(1, 10).toDF("d")
      .select((col("d").cast("double") / lit(10.0)).as("lam"))
    val perLam = scored.crossJoin(broadcast(lams))
      .select(col("lam"),
        log(col("lam") * col("p_bi") +
          (lit(1.0) - col("lam")) * col("p_uni")).as("logp"))
      .groupBy("lam")
      .agg(count(lit(1)).as("n_bigrams"),
        (dsum(col("logp")) / count(lit(1))).as("avg0"))
      .select(col("lam").as("lambda"), col("n_bigrams"),
        femit(col("avg0")).as("avg_logp"),
        femit(exp(-col("avg0"))).as("held_out_ppl"))
    val byPpl = Window.orderBy(col("held_out_ppl").asc, col("lambda").asc)
    perLam.withColumn("rank", row_number().over(byPpl).cast("long"))
      .select("lambda", "n_bigrams", "avg_logp", "held_out_ppl", "rank")
      .orderBy("lambda")
  }

  /** Interpolated Kneser–Ney bigram LM, evaluated as held-out
    * perplexity (Kneser &amp; Ney 1995; the Chen &amp; Goodman 1999
    * interpolated form with a fixed absolute discount D = 0.75 — the
    * smoothing every n-gram-era production LM shipped, and the one
    * q351's Jelinek–Mercer sweep is the baseline for: KN replaces JM's
    * raw-frequency unigram with the CONTINUATION distribution, fixing
    * the "Francisco problem" where a word frequent only inside one
    * bigram steals back-off mass).
    *
    * P(w2|w1) = max(c(w1w2)−D, 0)/c(w1)
    *          + D·N1+(w1·)/c(w1) · Pcont(w2), and for an unseen w1 the
    * whole mass backs off to Pcont. Pcont(w2) =
    * (N1+(·w2)+1)/(T+V) — the continuation-type distribution with the
    * q120 add-one floor (T = distinct train bigram types, V = train
    * vocab), so an OOV continuation never produces ln(0): the same
    * pragmatic floor every deployed KN carries.
    *
    * Same 5-fold split as q351 (train doc_id%5≠0, held-out %5=0), so
    * the two rows are directly comparable on the gate.
    *
    * Determinism: every count is an exact long; D is the literal 0.75;
    * each probability is one fixed-order IEEE chain off those longs;
    * ln is the q58 libm-parity class; the fold rides dsum.
    *
    * Scale: three train hash-aggs (bigrams, left contexts, continuation
    * types — all map-side partial) + one 1-row type/vocab census
    * broadcast; held-out pairs stream once through three equi-joins.
    * Nothing grows past the bigram-type table (vocab², sparse). */
  def knBigram(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val base = docs.select(col("doc_id"), toks(col("text")).as("ts"))
    def pairsOf(d: DataFrame) = d.select(col("doc_id"), explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1, try_element_at(ts, i + 2) AS w2)), " +
          "p -> p.w2 IS NOT NULL)")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val train = base.where(pmod(col("doc_id"), lit(5L)) =!= 0)
    val heldOut = base.where(pmod(col("doc_id"), lit(5L)) === 0)
    val tp = pairsOf(train)
    val bi = tp.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // feeds left/right type counts AND the census
    val left = bi.groupBy("w1")
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1w1"))
    val contRight = bi.groupBy("w2").agg(count(lit(1)).as("n1w2"))
    val census = bi.agg(count(lit(1)).as("tt"))
      .crossJoin(broadcast(train.select(explode(col("ts")).as("t"))
        .agg(countDistinct(col("t")).as("v"))))
    val d = lit(discount)
    val pcont = (coalesce(col("n1w2"), lit(0L)) + 1).cast("double") /
      (col("tt") + col("v")).cast("double")
    val p = when(col("cu").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("cb"), lit(0L)).cast("double") - d, lit(0.0))
          / col("cu").cast("double")
          + d * col("n1w1").cast("double") / col("cu").cast("double")
          * pcont)
    pairsOf(heldOut)
      .join(bi, Seq("w1", "w2"), "left")
      .join(left, Seq("w1"), "left")
      .join(contRight, Seq("w2"), "left")
      .crossJoin(broadcast(census))
      .select(log(p).as("logp"),
        when(col("cu").isNull, 1L).otherwise(0L).as("oov_w1"),
        when(col("cb").isNull, 1L).otherwise(0L).as("unseen_bi"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("oov_w1")).as("n_unseen_ctx"),
        sum(col("unseen_bi")).as("n_unseen_bigrams"),
        (dsum(col("logp")) / count(lit(1))).as("avg0"))
      .select(col("n_bigrams"), col("n_unseen_ctx"),
        col("n_unseen_bigrams"),
        femit(col("avg0")).as("avg_logp"),
        femit(exp(-col("avg0"))).as("held_out_ppl"))
  }

  /** RAKE keyphrase extraction (Rose et al., "Automatic Keyword
    * Extraction from Individual Documents", 2010): candidate phrases
    * are maximal stopword-free token runs (a fixed 10-word stop list —
    * RAKE's delimiter set is a parameter, not learned); each word
    * scores deg/freq where freq counts its occurrences inside
    * candidates and deg sums the lengths of the candidates containing
    * it; a phrase scores the sum of its words' scores; the corpus
    * keyphrases are the top-k distinct phrase texts by ROUNDED score
    * with the phrase as tiebreak (the q207 rule).
    *
    * Determinism: runs are delimited by an exact prefix count of
    * stopword flags (integer window); phrase text reassembles members
    * in position order via the sorted-struct collect (the q39
    * pattern — collect_list alone is order-nondeterministic);
    * deg/freq are exact integers; per-phrase word-score sums ride
    * dsum (order-free), and every occurrence of a phrase text scores
    * identically so min() selects deterministically.
    *
    * Scale: one token scan with a per-document prefix window, then
    * hash-aggs on (doc, run) and token — the same shuffles the
    * term-frequency family pays; the top-k is a TakeOrdered head. */
  def rakeKeyphrases(docs: DataFrame, k: Int = 20): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val stops = Seq("the", "of", "and", "a", "to", "in", "is", "on",
      "for", "with")
    val tok = docs.select(col("doc_id"),
      posexplode(toks(col("text"))).as(Seq("pos", "t")))
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mem = tok
      .withColumn("st", when(col("t").isin(stops: _*), 1L).otherwise(0L))
      .withColumn("run", sum(col("st")).over(wRun))
      .where(col("st") === 0)
      .select("doc_id", "run", "pos", "t")
      .localCheckpoint() // feeds the phrase, word-stat, and score aggs
    val ph = mem.groupBy("doc_id", "run")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("t")))),
        _.getField("t")), " ").as("phrase"),
        count(lit(1)).as("len"))
      .localCheckpoint() // feeds word degrees AND the final join
    val wst = mem.join(ph, Seq("doc_id", "run")).groupBy("t")
      .agg(count(lit(1)).as("wfreq"), sum(col("len")).as("deg"))
    val occ = mem.join(wst, "t")
      .groupBy("doc_id", "run")
      .agg(dsum(col("deg").cast("double") / col("wfreq").cast("double"))
        .as("sc"))
    ph.join(occ, Seq("doc_id", "run"))
      .groupBy("phrase")
      .agg(min(col("len")).as("n_words"), count(lit(1)).as("freq"),
        femit(min(col("sc"))).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(k)
      .select("phrase", "n_words", "freq", "score")
  }

  /** Vocabulary coverage curve: what share of the corpus token MASS a
    * frequency-truncated vocabulary of size V covers, at standard cut
    * points — the question a tokenizer designer asks before fixing a
    * vocab budget (the coverage criterion in SentencePiece-style vocab
    * sizing; complements q205's Zipf slope and q300's Heaps curve,
    * which describe the same distribution's shape rather than its
    * budget arithmetic). For each cut V: covered token occurrences,
    * coverage share, and the OOV rate a V-size vocab would induce.
    *
    * Determinism: the frequency ranking is exact integers with the
    * token tiebreak; cumulative mass is an integer window sum;
    * coverage is one IEEE division per cut.
    *
    * Scale: one token hash-agg (the term-frequency shuffle), one
    * rank window over the DISTINCT-token table (≪ corpus), and the
    * cut probe joins |cuts| rows. Bound on the single-partition
    * window: it ranks the VOCABULARY, not the corpus — production
    * vocab sizing cuts at 32k–64k types (and a df ≥ 2 prefilter
    * bounds the hapax tail), so the window input stays MBs at any
    * corpus size; past that, the q166 range-cell two-phase form
    * applies verbatim on the cnt axis. */
  def vocabCoverage(docs: DataFrame,
                    cuts: Seq[Int] = Seq(5, 10, 15, 20, 25)): DataFrame = {
    import graft.rel.Queries.femit
    val tf = docs.select(explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val wRank = Window.orderBy(col("cnt").desc, col("t").asc)
    val ranked = tf
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("cum", sum(col("cnt")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // distinct tokens; feeds totals AND every cut
    val tot = ranked.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_vocab"))
    val cutDf = docs.sparkSession.createDataFrame(
      cuts.map(c => Tuple1(c.toLong))).toDF("vocab_size")
    val atCut = cutDf.join(ranked, col("rnk") === col("vocab_size"), "left")
      .select(col("vocab_size"), col("cum"))
    atCut.crossJoin(broadcast(tot))
      .select(col("vocab_size"),
        coalesce(col("cum"), col("total")).as("covered"),
        col("total"), col("n_vocab"),
        femit(coalesce(col("cum"), col("total")).cast("double") /
          col("total").cast("double")).as("coverage"),
        femit((col("total") - coalesce(col("cum"), col("total")))
          .cast("double") / col("total").cast("double")).as("oov_rate"))
      .orderBy("vocab_size")
  }

  /** Per-source token-distribution divergence from the corpus: add-one
    * smoothed KL(source ‖ corpus) over the top-M corpus vocabulary —
    * the mixture diagnostic that flags WHICH slice of a blended corpus
    * is distributionally unusual (the per-subgroup companion of q181's
    * PSI, which monitors a scalar; Kullback–Leibler 1951). Restricting
    * to the top-M corpus tokens bounds the support identically on both
    * sides and keeps the sum over a fixed vocabulary.
    *
    * Determinism: all probabilities are add-one ratios of exact
    * BIGINT counts, re-normalized over the SAME M-cell support on both
    * sides (each side is a proper distribution, so KL ≥ 0 by Gibbs);
    * each term is one fixed-order IEEE expression (ln parity);
    * per-source sums ride dsum.
    *
    * Scale: one (source, token) hash-agg, a broadcast top-M
    * vocabulary, and the cross of |sources| × M cells — corpus-size
    * work is the one token scan. */
  def sourceKl(docs: DataFrame, m: Int = 25): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val tok = docs.select(col("source"), explode(toks(col("text"))).as("t"))
      .localCheckpoint() // feeds the global top-M AND the per-source counts
    val topM = tok.groupBy("t").agg(count(lit(1)).as("gc"))
      .orderBy(col("gc").desc, col("t").asc).limit(m)
      .localCheckpoint() // feeds the support cross, the join, and Σgc
    // both distributions are RE-NORMALIZED over the shared M-cell
    // support (Σ over support + M smoothing cells), so each is a
    // proper distribution and the KL is well-defined
    val gSup = topM.agg(sum(col("gc")).as("gsup"),
      count(lit(1)).as("msup"))
    val st = tok.join(broadcast(topM.select("t")), "t")
      .groupBy("source", "t").agg(count(lit(1)).as("sc"))
    val sSup = st.groupBy("source").agg(sum(col("sc")).as("ssup"))
    val support = sSup.crossJoin(broadcast(topM))
    val cells = support.join(st, Seq("source", "t"), "left")
      .crossJoin(broadcast(gSup))
      .select(col("source"), col("ssup"),
        ((coalesce(col("sc"), lit(0L)) + 1).cast("double") /
          (col("ssup") + col("msup")).cast("double")).as("ps"),
        ((col("gc") + 1).cast("double") /
          (col("gsup") + col("msup")).cast("double")).as("pg"))
    cells.groupBy("source")
      .agg(min(col("ssup")).as("n_tokens"),
        femit(dsum(col("ps") * log(col("ps") / col("pg")))).as("kl"))
      .orderBy(col("source"))
  }

  /** word2vec-style negative-sampling table with a derandomized draw
    * audit (Mikolov et al., NeurIPS 2013: unigram^0.75 — the
    * smoothed-unigram noise distribution every embedding trainer
    * builds): per token, weight = cnt^0.75 (as exp(0.75·ln cnt) —
    * the exp/ln libm parity route, not engine pow), cumulative
    * [lo, hi) ranges tiling [0, W) exactly (hi on the DECIMAL window
    * lattice — float window sums are association-hazardous, the q294
    * rule; lo = lag(hi) so adjacent ranges share the identical
    * double), and an audit of 10 000 fnv-derandomized draws mapped
    * through the table: the emitted empirical share converges on the
    * target share, making the table's correctness measurable, not
    * assumed.
    *
    * Scale: the table is vocab-sized (the window runs over DISTINCT
    * tokens); the draw audit NEVER broadcasts it (VERDICT r13 item 2 —
    * a 10⁸-token web vocabulary is gigabytes): each draw is routed to
    * its 2-char cell through the O(cells) BROADCAST cell-range table,
    * then equi-joined on `cell` against the vocab table with the
    * [lo, hi) range predicate as a post-join filter — the shuffle is
    * keyed by cell and carries only the 10k draws plus the vocab rows,
    * both sides at their natural grain. Cell ranges tile [0, W)
    * exactly (a cell's double bounds are the cast of the same DECIMAL
    * values its first token's lo and last token's hi cast from), so
    * cell routing preserves the per-token hit set bit-for-bit. The
    * cumulative ranges
    * ride the q300/q192 two-phase range-cell prefix sum (VERDICT r12
    * item 1): tokens land in 2-char-prefix cells (prefix ranges are
    * contiguous in binary string order, so cell order = token order),
    * the in-cell DECIMAL running sums shift by an O(cells) offset
    * table, and DECIMAL addition is exact, so the decomposition
    * reproduces the retired vocab-grain global window bit-for-bit —
    * no single task ever sorts or prefix-sums the full vocabulary. */
  def negativeSamplingTable(docs: DataFrame, power: Double = 0.75,
                            nDraws: Int = 10000): DataFrame = {
    import graft.rel.Queries.femit
    graft.functions.HashExprs.register(docs.sparkSession)
    val tf = docs.select(explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val celled = tf
      .withColumn("w", exp(lit(power) * log(col("cnt").cast("double"))))
      .withColumn("cell", substring(col("t"), 1, 2))
    val inCell = Window.partitionBy("cell").orderBy(col("t").asc)
    val cwl = inCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preCell = Window.orderBy(col("cell").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellTotals = celled.groupBy("cell")
      .agg(sum(col("w").cast("decimal(38,12)")).as("c_w"))
      .withColumn("off_w", coalesce(sum(col("c_w")).over(preCell),
        lit(0).cast("decimal(38,12)")))
      .select("cell", "c_w", "off_w")
      .localCheckpoint() // O(cells): vocab offsets AND the draw router
    val cum = celled
      .withColumn("hi_in", sum(col("w").cast("decimal(38,12)")).over(cwl))
      .join(broadcast(cellTotals.select("cell", "off_w")), "cell")
      .withColumn("hi", (col("off_w") + col("hi_in")).cast("double"))
      .withColumn("lo", coalesce(lag(col("hi"), 1).over(inCell),
        col("off_w").cast("double")))
      .select("cell", "t", "cnt", "w", "hi", "lo")
      .localCheckpoint() // vocab-sized; feeds the total, the join, the output
    val tot = cum.agg(max(col("hi")).as("wtot"))
    val draws = docs.sparkSession.range(0, nDraws).toDF("j")
      .select((graft.functions.HashExprs.fnv1a32(
        "concat(cast(j as string), ':neg')").cast("double") /
        lit(4294967296.0)).as("u0"))
      .crossJoin(broadcast(tot))
      .select((col("u0") * col("wtot")).as("u"))
    // Route each draw to its cell via the O(cells) range table (cell
    // bounds tile [0, W) exactly — see the scaladoc), then equi-join
    // on cell: the vocab table is SHUFFLED by cell, never broadcast.
    val cellRanges = cellTotals.select(col("cell"),
      col("off_w").cast("double").as("c_lo"),
      (col("off_w") + col("c_w")).cast("double").as("c_hi"))
    val hit = draws.join(broadcast(cellRanges),
        col("u") >= col("c_lo") && col("u") < col("c_hi"))
      .select("cell", "u")
      .join(cum.select("cell", "t", "lo", "hi"), Seq("cell"))
      .where(col("u") >= col("lo") && col("u") < col("hi"))
      .groupBy("t").agg(count(lit(1)).as("n_draws"))
    cum.crossJoin(broadcast(tot)).join(hit, Seq("t"), "left")
      .select(col("t"), col("cnt"), femit(col("w")).as("weight"),
        femit(col("w") / col("wtot")).as("target_share"),
        coalesce(col("n_draws"), lit(0L)).as("n_draws"),
        femit(coalesce(col("n_draws"), lit(0L)).cast("double") /
          lit(nDraws.toDouble)).as("emp_share"))
      .orderBy("t")
  }

  /** First-occurrence novelty curve: for each document, the share of
    * its distinct 3-gram shingles whose FIRST corpus occurrence (by
    * doc id — the ingestion order) is the document itself, aggregated
    * per id decile — the "how fast does new data stop being new"
    * curve a curriculum or crawl scheduler reads (the incremental
    * counterpart of q44's within-doc repetition and q111's
    * eval-overlap decontamination; first-occurrence attribution is
    * how memorization audits assign provenance). Later deciles
    * necessarily trend less novel as the shingle space saturates.
    *
    * Determinism: first occurrence = exact min(doc_id) per shingle;
    * per-doc novelty is a ratio of exact counts; decile means ride
    * dsum. The decile is doc_id ventile arithmetic on exact integers
    * (NTILE would tie-break engine-specifically; a value-based bucket
    * does not).
    *
    * Scale: one shingle explode + a min-aggregate keyed by shingle
    * (the dedup family's shuffle), joined back shingle-keyed — no
    * pairwise work; the curve is 10 cells. */
  def noveltyCurve(docs: DataFrame, nBuckets: Int = 10): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    graft.functions.TextExprs.register(docs.sparkSession)
    val sh = docs.select(col("doc_id"),
        explode(graft.functions.TextExprs.shingles("text", 3)).as("g"))
      .localCheckpoint() // feeds the first-occurrence agg AND the per-doc join
    val first = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    val perDoc = sh.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    perDoc
      .withColumn("bucket",
        expr(s"doc_id * $nBuckets DIV $maxId").cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_grams"),
        sum(col("n_novel")).as("n_novel"),
        femit(dsum(col("n_novel").cast("double") /
          col("n_grams").cast("double")) /
          count(lit(1)).cast("double")).as("mean_novelty"))
      .orderBy("bucket")
  }

  /** Hill tail-index estimator over the token-frequency distribution
    * (Hill, Annals of Statistics 1975): α̂ = k / Σᵢ ln(x_(i)/x_(k+1))
    * over the top-k order statistics — the MAXIMUM-LIKELIHOOD tail
    * exponent, where q205's Zipf slope fits the whole log-log line by
    * OLS; the two disagree exactly when the tail bends, which is the
    * diagnostic. Reported at several k (the standard Hill-plot
    * stability check, collapsed to a table).
    *
    * Determinism: order statistics come from the exact integer
    * frequency ranking with token tiebreaks; each ln ratio is one
    * fixed-order expression on exact integers; sums ride dsum.
    *
    * Scale: one term-frequency shuffle + a rank window over DISTINCT
    * tokens; each k-row is an aggregate over ≤ k ranked rows. */
  def hillTailIndex(docs: DataFrame,
                    ks: Seq[Int] = Seq(5, 10, 15, 20)): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val tf = docs.select(explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
    val wRank = Window.orderBy(col("cnt").desc, col("t").asc)
    val ranked = tf.withColumn("rnk", row_number().over(wRank))
      .localCheckpoint() // distinct tokens; feeds every k-row
    ks.map { k =>
      val xk1 = ranked.where(col("rnk") === k + 1)
        .select(col("cnt").as("xk1"))
      ranked.where(col("rnk") <= k)
        .crossJoin(broadcast(xk1))
        .agg(lit(k.toLong).as("k"),
          dsum(log(col("cnt").cast("double") / col("xk1").cast("double")))
            .as("lsum"))
        .select(col("k"),
          femit(col("lsum")).as("log_ratio_sum"),
          femit(lit(k.toDouble) / col("lsum")).as("hill_alpha"))
    }.reduce(_ unionAll _).orderBy("k")
  }

  /** Context-length planning ladder: at each candidate maximum
    * sequence length L, the token mass LOST to truncation (docs longer
    * than L) and the padding OVERHEAD of one-doc-per-sequence batching
    * (L − len for docs that fit) — the table every training run reads
    * before fixing max_seq_len (the planning-sweep companion of q39's
    * actual packing, which eliminates the padding this table prices).
    *
    * Determinism: token counts and all census numbers are exact
    * integers; the two shares are fixed-order divisions through femit.
    *
    * Scale: ONE corpus scan computes per-doc lengths; the ×|cuts|
    * fan-out happens on the length row inside codegen and aggregates
    * to |cuts| cells. */
  def contextLadder(docs: DataFrame,
                    cuts: Seq[Int] = Seq(32, 64, 128, 256)): DataFrame = {
    import graft.rel.Queries.femit
    val lens = docs.select(
      size(toks(col("text"))).cast("long").as("len"))
    val cutDf = docs.sparkSession.createDataFrame(
      cuts.map(c => Tuple1(c.toLong))).toDF("max_len")
    lens.crossJoin(broadcast(cutDf))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("total_tokens"),
        sum(when(col("len") > col("max_len"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum(when(col("len") > col("max_len"),
          col("len") - col("max_len")).otherwise(0L)).as("tokens_lost"),
        sum(when(col("len") <= col("max_len"),
          col("max_len") - col("len")).otherwise(0L)).as("padding_tokens"))
      .select(col("max_len"), col("n_docs"), col("total_tokens"),
        col("n_truncated"), col("tokens_lost"), col("padding_tokens"),
        femit(col("tokens_lost").cast("double") /
          col("total_tokens").cast("double")).as("truncation_share"),
        femit(col("padding_tokens").cast("double") /
          (col("n_docs") * col("max_len")).cast("double"))
          .as("padding_share"))
      .orderBy("max_len")
  }

  /** Rolling-hash document fingerprint: per-token code
    * (ascii(first char)·31 + length), folded left with h = (h·1000003 +
    * code) mod (2^31−1). Stays in positive BIGINT range throughout —
    * portable integer arithmetic on both engines. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val codes = transform(toks(col("text")),
      t => (ascii(t) * lit(31) + length(t)).cast("long"))
    docs.select(col("doc_id"),
      aggregate(codes, lit(0L),
        (acc, c) => (acc * lit(1000003L) + c) % lit(2147483647L)).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Per-language tokenizer-fertility report under a GPT-2-style
    * pretokenizer (space-prefixed letter runs | digit runs | symbol
    * runs — the regex is the RE2∩Java-regex subset of GPT-2's pattern,
    * lookahead-free so both engines split identically). This is the
    * corpus survey a tokenizer-training run does FIRST: how many
    * pretokens a candidate vocabulary must cover per language, and the
    * upper bound on compression (chars/pretoken — BPE merges only ever
    * coarsen pretokens, never cross them). Complements q23 (per-doc
    * counts) with the per-language planning aggregate.
    *
    * Scale: one narrow codegen'd projection per document (regex runs
    * per-row, no shuffle) into a |langs|-row hash-agg with map-side
    * partials. No UDF, no driver loop. */
  def pretokenFertility(docs: DataFrame): DataFrame = {
    val pretoks = expr(
      "regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+', 0)")
    val perDoc = docs.select(col("lang"),
      size(pretoks).cast("long").as("np"),
      length(col("text")).cast("long").as("nc"),
      size(toks(col("text"))).cast("long").as("nw"))
    val f = graft.rel.Queries.femit _
    perDoc.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("np")).as("n_pretokens"),
        sum(col("nc")).as("n_chars"),
        sum(col("nw")).as("n_words"))
      .select(col("lang"), col("n_docs"), col("n_pretokens"),
        col("n_chars"), col("n_words"),
        f(col("n_chars").cast("double") / col("n_pretokens"))
          .as("chars_per_pretoken"),
        f(col("n_pretokens").cast("double") / col("n_words"))
          .as("pretokens_per_word"))
      .orderBy("lang")
  }

  /** Empirical-Bayes shrinkage of per-(lang, source) quality rates via
    * a beta-binomial method-of-moments fit (Morris 1983 parametric EB):
    * each group's raw rate k/n (k = docs with ≥ `minChars` chars) is
    * shrunk toward the corpus prior Beta(α̂, β̂) as (k+α̂)/(n+α̂+β̂).
    * This is how a curation pipeline scores SMALL sources honestly — a
    * 3-doc source with 3 hits shouldn't outrank a 200-doc source at
    * 0.9 — and the same machinery prices per-domain dedup/toxicity
    * rates. MoM: with m = mean(rate), v = var(rate) across groups,
    * α̂+β̂ = m(1−m)/v − 1 (guarded: v = 0 or v ≥ m(1−m) emits NULL —
    * no overdispersion signal to fit, the [[gmmEmOn]] edge-guard
    * convention).
    *
    * Scale: one hash-agg to the group table (|langs|·|sources| rows),
    * one 1-row moment aggregate broadcast back — the group table never
    * re-shuffles. Rates and moments accumulate on the exact DECIMAL
    * lattice so both engines fit identical α̂, β̂. */
  def betaBinomialQuality(docs: DataFrame, minChars: Long = 200L): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val g = docs.groupBy("lang", "source").agg(
      count(lit(1)).as("n"),
      sum(when(col("n_chars") >= minChars, 1L).otherwise(0L)).as("k"))
    val gr = g.withColumn("p", col("k").cast("double") / col("n"))
    val mom = gr.agg(count(lit(1)).as("ng"),
        dsum(col("p")).as("sp"), dsum(col("p") * col("p")).as("spp"))
      .select(col("ng"), (col("sp") / col("ng")).as("m"),
        ((col("spp") - col("sp") * col("sp") / col("ng"))
          / (col("ng") - lit(1.0))).as("v"))
    val joined = gr.crossJoin(broadcast(mom))
    val ok = col("ng") > 1L && col("v") > 0.0 &&
      col("v") < col("m") * (lit(1.0) - col("m"))
    val common = col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)
    val alpha = col("m") * common
    val beta = (lit(1.0) - col("m")) * common
    joined.select(col("lang"), col("source"), col("n"), col("k"),
        femit(col("p")).as("raw_rate"),
        femit(when(ok, (col("k") + alpha) / (col("n") + alpha + beta)))
          .as("shrunk_rate"),
        femit(when(ok, alpha)).as("alpha"),
        femit(when(ok, beta)).as("beta"))
      .orderBy("lang", "source")
  }

  /** K-minimum-values distinct-count sketch per source, PLUS the merged
    * corpus sketch (Bar-Yossef et al. 2002, "Counting distinct elements
    * in a data stream"; the KMV/bottom-k form): hash every distinct
    * 3-token shingle to the 32-bit FNV lattice, keep the `kMin`
    * smallest hashes per source, and estimate
    * |distinct| = (k−1)·2³² / h₍ₖ₎. The MERGE
    * property is the point at 100 TB: the global sketch is just the
    * kMin smallest of the UNION of the per-source sketches (≤ k·|S|
    * rows — driver-scale), so per-shard sketches combine without
    * re-touching the data, the property Spark's own HLL (q30) shares
    * but KMV keeps fully inspectable and EXACTLY reproducible (the
    * keyed FNV hash makes the sketch an oracle-checkable value, not an
    * opaque binary). Each row carries the exact distinct count next to
    * the estimate — the gate pins the estimator's arithmetic, the
    * error column is honest output. Undersized groups (< kMin distinct
    * hashes) emit NULL estimate (the sketch is exact there; consumers
    * read n_exact).
    *
    * Scale: one (source, tok) distinct shuffle, a keyed rank window on
    * the per-source distinct-hash table, and the union-merge over
    * ≤ k·|S| rows. No global window, no collect. */
  /** The distinct (source, shingle-hash) table behind [[kmvSketch]] —
    * sketch the 3-token SHINGLE space, not the raw vocabulary: the
    * synthetic corpus draws from ~31 word types (a k=64 sketch would
    * never activate), and shingle-space size is the statistic the
    * dedup planners (q323's histogram, bucket sizing) actually need. */
  private def kmvHashes(docs: DataFrame): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    graft.functions.TextExprs.register(docs.sparkSession)
    docs.select(col("source"),
        explode(graft.functions.TextExprs.shingles("text", 3)).as("tok"))
      .distinct()
      .select(col("source"), graft.functions.HashExprs.fnv1a32("tok").as("h"))
      .distinct() // hash collisions fold, both engines identically
  }

  /** Per-source bottom-`kMin` sketch ROWS (source, h, rn) — the
    * persistable representation a sketch STORE keeps per shard (see
    * the q333 merge lifecycle). */
  def kmvRows(docs: DataFrame, kMin: Int = 64): DataFrame = {
    val wRank = Window.partitionBy("source").orderBy(col("h").asc)
    kmvHashes(docs).withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= kMin)
  }

  /** Re-rank a union of sketch-row tables back into one bottom-`kMin`
    * sketch per source — KMV's merge: dedup hashes, keep the smallest
    * k. Input only needs (source, h). */
  def kmvCombine(rows: DataFrame, kMin: Int = 64): DataFrame = {
    val wRank = Window.partitionBy("source").orderBy(col("h").asc)
    rows.select(col("source"), col("h")).distinct()
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= kMin)
  }

  /** The (k−1)·2³²/h₍ₖ₎ KMV estimate over sketch rows: per source,
    * (source, hk, n_kept, est_distinct); NULL estimate when the sketch
    * holds fewer than kMin hashes (exact regime). */
  def kmvEstimate(rows: DataFrame, kMin: Int = 64): DataFrame = {
    import graft.rel.Queries.femit
    rows.groupBy("source")
      .agg(max(when(col("rn") === kMin, col("h"))).as("hk"),
        count(lit(1)).as("n_kept"))
      .select(col("source"), col("hk"), col("n_kept"),
        femit(lit((kMin - 1).toDouble) * lit(4294967296.0) /
          col("hk").cast("double")).as("est_distinct"))
  }

  def kmvSketch(docs: DataFrame, kMin: Int = 64): DataFrame = {
    import graft.rel.Queries.femit
    val dh = kmvHashes(docs)
      .localCheckpoint() // vocab-scale; feeds sketch, exact, and merge
    val wRank = Window.partitionBy("source").orderBy(col("h").asc)
    val kept = dh.withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= kMin)
      .localCheckpoint() // feeds per-source sketch AND the merge union
    val exact = dh.groupBy("source").agg(count(lit(1)).as("n_exact"))
    val per = kept.groupBy("source")
      .agg(max(when(col("rn") === kMin, col("h"))).as("hk"),
        count(lit(1)).as("n_kept"))
      .join(exact, "source")
    val wAll = Window.orderBy(col("h").asc)
    val mergedKept = kept.select(col("h")).distinct()
      .withColumn("rn", row_number().over(wAll)).where(col("rn") <= kMin)
    val merged = mergedKept
      .agg(max(when(col("rn") === kMin, col("h"))).as("hk"),
        count(lit(1)).as("n_kept"))
      .crossJoin(broadcast(
        dh.select(col("h")).distinct().agg(count(lit(1)).as("n_exact"))))
      .select(lit("__merged").as("source"), col("hk"), col("n_kept"),
        col("n_exact"))
    val est = femit(lit((kMin - 1).toDouble) * lit(4294967296.0) /
      col("hk").cast("double"))
    per.select(col("source"), col("hk"), col("n_kept"), col("n_exact"),
        est.as("est_distinct"))
      .unionAll(merged.select(col("source"), col("hk"), col("n_kept"),
        col("n_exact"), est.as("est_distinct")))
      .orderBy("source")
  }

  /** Kendall's coefficient of concordance W (Kendall &amp; Babington
    * Smith 1939) with the tie correction — the RANKING-agreement
    * companion to [[krippendorffAlpha]]'s categorical agreement: the
    * m = 3 "judges" rank every document by length (n_chars), token
    * count, and the 1/512-quantized uniqueness ratio (quantized so the
    * third criterion ranks at a BOUNDED value grain at any corpus
    * size — raw ratios are near-continuous and would make the rank
    * table corpus-grain; the q375 bounded-grain discipline). W =
    * 12S / (m²(n³−n) − m·ΣT) with S = Σ(R_i − m(n+1)/2)² and the
    * standard tie term T_j = Σ(t³−t); χ² = m(n−1)W rides along.
    *
    * Ranks are MIDRANKS computed at value grain: cumulative count of
    * smaller values + (t+1)/2 — exact halves, no sort of the corpus
    * (one bounded-grain window per criterion, the aucTwoPhase
    * average-rank trick).
    *
    * Scale: three value-grain aggregates + windows over ≤ |distinct
    * values| cells, three broadcast joins back, one doc-grain
    * reduce. */
  def kendallW(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val toksArr = toks(col("text"))
    val per = docs.select(col("doc_id"),
        col("n_chars").as("c1"),
        size(toksArr).cast("long").as("c2"),
        floor(size(array_distinct(toksArr)).cast("double")
          / size(toksArr).cast("double") * 512.0).cast("long").as("c3"))
      .localCheckpoint() // three rank joins + the census
    def midranks(cName: String): (DataFrame, DataFrame) = {
      val vg = per.groupBy(col(cName).as("v"))
        .agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = vg
        .withColumn("below", coalesce(sum(col("t")).over(wv), lit(0L)))
        .select(col("v").as(cName),
          (col("below").cast("double")
            + (col("t").cast("double") + lit(1.0)) / 2.0).as(s"r_$cName"))
      val ties = vg.agg(sum(col("t") * col("t") * col("t") - col("t"))
        .as(s"tt_$cName"))
      (ranked, ties)
    }
    val (r1, t1) = midranks("c1")
    val (r2, t2) = midranks("c2")
    val (r3, t3) = midranks("c3")
    val joined = per
      .join(broadcast(r1), Seq("c1"))
      .join(broadcast(r2), Seq("c2"))
      .join(broadcast(r3), Seq("c3"))
      .withColumn("rsum", col("r_c1") + col("r_c2") + col("r_c3"))
    val n = joined.agg(count(lit(1)).as("n")).localCheckpoint()
    val s = joined.crossJoin(broadcast(n))
      .select((col("rsum")
        - lit(3.0) * (col("n").cast("double") + lit(1.0)) / 2.0).as("d"))
      .agg(dsum(col("d") * col("d")).as("s"))
    s.crossJoin(broadcast(n))
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .crossJoin(broadcast(t3))
      .withColumn("tsum", col("tt_c1") + col("tt_c2") + col("tt_c3"))
      .withColumn("nd", col("n").cast("double"))
      .select(col("n").as("n_docs"), col("tsum").as("tie_sum"),
        femit(col("s")).as("s_stat"),
        femit(lit(12.0) * col("s")
          / (lit(9.0) * (col("nd") * col("nd") * col("nd") - col("nd"))
            - lit(3.0) * col("tsum").cast("double"))).as("w"),
        femit(lit(3.0) * (col("nd") - lit(1.0))
          * (lit(12.0) * col("s")
            / (lit(9.0) * (col("nd") * col("nd") * col("nd") - col("nd"))
              - lit(3.0) * col("tsum").cast("double")))).as("chi2"))
  }

  /** Good–Turing frequency smoothing (Good 1953; the count-of-counts
    * estimator behind Katz backoff, complementing q376's Kneser–Ney
    * and q351's Jelinek–Mercer): over the corpus unigram counts,
    * N_r = #types seen exactly r times, the adjusted count
    * r* = (r+1)·N_{r+1}/N_r, the smoothed probability mass
    * p_mass(r) = r*·N_r/N, and the leave-one-out unseen mass
    * p0 = N_1/N — the quantity a curation pipeline reads as "how much
    * of the next shard will be new vocabulary" (the estimator twin of
    * q300's Heaps-law extrapolation).
    *
    * Determinism: everything through N_r is exact integer; the three
    * ratios are fixed-order IEEE chains femit'd at emission; rows with
    * no N_{r+1} emit NULL r* (the raw-GT domain edge, left to the
    * caller exactly as Good 1953 leaves it).
    *
    * The species table is the BIGRAM type table (the n-gram grain
    * Katz backoff actually smooths): this fixture's unigram vocabulary
    * is tiny and saturated (min count 29 — no low-count tail at all),
    * while bigrams expose the real N_1..N_4 singleton/doubleton tail
    * GT exists for.
    *
    * Scale: corpus → bigram-type grain in one hash-agg (the in-array
    * adjacent-pair transform is per-row, the q120 idiom), types →
    * counts-of-counts grain (≤ max count rows) in a second; the
    * r/r+1 self-join and totals run on that tiny table. */
  /** Bigram-type counts-of-counts table (r, n_r) — the species-
    * frequency spectrum shared by [[goodTuring]] and [[chao1]]. */
  private def bigramCountOfCounts(docs: DataFrame): DataFrame = {
    val base = docs.select(toks(col("text")).as("ts"))
    base.select(explode(expr(
        "filter(transform(ts, (t, i) -> struct(t AS w1," +
          " try_element_at(ts, i + 2) AS w2)), p -> p.w2 IS NOT NULL)"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
  }

  def goodTuring(docs: DataFrame, maxR: Long = 10L): DataFrame = {
    import graft.rel.Queries.femit
    val coc = bigramCountOfCounts(docs)
      .localCheckpoint() // self-join + totals + p0 read one table
    val tot = coc.agg(sum(col("r") * col("n_r")).as("n_total"),
      sum(when(col("r") === 1L, col("n_r"))).as("n1"))
    coc.where(col("r") <= maxR)
      .join(coc.select((col("r") - 1L).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("r"), col("n_r"),
        coalesce(col("n_r1"), lit(0L)).as("n_r_next"),
        femit((col("r") + 1L).cast("double") * col("n_r1").cast("double")
          / col("n_r").cast("double")).as("r_star"),
        femit((col("r") + 1L).cast("double") * col("n_r1").cast("double")
          / col("n_r").cast("double") * col("n_r").cast("double")
          / col("n_total").cast("double")).as("p_mass"),
        femit(col("n1").cast("double") / col("n_total").cast("double"))
          .as("p_unseen"))
      .orderBy("r")
  }

  /** Chao1 species-richness estimator (Chao 1984; the bias-corrected
    * form) with Good's sample coverage — "how many bigram types does
    * the corpus REALLY have, and what share have we seen": off the
    * same frequency spectrum as [[goodTuring]],
    * Chao1 = V + N₁(N₁−1)/(2(N₂+1)) (the +1 form is defined even when
    * no doubletons exist), coverage Ĉ = 1 − N₁/N, and the
    * undetected-type count — the vocabulary-side answer to q300's
    * Heaps-law growth extrapolation (Heaps fits the CURVE, Chao1
    * bounds the ASYMPTOTE).
    *
    * Determinism: V, N₁, N₂, N are exact integers off two hash-aggs;
    * the estimator is one fixed chain. Scale: corpus → type grain →
    * spectrum grain (≤ max-count rows), then a 1-row reduce. */
  def chao1(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.femit
    bigramCountOfCounts(docs)
      .agg(sum(col("n_r")).as("v_obs"),
        sum(col("r") * col("n_r")).as("n_total"),
        sum(when(col("r") === 1L, col("n_r"))).as("n1raw"),
        sum(when(col("r") === 2L, col("n_r"))).as("n2raw"))
      .select(col("v_obs"), col("n_total"),
        coalesce(col("n1raw"), lit(0L)).as("n1"),
        coalesce(col("n2raw"), lit(0L)).as("n2"))
      .select(col("v_obs"), col("n_total"), col("n1"), col("n2"),
        femit(col("v_obs").cast("double")
          + col("n1").cast("double") * (col("n1") - 1L).cast("double")
          / (lit(2.0) * (col("n2") + 1L).cast("double"))).as("chao1"),
        femit(col("n1").cast("double") * (col("n1") - 1L).cast("double")
          / (lit(2.0) * (col("n2") + 1L).cast("double")))
          .as("undetected_est"),
        femit(lit(1.0) - col("n1").cast("double")
          / col("n_total").cast("double")).as("coverage"))
  }

  /** Moving-average type–token ratio (MATTR, Covington &amp; McFall
    * 2010 — the window-length-controlled lexical-diversity measure
    * that removes raw TTR's document-length confound): per document,
    * the mean over all length-`w` token windows of
    * (#distinct tokens in window)/w; documents shorter than `w` fall
    * back to their global TTR (the standard convention).
    *
    * Distinct-in-window WITHOUT a per-window set: a token occurrence
    * at position p is the window's FIRST sight of its type iff its
    * previous same-type occurrence (one keyed lag) precedes the window
    * start i — so distinct(i) = Σ_{p∈[i,i+w)} [prev(p) &lt; i], a pure
    * counting aggregate.
    *
    * Scale: the starts×tokens pairing is the q43 covering-cell band
    * join — both sides keyed by (doc, pos div w), the token side
    * replicated into the 2 covering cells, never a doc-keyed cross
    * join; candidate volume is the inherent O(tokens·2) join rows →
    * O(tokens·w) after the exact range filter (each token belongs to
    * ≤ w windows). All grains are per-document. */
  def mattr(docs: DataFrame, w: Int = 32): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val tok = docs.select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "tok")))
    val wPrev = Window.partitionBy("doc_id", "tok").orderBy(col("pos").asc)
    val t2 = tok.withColumn("prev", lag(col("pos"), 1).over(wPrev))
      .withColumn("pc", (col("pos") / w).cast("long"))
    val lens = tok.groupBy("doc_id").agg(count(lit(1)).as("len"),
      countDistinct(col("tok")).as("n_distinct"))
    val starts = lens.where(col("len") >= w.toLong)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("len") - w.toLong)).as("i"))
      .withColumn("c", (col("i") / w).cast("long"))
    val cand = t2.select(col("doc_id"), col("pos"), col("prev"),
        explode(array(col("pc") - 1L, col("pc"))).as("c"))
      .join(starts, Seq("doc_id", "c"))
      .where(col("pos") >= col("i") && col("pos") < col("i") + w.toLong)
    val perWin = cand.groupBy("doc_id", "i")
      .agg(sum(when(col("prev").isNull || col("prev") < col("i"), 1L)
        .otherwise(0L)).as("d"))
    val perDoc = perWin.groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        dsum(col("d").cast("double") / lit(w.toDouble)).as("sd"))
    lens.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len").as("n_tokens"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        femit(when(col("n_windows").isNotNull,
            col("sd") / col("n_windows").cast("double"))
          .otherwise(col("n_distinct").cast("double")
            / col("len").cast("double"))).as("mattr"),
        femit(col("n_distinct").cast("double") / col("len").cast("double"))
          .as("ttr"))
      .orderBy("doc_id")
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff 1970/2004 —
    * the inter-rater reliability coefficient that generalizes q309's
    * two-rater Cohen's kappa to any rater count and corrects chance
    * agreement from the pooled margin): units are documents, the 3
    * "raters" are deterministic quality heuristics (length ≥ 300
    * chars; ≥ 50 whitespace tokens; unique-token ratio ≥ 0.4375 —
    * the dyadic 7/16), each voting a binary category, standing in for
    * human annotators on a fixture without any (documented — the q377
    * fixed-model convention).
    *
    * Everything up to the final two ratios is EXACT INTEGER
    * arithmetic: per-unit category counts n_uc, coincidences scaled
    * by (m−1) so S_ck = Σ_u n_uc·(n_uk − δ_ck) stays integral,
    * margins n_c = Σ_k S_ck/(m−1), n = Σ_c n_c = m·N; then
    * D_o = (Σ_{c≠k} S_ck/(m−1))/n, D_e = Σ_{c≠k} n_c·n_k/(n(n−1)),
    * α = 1 − D_o/D_e. Observed percent agreement rides along.
    *
    * Scale: one doc-grain projection (three boolean heuristics), one
    * (unit, category)-grain count, one within-unit self-join whose
    * fan-out is bounded by the CATEGORY count (≤ 2 rows per unit),
    * then aggregates over the ≤ 4-row coincidence table. */
  def krippendorffAlpha(docs: DataFrame): DataFrame = {
    import graft.rel.Queries.femit
    val toks = split(col("text"), " ")
    val rated = docs.select(col("doc_id"),
      when(col("n_chars") >= 300L, 1L).otherwise(0L).as("c1"),
      when(size(toks) >= 50, 1L).otherwise(0L).as("c2"),
      when(size(array_distinct(toks)).cast("double")
        / size(toks).cast("double") >= 0.4375, 1L).otherwise(0L).as("c3"))
    val long = rated.select(col("doc_id"), col("c1").as("cat"))
      .unionAll(rated.select(col("doc_id"), col("c2").as("cat")))
      .unionAll(rated.select(col("doc_id"), col("c3").as("cat")))
    val ucc = long.groupBy("doc_id", "cat")
      .agg(count(lit(1)).as("nuc"))
      .localCheckpoint() // self-join + unit census
    val coin = ucc.select(col("doc_id"), col("cat").as("c"), col("nuc"))
      .join(ucc.select(col("doc_id"), col("cat").as("k2"),
        col("nuc").as("nuk")), Seq("doc_id"))
      .groupBy("c", "k2")
      .agg(sum(col("nuc") * (col("nuk")
        - when(col("c") === col("k2"), 1L).otherwise(0L))).as("s"))
      .localCheckpoint() // margins + disagreement reads
    val nUnits = ucc.select("doc_id").distinct().count()
    val margins = coin.groupBy("c").agg(sum(col("s")).as("s_row"))
      .select(col("c"), expr("s_row div 2").as("nc")) // m − 1 = 2, exact
    val agree = rated.agg(count(lit(1)).as("nu"),
      sum(when(col("c1") === col("c2") && col("c2") === col("c3"), 1L)
        .otherwise(0L)).as("unanimous"))
    val dO = coin.where(col("c") =!= col("k2")).agg(sum(col("s")).as("sd"))
    val dE = margins.select(col("c").as("cm"), col("nc"))
      .crossJoin(margins.select(col("c").as("km"), col("nc").as("nk")))
      .where(col("cm") =!= col("km"))
      .agg(sum(col("nc") * col("nk")).as("se"))
    // nUnits is a 1-row scalar control read (the neighborhoodFunction
    // precedent), not part of any declared per-row plan
    val n = 3L * nUnits
    dO.crossJoin(broadcast(dE)).crossJoin(broadcast(agree))
      .select(lit(nUnits).as("n_units"), lit(n).as("n_ratings"),
        femit(col("sd").cast("double") / 2.0 / lit(n.toDouble)).as("d_o"),
        femit(col("se").cast("double")
          / (lit(n.toDouble) * lit((n - 1).toDouble))).as("d_e"),
        femit(lit(1.0) - (col("sd").cast("double") / 2.0 / lit(n.toDouble))
          / (col("se").cast("double")
            / (lit(n.toDouble) * lit((n - 1).toDouble)))).as("alpha"),
        femit(col("unanimous").cast("double") / col("nu").cast("double"))
          .as("pct_unanimous"))
  }

  /** Portable BLOOM FILTER build + probe + false-positive audit
    * (Bloom, CACM 1970) — the membership sketch every runtime filter,
    * decontamination blocklist, and seen-URL crawler frontier ships
    * around as bytes. The engine's own Bloom pruning is q110; this is
    * the PORTABLE build a pipeline persists and re-probes across jobs:
    * member set = the distinct tokens of `memberLang` documents,
    * k = `kHash` fnv positions per token into an `mBits`-bit bitmap
    * materialized as mBits/32 integer words (32-bit chunks so no
    * engine's BIGINT shift semantics is ever exercised at bit 63),
    * built by ONE hash-agg of ORed word masks. Probes = the distinct
    * tokens of every OTHER language, labeled true/false members by an
    * exact anti-join, scored against the bitmap. Output per language:
    * probe counts, measured false-positive rate over true
    * non-members, and the analytic rate (1 − (1−1/m)^{kn})^k — the
    * gate certifies the sketch AND the audit identity fp ≤ non-members.
    *
    * Determinism: pure integer hashing and bit algebra; the analytic
    * rate is one fixed IEEE chain through femit.
    *
    * Scale: the build is one explode + one mBits/32-row bit_or agg;
    * the bitmap BROADCASTS to the probe join (exactly how engines ship
    * runtime filters to scan tasks); probes are one hash-agg per
    * token. No shuffle grows beyond token cardinality. */
  def bloomFilter(docs: DataFrame, memberLang: String = "en",
                  mBits: Int = 32768, kHash: Int = 4): DataFrame = {
    import graft.rel.Queries.femit
    graft.functions.HashExprs.register(docs.sparkSession)
    require(mBits % 32 == 0, "mBits must pack into 32-bit words")
    val tok = docs.select(col("lang"), explode(toks(col("text"))).as("t"))
      .distinct()
      .localCheckpoint() // members, probes, and the exact labels
    val members = tok.where(col("lang") === memberLang).select("t").distinct()
    // shared-prefix FNV fold: hash t once, fold the ':bN' constant
    // suffixes — bit-identical to fnv1a32(concat(t, ':bN')) without
    // kHash per-row concats + re-hashes (r15, guide §4)
    def positions(df: DataFrame): DataFrame = {
      val hb = graft.functions.HashExprs.fnvFoldConst(
        graft.functions.HashExprs.fnv1a32("t"), ":b")
      df.select(col("*"),
        explode(array((0 until kHash).map(i =>
          pmod(graft.functions.HashExprs.fnvFoldConst(hb, i.toString),
            lit(mBits.toLong))): _*)).as("pos"))
    }
    val bitmap = positions(members)
      .select(expr("pos div 32").as("w"),
        expr("shiftleft(1L, int(pos % 32))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("word"))
      .localCheckpoint() // broadcast into the probe join
    val nMember = members.count()
    val probes = tok.where(col("lang") =!= memberLang)
      .join(members.withColumnRenamed("t", "t2"),
        col("t") === col("t2"), "left")
      .select(col("lang"), col("t"), col("t2").isNotNull.as("is_member"))
    // LEFT join (ADVICE r13): a position landing in a word with no set
    // bits has no bitmap row — that is a DEFINITE miss (bloom_hit must
    // come out false), not a row to drop. An inner join would silently
    // shrink n_probes' position set and overstate false positives on
    // sparse member sets.
    val hit = positions(probes)
      .join(broadcast(bitmap), expr("pos div 32") === col("w"), "left")
      .groupBy("lang", "t", "is_member")
      .agg(min(expr("coalesce(word, 0L) & shiftleft(1L, int(pos % 32)) <> 0"))
        .as("bloom_hit"))
    val analytic = pow(lit(1.0) - pow(lit(1.0) - lit(1.0 / mBits),
      lit(kHash.toDouble) * lit(nMember.toDouble)), lit(kHash.toDouble))
    hit.groupBy("lang")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(!col("is_member"), 1L).otherwise(0L)).as("n_nonmembers"),
        sum(when(col("is_member") && !col("bloom_hit"), 1L).otherwise(0L))
          .as("n_false_neg"),
        sum(when(!col("is_member") && col("bloom_hit"), 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(col("lang"), col("n_probes"), col("n_nonmembers"),
        col("n_false_neg"), col("n_false_pos"),
        // a language whose vocabulary is wholly inside the member set
        // has no non-members — NULL rate, not a division error
        femit(col("n_false_pos").cast("double")
          / nullif(col("n_nonmembers"), lit(0L)).cast("double"))
          .as("fpr_measured"),
        femit(analytic).as("fpr_analytic"))
      .orderBy("lang")
  }

  /** UNIGRAM-LM (SentencePiece-style) VITERBI TOKENIZATION — the
    * probabilistic-segmentation member of the tokenizer family (Kudo,
    * ACL 2018: given piece log-probs, a word's tokenization is the
    * max-likelihood segmentation, found by the Viterbi DP over
    * character positions; the repo's BPE rows q174/q206 cover the
    * merge-rule family — this is the other tokenizer production
    * systems train): the piece vocabulary is every 1..`maxPiece`-char
    * substring of the corpus words with its occurrence count weighted
    * by word frequency, p(piece) = cnt/Σcnt, and the DP
    * dp[i] = max_j (dp[j] + ln p(word[j:i])) unrolls to `maxLen`
    * positions ENTIRELY IN-PLAN: each word carries its (j,i)→lp
    * lookup map (one explode + one piece join + map_from_entries —
    * never a per-word UDF), and each unrolled step is a ≤maxPiece-way
    * strict-greater fold over (score, segmentation, n_pieces) structs
    * (ties keep the smaller j — the longer trailing piece — by fold
    * order). Emits per word: the segmentation, piece count, and the
    * femit'd Viterbi log-likelihood, so the gate hash-pins the entire
    * DP trajectory including tie behavior.
    *
    * Scale: vocab and word tables are token-grain aggregates (the tf
    * shuffle family); the DP itself is a per-row expression chain over
    * the word table — no shuffle, no iteration over the corpus, and
    * word length is capped (longer words would chunk first, the q113
    * convention). */
  def unigramTokenize(docs: DataFrame, maxPiece: Int = 4,
                      maxLen: Int = 8): DataFrame = {
    import graft.rel.Queries.femit
    val (posPieces, _, lpTbl) = unigramRound1(docs, maxPiece, maxLen)
    viterbiSegment(posPieces, lpTbl, maxPiece, maxLen)
      .select(col("t").as("word"), col("freq"),
        length(col("t")).cast("long").as("n_chars"),
        col("fin.np").as("n_pieces"),
        col("fin.seg").as("segmentation"),
        femit(col("fin.s")).as("viterbi_logp"))
      .orderBy("word")
  }

  /** The round-1 artifacts shared by [[unigramTokenize]] and
    * [[unigramHardEm]]: (posPieces, vocab, lpTbl) — the word table with
    * its exploded (span, piece) rows, the frequency-weighted substring
    * vocabulary, and its log-prob table. */
  private def unigramRound1(docs: DataFrame, maxPiece: Int, maxLen: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val words = docs
      .select(explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .where(length(col("t")) <= maxLen)
      .localCheckpoint() // vocab build + the DP table
    // (j, i) spans, 0-indexed start / exclusive end, piece = t[j:i)
    val allSpans = (1 to maxLen).flatMap(i =>
      (math.max(0, i - maxPiece) until i).map(j => (j, i)))
    val posPieces = words.select(col("t"), col("freq"),
        explode(array(allSpans.map { case (j, i) =>
          struct(lit(j * 100 + i).as("k"),
            substring(col("t"), j + 1, i - j).as("piece"))
        }: _*)).as("sp"))
      .where(length(col("sp.piece")) === col("sp.k") % 100
        - expr("sp.k div 100")) // span inside the word
      .select(col("t"), col("freq"), col("sp.k").as("k"),
        col("sp.piece").as("piece"))
      .localCheckpoint() // feeds the vocab agg AND the per-word maps
    val vocab = posPieces.groupBy("piece")
      .agg(sum(col("freq")).as("cnt"))
      .localCheckpoint() // lp table + hard-EM coverage singles
    val tot = vocab.agg(sum(col("cnt")).as("tt"))
    val lpTbl = vocab.crossJoin(broadcast(tot))
      .select(col("piece"),
        (log(col("cnt").cast("double")) - log(col("tt").cast("double")))
          .as("lp"))
    (posPieces, vocab, lpTbl)
  }

  /** ONE HARD-EM ROUND of unigram-LM tokenizer training (the actual
    * SentencePiece training step, Kudo ACL 2018 §3.2 with hard counts:
    * E-step = Viterbi-segment every word under the current piece
    * probabilities; M-step = re-estimate p(piece) from the
    * segmentation counts; prune the bottom-`pruneShare` of the
    * multi-char vocabulary by re-estimated count; re-segment under the
    * new table). Hard-count re-estimation already collapses the vocab
    * to pieces the Viterbi path actually uses; the explicit prune then
    * drops the weakest survivors, and — as in SentencePiece — ALL
    * single-character pieces are kept unconditionally (floor count 1
    * when unused) so every word stays segmentable; round-2 candidates
    * touching a pruned piece carry a NaN score and lose the DP fold
    * (the [[viterbiSegment]] OOV rule, exercised for real here).
    *
    * Per word: both rounds' segmentations and piece counts, the femit'd
    * round-2 Viterbi log-likelihood, a changed flag, and both vocab
    * sizes carried on every row — the gate pins the E-step, the count
    * M-step, the prune boundary (count-then-piece order), and the
    * round-2 DP including its OOV behavior in one hash.
    *
    * Determinism: counts are exact integers; the prune rank orders by
    * (cnt2, piece) — total order, no engine ties; round-2 log-probs are
    * the same ln-ratio lattice as round 1.
    *
    * Scale: both E-steps are the per-row in-plan DP (no shuffle beyond
    * the tf family); the M-step is one explode + hash-agg at piece
    * grain; the prune rank is two-phased over the O(distinct counts)
    * offset grid (column `cell` — the q300/q192 discipline), never a
    * vocab-grain global sort. */
  def unigramHardEm(docs: DataFrame, maxPiece: Int = 4, maxLen: Int = 8,
                    pruneShare: Double = 0.2): DataFrame = {
    import graft.rel.Queries.femit
    val (posPieces, vocab, lpTbl) = unigramRound1(docs, maxPiece, maxLen)
    val seg1 = viterbiSegment(posPieces, lpTbl, maxPiece, maxLen)
      .select(col("t"), col("freq"), col("fin.seg").as("seg_r1"),
        col("fin.np").as("np_r1"))
      .localCheckpoint() // M-step counts + the final per-word join
    val singles = vocab.where(length(col("piece")) === 1).select("piece")
    val kept = emStep(seg1, "seg_r1", singles, pruneShare)
    val lp2 = lpFrom(kept)
    val seg2 = viterbiSegment(posPieces, lp2, maxPiece, maxLen)
      .select(col("t"), col("freq"), col("fin.seg").as("seg_r2"),
        col("fin.np").as("np_r2"), col("fin.s").as("s_r2"))
    val v1 = vocab.agg(count(lit(1)).as("n_vocab_r1"))
    val v2 = kept.agg(count(lit(1)).as("n_vocab_r2"))
    seg1.join(seg2, Seq("t", "freq"))
      .crossJoin(broadcast(v1)).crossJoin(broadcast(v2))
      .select(col("t").as("word"), col("freq"),
        col("np_r1"), col("seg_r1"), col("np_r2"), col("seg_r2"),
        (col("seg_r1") =!= col("seg_r2")).as("changed"),
        femit(col("s_r2")).as("viterbi_logp_r2"),
        col("n_vocab_r1"), col("n_vocab_r2"))
      .orderBy("word")
  }

  /** One hard-EM M-STEP + PRUNE from a segmentation frame (t, freq,
    * `segCol`): piece usage counts weighted by word frequency,
    * unconditional single-char coverage (floor count 1 when the E-step
    * never used the character — the SentencePiece rule keeping every
    * word segmentable), then the bottom-floor(pruneShare · n_multi)
    * multi-char prune by (cnt2 asc, piece asc). The global prune rank
    * rides the two-phase offset grid: in-cell rank per distinct cnt2
    * value + the O(distinct-counts) offset table — the vocabulary is
    * never globally sorted. Returns the kept (piece, cnt2) table,
    * localCheckpointed (census + lp + next round consume it). */
  private def emStep(seg: DataFrame, segCol: String, singles: DataFrame,
                     pruneShare: Double): DataFrame = {
    val used = seg
      .select(col("freq"), explode(split(col(segCol), " ", -1)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt2"))
    val est = used.join(singles.withColumn("s1", lit(1)), Seq("piece"),
        "full_outer")
      .select(col("piece"), coalesce(col("cnt2"), lit(1L)).as("cnt2"))
      .localCheckpoint() // prune rank (two passes) + kept table
    val multi = est.where(length(col("piece")) >= 2)
    val inCell = Window.partitionBy("cell").orderBy(col("piece").asc)
    val preCell = Window.orderBy(col("cell").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = multi.select(col("cnt2").as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(preCell), lit(0L)))
      .select("cell", "off")
    val nPrune = multi.agg(
      floor(count(lit(1)).cast("double") * lit(pruneShare)).as("np"))
    val ranked = multi.withColumn("cell", col("cnt2"))
      .withColumn("r_in", row_number().over(inCell))
      .join(broadcast(offsets), "cell")
      .crossJoin(broadcast(nPrune))
      .where(col("off") + col("r_in") > col("np"))
      .select("piece", "cnt2")
    est.where(length(col("piece")) === 1).unionAll(ranked)
      .localCheckpoint() // vocab census + lp table + next round's M-step
  }

  /** ln(cnt) − ln(Σcnt) piece log-probs from a kept (piece, cnt2)
    * table — the scalar total rides a broadcast crossJoin. */
  private def lpFrom(kept: DataFrame): DataFrame = {
    val tot = kept.agg(sum(col("cnt2")).as("tt"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"),
        (log(col("cnt2").cast("double")) - log(col("tt").cast("double")))
          .as("lp"))
  }

  /** R-ROUND hard-EM unigram-LM tokenizer training ([[unigramHardEm]]'s
    * single round generalized — SentencePiece iterates
    * EM-with-prune toward a vocabulary target, it never stops after
    * one round): round r Viterbi-segments every word under lp_r (the
    * in-plan DP), re-estimates piece counts from those segmentations,
    * prunes the bottom-share multi-char pieces, and hands lp_{r+1} to
    * round r+1 — R prune rounds, R+1 E-steps, segmentations
    * seg_r1..seg_r{R+1}. Pieces pruned in round r can never reappear:
    * the DP scores them NaN and the fold yields (the OOV rule).
    *
    * The CONVERGENCE REPORT is carried on every row: per-round vocab
    * sizes (n_vocab_r1..r{R+1}) and changed-word counts
    * (n_changed_r2..r{R+1}, words whose segmentation differs from the
    * previous round) — the two curves a training pipeline watches to
    * stop early.
    *
    * Determinism/scale: exactly the q443 lattice per round — the
    * E-step DP is in-plan (no shuffle beyond the tf family), the
    * M-step one explode + hash-agg at piece grain, the prune two-phased
    * over the O(distinct-counts) offset grid, never a vocab-grain
    * global sort; per-round frames are localCheckpointed so round r+1
    * never replays round r's DP; the scalar census/changed counts ride
    * broadcast crossJoins. */
  def unigramEmRounds(docs: DataFrame, rounds: Int = 2, maxPiece: Int = 4,
                      maxLen: Int = 8, pruneShare: Double = 0.2): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    import graft.rel.Queries.femit
    val (posPieces, vocab, lpTbl) = unigramRound1(docs, maxPiece, maxLen)
    val singles = vocab.where(length(col("piece")) === 1).select("piece")
      .localCheckpoint() // every round's coverage floor
    var lp = lpTbl
    var vocabSizes = List(vocab.agg(count(lit(1)).as("n_vocab_r1")))
    var segs = List.empty[DataFrame]
    for (r <- 1 to rounds + 1) {
      val seg = viterbiSegment(posPieces, lp, maxPiece, maxLen)
        .select(col("t"), col("freq"), col("fin.seg").as(s"seg_r$r"),
          col("fin.np").as(s"np_r$r"), col("fin.s").as(s"s_r$r"))
        .localCheckpoint() // M-step + the final multi-way join
      segs = segs :+ seg
      if (r <= rounds) {
        val kept = emStep(seg, s"seg_r$r", singles, pruneShare)
        vocabSizes = vocabSizes :+
          kept.agg(count(lit(1)).as(s"n_vocab_r${r + 1}"))
        lp = lpFrom(kept)
      }
    }
    val joined = segs.reduce(_.join(_, Seq("t", "freq")))
    val changedCols = (2 to rounds + 1).map(r =>
      (col(s"seg_r${r - 1}") =!= col(s"seg_r$r")).as(s"changed_r$r"))
    val perWord = joined.select(
        joined.columns.map(col) ++ changedCols: _*)
      .localCheckpoint() // changed-count census + final select
    val changedCensus = perWord.agg(
      sum(when(col("changed_r2"), 1L).otherwise(0L)).as("n_changed_r2"),
      (3 to rounds + 1).map(r =>
        sum(when(col(s"changed_r$r"), 1L).otherwise(0L))
          .as(s"n_changed_r$r")): _*)
    val withCensus = vocabSizes.foldLeft(
        perWord.crossJoin(broadcast(changedCensus)))(
      (df, v) => df.crossJoin(broadcast(v)))
    val last = rounds + 1
    withCensus.select(
      Seq(col("t").as("word"), col("freq")) ++
        (1 to last).map(r => col(s"np_r$r")) ++
        (1 to last).map(r => col(s"seg_r$r")) ++
        (2 to last).map(r => col(s"changed_r$r")) :+
        femit(col(s"s_r$last")).as(s"viterbi_logp_r$last") :++
        (1 to last).map(r => col(s"n_vocab_r$r")) :++
        (2 to last).map(r => col(s"n_changed_r$r")): _*)
      .orderBy("word")
  }

  /** The unrolled Viterbi DP shared by [[unigramTokenize]] and
    * [[unigramHardEm]]: joins `posPieces` (t, freq, k, piece) against
    * a piece log-prob table, folds per position with the NULL-SAFE
    * strict-greater rule (a span whose piece left the vocabulary — the
    * hard-EM round-2 case — carries a null score and never wins; a
    * null accumulator yields to the first scorable candidate), and
    * returns (t, freq, fin(s, seg, np)). */
  private[llm] def viterbiSegment(posPieces: DataFrame, lpTbl: DataFrame,
                                  maxPiece: Int, maxLen: Int): DataFrame = {
    val wmap = posPieces.join(broadcast(lpTbl), Seq("piece"), "left")
      .groupBy("t", "freq")
      .agg(map_from_entries(collect_list(struct(col("k"),
        coalesce(col("lp"), lit(Double.NaN)))))
        .as("mp"))
    var df = wmap.withColumn("dp0",
      struct(lit(0.0).as("s"), lit("").as("seg"), lit(0L).as("np")))
    for (i <- 1 to maxLen) {
      val cands = (math.max(0, i - maxPiece) until i).map { j =>
        // an out-of-vocabulary span maps to NaN (collected as a real
        // map entry so map_from_entries never sees a null clash);
        // NaN + x = NaN and NaN comparisons are false, so the fold
        // skips it exactly like SQL NULL — but deterministically
        val lpx = element_at(col("mp"), lit(j * 100 + i))
        struct((col(s"dp$j.s") + lpx).as("s"),
          concat(col(s"dp$j.seg"),
            when(col(s"dp$j.np") > 0L, lit(" ")).otherwise(lit("")),
            substring(col("t"), j + 1, i - j)).as("seg"),
          (col(s"dp$j.np") + 1L).as("np"))
      }
      val best = cands.reduceLeft((a, b) =>
        when(isnan(a.getField("s")), b)
          .when(!isnan(b.getField("s"))
            && b.getField("s") > a.getField("s"), b)
          .otherwise(a))
      df = df.withColumn(s"dp$i", when(length(col("t")) >= i, best))
    }
    val fin = (1 to maxLen).map(i =>
      when(length(col("t")) === i, col(s"dp$i"))).reduce(coalesce(_, _))
    df.withColumn("fin", fin).select("t", "freq", "fin")
  }

  /** FEATURE HASHING (the hashing trick — Weinberger et al., ICML
    * 2009: project bag-of-words counts into a FIXED-width vector by
    * bucket = hash(token), with a second ±1 sign hash making the
    * hashed inner product an UNBIASED estimator of the exact one —
    * the construction that lets a text classifier keep constant-width
    * features while the vocabulary grows without bound, i.e. the only
    * featurizer that survives 100 TB of text without a vocabulary
    * sync): per-document signed-hashed vectors at `dBuckets` width,
    * audited two ways — a global collision census (vocabulary per
    * bucket, occupancy, max load) and the inner-product-preservation
    * table over `nPairs` consecutive-id document pairs, exact
    * ⟨x,y⟩ vs hashed ⟨h(x),h(y)⟩ with the absolute error. Counts and
    * signs are integers, so every output column is EXACT — the gate
    * certifies the estimator's arithmetic end to end.
    *
    * Scale: the hashed build is one (doc, bucket) hash-agg (the
    * fixed-width projection itself); the census is bucket-grain; the
    * pair audit touches the bounded probe slice only. */
  def featureHashing(docs: DataFrame, dBuckets: Int = 16,
                     nPairs: Int = 25): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val bucketOf = pmod(graft.functions.HashExprs
      .fnv1a32("concat(tok, ':fh')"), lit(dBuckets.toLong))
    val signOf = graft.functions.HashExprs
      .fnv1a32("concat(tok, ':fs')") % 2L * 2L - 1L
    val census = tok.select("tok").distinct()
      .select(bucketOf.as("b"))
      .groupBy("b").agg(count(lit(1)).as("load"))
      .agg(sum(col("load")).as("n_vocab"),
        count(lit(1)).as("n_buckets_used"),
        max(col("load")).as("max_bucket_load"))
    val tf = tok.where(col("doc_id") < 2L * nPairs)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("p", expr("doc_id div 2"))
      .withColumn("side", col("doc_id") % 2L)
      .localCheckpoint() // sizes + exact dot + hashed vectors
    val sz = tf.groupBy("p", "side").agg(sum(col("tf")).as("ntok"))
    val dotExact = tf.where(col("side") === 0L)
      .select(col("p"), col("tok"), col("tf").as("tf0"))
      .join(tf.where(col("side") === 1L)
        .select(col("p"), col("tok"), col("tf").as("tf1")), Seq("p", "tok"))
      .groupBy("p").agg(sum(col("tf0") * col("tf1")).as("dot_exact"))
    val hv = tf.withColumn("b", bucketOf)
      .withColumn("sgn", signOf)
      .groupBy("p", "side", "b").agg(sum(col("sgn") * col("tf")).as("h"))
    val dotHashed = hv.where(col("side") === 0L)
      .select(col("p"), col("b"), col("h").as("h0"))
      .join(hv.where(col("side") === 1L)
        .select(col("p"), col("b"), col("h").as("h1")), Seq("p", "b"))
      .groupBy("p").agg(sum(col("h0") * col("h1")).as("dot_hashed"))
    sz.where(col("side") === 0L).select(col("p"), col("ntok").as("n1"))
      .join(sz.where(col("side") === 1L)
        .select(col("p"), col("ntok").as("n2")), Seq("p"))
      .join(dotExact, Seq("p"), "left")
      .join(dotHashed, Seq("p"), "left")
      .crossJoin(broadcast(census))
      .select((col("p") * 2L).as("d1"), (col("p") * 2L + 1L).as("d2"),
        col("n1"), col("n2"),
        coalesce(col("dot_exact"), lit(0L)).as("dot_exact"),
        coalesce(col("dot_hashed"), lit(0L)).as("dot_hashed"),
        abs(coalesce(col("dot_hashed"), lit(0L))
          - coalesce(col("dot_exact"), lit(0L))).as("abs_err"),
        col("n_vocab"), col("n_buckets_used"), col("max_bucket_load"))
      .orderBy("d1")
  }

  /** MaxScore-style UPPER-BOUND-PRUNED BM25 top-k (Turtle &amp; Flood,
    * IPM 1995; the dynamic-pruning family WAND/MaxScore/BMW that every
    * production text index runs so a query never fully scores the
    * whole match set): an index keeps, per term, the maximum BM25
    * contribution any document achieves (ub_t — precomputed at index
    * build, modeled here by one term-grain max-agg); at query time a
    * document's CHEAP upper bound is Σ ub_t over the query terms it
    * contains (term-presence only — no per-doc score math), and the
    * pruning runs the two-phase SUFFICIENT-SET protocol: phase 1
    * exact-scores a seed of the top-`candMult`·k docs by bound and
    * reads off the k-th seed score θ; phase 2 exact-scores exactly
    * the docs whose bound ≥ θ — every excluded doc has
    * score ≤ bound &lt; θ ≤ final k-th score, so the result PROVABLY
    * equals the unpruned q79 ranking on any input (no lucky-fixture
    * dependence), and the emitted `certified` column re-checks the
    * inequality end to end.
    *
    * Output: the q79-identical top-k rows (rnk, doc_id, n_terms,
    * score) plus the audit columns every row carries — ub (the doc's
    * bound), n_matching (docs with ≥1 term), n_candidates (the
    * sufficient set actually rescored — n_candidates/n_matching IS
    * the fraction of postings the pruning saved), and `certified`.
    *
    * Determinism: contributions are the femit'd q76 values; bounds
    * and scores accumulate in exact DECIMAL (dsum); both cuts order
    * by (bound/score, doc_id).
    *
    * Scale: ub is a term-grain agg (index-resident in production);
    * the bound pass touches postings only (no tf arithmetic); exact
    * scoring touches the seed + sufficient set instead of the full
    * match set. Bound coarseness is data-honest: when the query terms
    * are near-universal the sufficient set approaches the match set,
    * and the emitted fraction says so. */
  def maxScoreTopK(docs: DataFrame,
                   terms: Seq[String] = Seq("dup", "scan", "join", "query"),
                   kTop: Int = 10, candMult: Int = 4,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.rel.Queries.{dsum, femit}
    val scored = bm25(docs, k1, b)
      .where(col("tok").isin(terms: _*))
      .select("doc_id", "tok", "bm25")
      .localCheckpoint() // ub agg + bound pass + both exact passes
    val ub = scored.groupBy("tok").agg(max(col("bm25")).as("ub"))
    val bounds = scored.join(broadcast(ub), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), dsum(col("ub")).as("ubsum"))
      .localCheckpoint() // seed cut + sufficient set + outside-max
    val nMatching = bounds.count()
    val seed = bounds.orderBy(col("ubsum").desc, col("doc_id").asc)
      .limit(candMult * kTop)
    val seedScore = scored
      .join(seed.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(dsum(col("bm25")).as("score"))
    // θ = k-th best seed score (if the seed holds < k docs, every
    // matching doc is already in it and θ degenerates to -inf)
    val theta = seedScore.orderBy(col("score").desc, col("doc_id").asc)
      .limit(kTop).agg(
        when(count(lit(1)) >= kTop, min(col("score")))
          .otherwise(lit(Double.NegativeInfinity)).as("theta"))
    val cand = bounds.crossJoin(broadcast(theta))
      .where(col("ubsum") >= col("theta"))
      .localCheckpoint() // exact pass + outside anti-join + count
    val nCand = cand.count()
    val exact = scored.join(cand.select("doc_id"), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(dsum(col("bm25")).as("score"))
    val topk = cand.join(exact, "doc_id")
      .orderBy(col("score").desc, col("doc_id").asc).limit(kTop)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
    val kth = topk.agg(min(col("score")).as("kth"))
    val outsideMax = bounds.join(cand.select("doc_id"), Seq("doc_id"),
        "left_anti")
      .agg(coalesce(max(col("ubsum")), lit(Double.NegativeInfinity))
        .as("out_ub"))
    topk.crossJoin(broadcast(kth)).crossJoin(broadcast(outsideMax))
      .select(col("rnk"), col("doc_id"), col("n_terms"),
        femit(col("score")).as("score"),
        femit(col("ubsum")).as("ub"),
        lit(nMatching).as("n_matching"), lit(nCand).as("n_candidates"),
        (col("out_ub") <= col("kth")).as("certified"))
      .orderBy("rnk")
  }
}
