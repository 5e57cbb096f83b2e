package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload with typed metadata — the multimodal column
  * pattern: image/audio/video bytes travel as `binary`, everything the
  * engine needs for planning (sizes, formats, language) is typed. */
case class MediaDoc(doc_id: Long, payload: Array[Byte], mime: String,
                    lang: String, byte_len: Long)

/** Decoded/extracted features for one media document. */
case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
                         height: Int, n_frames: Int, feature: Array[Float])

/** Multimodal-column plumbing (SURVEY-extension: decode / feature-extract
  * / frame-sample over opaque binary columns).
  *
  * The Spark-side mechanics are real and tested: typed `Dataset[MediaDoc]`
  * with a binary payload column, partition-local batched processing via
  * `mapPartitions` (the Scala analogue of a vectorized/batched decode
  * UDF: decoders amortize setup per batch, not per record), and a typed
  * feature schema out.
  *
  * ==STUB== The decode itself is a deterministic fake: real image/audio
  * codecs are not available in this container. [[decodeStub]] derives
  * plausible (width, height, n_frames, feature) values purely from the
  * payload bytes so tests are reproducible. Swapping in a real decoder
  * changes only that one function — schema, batching, and partitioning
  * are decoder-agnostic.
  */
object Multimodal {

  /** Ingest: project a text table into the opaque-payload shape (in a
    * real pipeline the payload column arrives as actual media bytes). */
  def ingest(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaDoc] = {
    import spark.implicits._
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      col("lang"),
      octet_length(col("text")).cast("long").as("byte_len"))
      .as[MediaDoc]
  }

  private def fnvTag(payload: Array[Byte], tag: String): Long =
    graft.functions.Fnv1a32.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(payload, java.nio.charset.StandardCharsets.UTF_8) + ":" + tag),
      graft.functions.Fnv1a32.Seed)

  /** ==STUB== deterministic fake decode: real codecs absent here. Since
    * round 5 the fake values derive from the portable
    * [[graft.functions.Fnv1a32]] over the payload's text, so the DuckDB
    * oracle recomputes them and q38 carries a FULL value oracle (the
    * earlier JVM-hash stub forced a rows-only row). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val w = (16 + fnvTag(payload, "w") % 1024).toInt
    val ht = (16 + fnvTag(payload, "h") % 1024).toInt
    val frames = (1 + fnvTag(payload, "f") % 32).toInt
    (w, ht, frames)
  }

  /** ==STUB== deterministic fake embedding of a frame sample. Values are
    * 24-bit integers as floats — exactly representable, so the dump's
    * integer signature survives the float round trip bit-for-bit on any
    * engine. */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (fnvTag(payload, j.toString) % 16777216L).toFloat)

  /** Batched decode + feature extraction. `batchSize` models the decoder
    * batch shape (e.g. GPU/vectorized decode): records are processed in
    * partition-local groups so a real decoder could amortize per-batch
    * setup. No shuffle — purely partition-parallel. */
  def extractFeatures(ds: Dataset[MediaDoc], batchSize: Int = 64,
                      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here
        batch.iterator.map { m =>
          val (w, h, frames) = decodeStub(m.payload)
          MediaFeatures(m.doc_id, m.byte_len, w, h, frames,
            featureStub(m.payload, featureDim))
        }
      }
    }
  }

  /** Frame sampling over the media table: every `stride`-th frame index
    * up to the decoded frame count, one output row per sampled frame
    * with a per-frame feature signature — the video-pipeline pattern
    * (decode container metadata → sample frames → per-frame features).
    * The plumbing is the real thing: per-row generator fan-out, no
    * shuffle introduced before any downstream aggregate. ==STUB== the
    * decode derives frame count and per-frame signature from the
    * portable [[graft.functions.Fnv1a32]] of the payload's text twin, so
    * unlike q38's JVM-hash stub the WHOLE pipeline is DuckDB-oracled
    * (q61); a real decoder swaps into the same row shape. */
  def frameSample(docs: DataFrame, stride: Int = 4): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    docs
      .select(col("doc_id"), col("text"),
        (lit(1L) + pmod(graft.functions.HashExprs.fnv1a32("text"), lit(32L)))
          .as("n_frames"))
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        graft.functions.HashExprs
          .fnv1a32("concat(text, ':', cast(frame_idx as string))")
          .as("frame_sig"))
  }

  /** Perceptual coefficient vector for the pHash path (VERDICT r10
    * item 2): `dim` signed "block energies" per document,
    * s_j = Σ_tokens (fnv1a32(tok + ":p" + j) mod 1024 − 512).
    *
    * ==STUB== A real pipeline gets these from the decoder (DCT block
    * means of the decoded image, mel-band energies of the audio —
    * pHash's input). The stub deliberately does NOT reuse
    * [[featureStub]]'s per-payload hash: an avalanche hash has no
    * locality, so near-identical payloads would share no signal and a
    * "near-dup" operator over it degenerates to exact-dup detection
    * with extra steps. Signed token-level projections model exactly
    * the property a real decoder provides — the features move a
    * little when the content moves a little — while staying
    * fnv-derandomized and DuckDB-recomputable, which is what buys the
    * q373 gate row a FULL value oracle. A real decoder swaps in at
    * this one function; everything downstream (median threshold,
    * banding, verify) is feature-agnostic.
    *
    * Scale: one token explode + ONE map-side-combined hash-agg with
    * `dim` conditional sums (the [[graft.llm.Dedup.simhashAgg]]
    * formulation — no dim× row explosion; the shuffle carries
    * doc-grain partial sums only). */
  def perceptualCoeffs(docs: DataFrame, dim: Int = 64): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    val sums = (0 until dim).map { j =>
      sum(graft.functions.HashExprs.fnv1a32(s"concat(tok, ':p$j')")
        % 1024L - 512L).as(s"s$j")
    }
    docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' ', -1), t -> t != '')")).as("tok"))
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
  }

  /** 64-bit pHash as TWO engine-portable 32-bit words (the q19
    * two-word convention — a packed 64-bit value overflows DuckDB's
    * BIGINT when the high bit is set): bit_j = s_j &gt; (per-doc lower
    * median of the 64 coefficients). The per-IMAGE median threshold is
    * the defining pHash move (global brightness shifts cancel; here,
    * document-length effects cancel) — distinct from SimHash's
    * sign-of-vote rule. The median of 64 exact longs is the 32nd order
    * statistic: pure integer, bit-identical on any engine. Entirely
    * per-row after the coefficient agg — no extra shuffle. */
  def perceptualHash(docs: DataFrame, dim: Int = 64): DataFrame = {
    require(dim == 64, "two-word packing is fixed at 64 bits")
    val co = perceptualCoeffs(docs, dim)
    val arr = array((0 until dim).map(j => col(s"s$j")): _*)
    val withMed = co.withColumn("med",
      element_at(array_sort(arr), dim / 2))
    def word(base: Int): Column = (0 until 32).map { b =>
      when(col(s"s${base + b}") > col("med"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    withMed.select(col("doc_id"), word(32).as("ph_hi"), word(0).as("ph_lo"))
  }

  /** Perceptual near-dup pairs over the media feature path — the
    * multimodal member of the dedup family (text MinHash = q18,
    * embedding sign-LSH = q36, perceptual = this): a MULTI-INDEX
    * HAMMING band join (Norouzi, Punjani &amp; Fleet, "Fast Search in
    * Hamming Space with Multi-Index Hashing", CVPR 2012) over the two
    * pHash words generates candidates, exact bit_count(xor) verifies
    * Hamming ≤ maxDist. The 64 bits split into maxDist+1 contiguous
    * substrings, so by pigeonhole any pair within maxDist agrees
    * EXACTLY on ≥1 band — the banding is LOSSLESS at every radius
    * (q54's 4-band rule is the maxDist=3 special case), which is why
    * the q373 oracle is the BRUTE-FORCE distance join: the gate row
    * certifies losslessness, not just parity.
    *
    * Scale: the MIH cost curve is explicit — a larger radius means
    * more, shorter bands, i.e. denser buckets (band width 64/(r+1)
    * bits ⇒ ~N/2^(64/(r+1)) docs per bucket); candidates come from
    * ONE grouped shuffle on (band, bval) (the q36/prefixFilterJoin
    * discipline), buckets up to `maxBucket` expand in-task, LARGER
    * buckets spill through the lossless salted (band, bval, salt)
    * self-join so a degenerate band value (exact-dup-heavy corpora)
    * fans its quadratic step over [[graft.llm.Dedup.SpillSalts]]
    * tasks instead of dropping pairs or OOMing one task. */
  /** MIH band values: band b = bits [64b/m, 64(b+1)/m) rebuilt from
    * the two pHash words — pure integer shifts/masks, codegen-
    * friendly; for m=4 this is exactly the historical lo&amp;0xFFFF /
    * lo&gt;&gt;16 / hi&amp;0xFFFF / hi&gt;&gt;16. Shared by the
    * from-scratch pair join ([[perceptualNearDups]]), the persisted
    * store build ([[perceptualSignatureStore]]) and its probe. */
  private def mihBands(nBands: Int): Seq[Column] =
    (0 until nBands).map { b =>
      val lo = b * 64 / nBands
      val hi = (b + 1) * 64 / nBands
      (lo until hi).map { j =>
        val w = if (j < 32) col("ph_lo") else col("ph_hi")
        shiftright(w, j % 32).bitwiseAND(lit(1L)) * lit(1L << (j - lo))
      }.reduce(_ + _)
    }

  /** Per-document pHash words exploded into the maxDist+1 MIH band
    * rows: (band, bval, doc_id, ph_hi, ph_lo). Feeds both the store
    * build and the probe side of the incremental path. */
  private def bandedHash(docs: DataFrame, nBands: Int): DataFrame =
    perceptualHash(docs).select(col("doc_id"), col("ph_hi"), col("ph_lo"),
      posexplode(array(mihBands(nBands): _*)).as(Seq("band", "bval")))

  def perceptualNearDups(docs: DataFrame, maxDist: Int = 3,
                         maxBucket: Int = 10000): DataFrame = {
    import graft.llm.Dedup.SpillSalts
    require(maxDist >= 0 && maxDist < 32, "0 <= maxDist < 32")
    val nBands = maxDist + 1
    val banded = bandedHash(docs, nBands)
    val bsz = banded.groupBy("band", "bval").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > 1)
    val withSz = banded.join(bsz, Seq("band", "bval"))
    def ham(h1: Column, l1: Column, h2: Column, l2: Column): Column =
      (bit_count(h1.bitwiseXOR(h2)) + bit_count(l1.bitwiseXOR(l2)))
        .cast("long")
    val small = withSz.where(col("bsz") <= maxBucket)
      .groupBy("band", "bval")
      .agg(collect_list(struct(col("doc_id"), col("ph_hi"), col("ph_lo")))
        .as("xs"))
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        ham(col("a.ph_hi"), col("a.ph_lo"),
          col("b.ph_hi"), col("b.ph_lo")).as("hamming"))
    val big = withSz.where(col("bsz") > maxBucket)
    val bigA = big.withColumn("salt",
      pmod(hash(col("doc_id")), lit(SpillSalts)))
    val bigB = big.select(col("band"), col("bval"),
        col("doc_id").as("bid"), col("ph_hi").as("bhi"),
        col("ph_lo").as("blo"))
      .withColumn("salt", explode(sequence(lit(0), lit(SpillSalts - 1))))
    val bigPairs = bigA.join(bigB, Seq("band", "bval", "salt"))
      .where(col("doc_id") < col("bid"))
      .select(col("doc_id").as("d1"), col("bid").as("d2"),
        ham(col("ph_hi"), col("ph_lo"), col("bhi"), col("blo"))
          .as("hamming"))
    small.unionAll(bigPairs)
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** The persisted half of incremental PERCEPTUAL dedup (VERDICT r11
    * item 2 — the q75 signature-store pattern applied to the third
    * modality): each historical document's pHash words exploded into
    * the maxDist+1 MIH band rows (band, bval, doc_id, ph_hi, ph_lo),
    * written bucketed by the FULL probe key (band, bval) so the probe
    * join's store side is exchange-free. Unlike the MinHash store's
    * collect_list'd id buckets, rows stay doc-grain: the probe's
    * exact-Hamming verify needs the stored WORDS, and doc-grain rows
    * mean a degenerate band value streams through the probe join
    * (candidates are join OUTPUT, never one task's in-memory bucket),
    * so no cap is needed and the store stays pigeonhole-LOSSLESS —
    * a media pipeline must never silently skip a black-hole bucket of
    * near-identical thumbnails. */
  def perceptualSignatureStore(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, "0 <= maxDist < 32")
    bandedHash(docs, maxDist + 1)
      .select(col("band"), col("bval"), col("doc_id"),
        col("ph_hi"), col("ph_lo"))
  }

  /** Probe a NEW media batch against a persisted
    * [[perceptualSignatureStore]] — the production shape of perceptual
    * dedup (a pipeline never re-hashes its media history per crawl; it
    * keeps the banded words and probes them): hash + band ONLY the
    * batch, one equi-join on (band, bval) — with the store bucketed by
    * exactly that key its side joins exchange-free (PlanSpec-pinned),
    * shuffle volume O(batch band rows), never O(history) — then the
    * exact two-word Hamming verify. Lossless at the store's radius by
    * the MIH pigeonhole, so probe output EQUALS the brute-force
    * batch×history distance join — which is what the q392 oracle
    * recomputes end to end.
    *
    * Output: (doc_id, dup_of, hamming) — batch docs perceptually
    * near-duplicating a stored doc; anti-joining the batch on doc_id
    * gives the keep set. */
  def perceptualIncrementalNearDups(fresh: DataFrame, store: DataFrame,
                                    maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 32, "0 <= maxDist < 32")
    bandedHash(fresh, maxDist + 1)
      .join(store.select(col("band"), col("bval"),
        col("doc_id").as("dup_of"), col("ph_hi").as("shi"),
        col("ph_lo").as("slo")), Seq("band", "bval"))
      .select(col("doc_id"), col("dup_of"),
        (bit_count(col("ph_hi").bitwiseXOR(col("shi")))
          + bit_count(col("ph_lo").bitwiseXOR(col("slo"))))
          .cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Per-frame content fingerprints with LOCALITY across partially
    * overlapping media: frame i = the i-th `seg`-token window of the
    * payload's text twin, fingerprint = fnv of the joined segment.
    * ==STUB== a real decoder hashes decoded frame CONTENT; two videos
    * sharing scenes share frame hashes. [[frameSample]]'s q61 stub
    * (fnv of text:index) has no such locality — fine for the sampling
    * PLUMBING it gates, useless for dedup, which is the whole reason
    * this extractor derives the fingerprint from the SEGMENT: texts
    * that overlap partially share segment fingerprints exactly the
    * way overlapping videos share frame hashes. A real decoder swaps
    * in at this one projection. */
  def frameFingerprints(docs: DataFrame, seg: Int = 4): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
        expr("filter(split(text, ' ', -1), t -> t != '')").as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, (size(ts) + ${seg - 1}) div $seg - 1),
             |  i -> array_join(slice(ts, i * $seg + 1, $seg), ' '))"""
            .stripMargin)).as("segtxt"))
      .select(col("doc_id"),
        graft.functions.HashExprs.fnv1a32("segtxt").as("sig"))
      .distinct()
  }

  /** The persisted half of incremental VIDEO dedup (the q392 store
    * treatment applied to the frame-containment modality): each
    * historical video's distinct frame fingerprints as doc-grain
    * inverted-index rows (sig, doc_id, nf) — nf, the per-doc frame
    * count the containment score needs, rides denormalized on every
    * row so the probe never joins back to history — written bucketed
    * by the probe key `sig`, so the probe join's store side is
    * exchange-free. Lossless by construction: candidates are "shares
    * ≥1 fingerprint", exactly the inverted-index definition. */
  def frameSignatureStore(docs: DataFrame, seg: Int = 4): DataFrame = {
    val fp = frameFingerprints(docs, seg)
    val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    fp.join(nf, "doc_id").select(col("sig"), col("doc_id"), col("nf"))
  }

  /** Probe a NEW media batch against a persisted
    * [[frameSignatureStore]] — the production shape of frame-level
    * video dedup (new uploads match their sampled frame hashes
    * through the standing inverted index; nobody re-fingerprints the
    * archive per batch): fingerprint ONLY the batch, one equi-join on
    * sig (store side exchange-free — PlanSpec-pinned), ONE grouped
    * shuffle to count shared frames per (batch, history) pair, score
    * containment |shared| / min(nf_batch, nf_history) ≥ tau. Shuffle
    * volume is O(batch fingerprints + matched pairs), never
    * O(history).
    *
    * Output: (doc_id, dup_of, n_shared, nfa, nfb, containment) —
    * q388's row shape with doc_id the batch side. */
  def frameIncrementalNearDups(fresh: DataFrame, store: DataFrame,
                               seg: Int = 4, tau: Double = 0.5): DataFrame = {
    import graft.rel.Queries.femit
    val fp = frameFingerprints(fresh, seg).localCheckpoint()
    val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("nfa"))
    fp.join(store.select(col("sig"), col("doc_id").as("dup_of"),
        col("nf").as("nfb")), "sig")
      .groupBy("doc_id", "dup_of", "nfb")
      .agg(count(lit(1)).as("n_shared"))
      .join(nf, "doc_id")
      .where(col("n_shared").cast("double")
        / least(col("nfa"), col("nfb")).cast("double") >= tau)
      .select(col("doc_id"), col("dup_of"), col("n_shared"),
        col("nfa"), col("nfb"),
        femit(col("n_shared").cast("double")
          / least(col("nfa"), col("nfb")).cast("double")).as("containment"))
  }

  /** Video near-dup by frame-fingerprint CONTAINMENT — the multimodal
    * dedup family's sequence-level member (q373 matches one global
    * perceptual hash; this matches the SET of per-frame fingerprints,
    * which is how production video dedup actually runs: match sampled
    * frame hashes through an inverted index, score the overlap):
    * candidate pairs = videos sharing ≥1 fingerprint (ONE grouped
    * shuffle on sig — the inverted-index join, never pair
    * enumeration), score = |shared| / min(|A|, |B|) (containment, so
    * a clip embedded in a longer video still scores 1), emit pairs at
    * ≥ tau.
    *
    * Scale: the q36 bucket discipline — per-sig buckets ≤ maxBucket
    * expand in-task, larger ones spill through the lossless salted
    * self-join ([[graft.llm.Dedup.SpillSalts]]); the per-pair
    * hash-agg is bounded by shared-frame pairs, not video pairs. */
  def frameNearDups(docs: DataFrame, seg: Int = 4, tau: Double = 0.5,
                    maxBucket: Int = 10000): DataFrame = {
    import graft.llm.Dedup.SpillSalts
    import graft.rel.Queries.femit
    val fp = frameFingerprints(docs, seg).localCheckpoint()
    val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val bsz = fp.groupBy("sig").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > 1)
    val withSz = fp.join(bsz, "sig")
    val small = withSz.where(col("bsz") <= maxBucket)
      .groupBy("sig").agg(collect_list(col("doc_id")).as("xs"))
      .select(explode(col("xs")).as("d1"), col("xs"))
      .select(col("d1"), explode(col("xs")).as("d2"))
      .where(col("d1") < col("d2"))
    val big = withSz.where(col("bsz") > maxBucket)
    val bigA = big.withColumn("salt",
      pmod(hash(col("doc_id")), lit(SpillSalts)))
    val bigB = big.select(col("sig"), col("doc_id").as("d2"))
      .withColumn("salt", explode(sequence(lit(0), lit(SpillSalts - 1))))
    val bigPairs = bigA.join(bigB, Seq("sig", "salt"))
      .where(col("doc_id") < col("d2"))
      .select(col("doc_id").as("d1"), col("d2"))
    small.unionAll(bigPairs)
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
      .join(nf.select(col("doc_id").as("d1"), col("nf").as("nfa")), "d1")
      .join(nf.select(col("doc_id").as("d2"), col("nf").as("nfb")), "d2")
      .where(col("n_shared").cast("double")
        / least(col("nfa"), col("nfb")).cast("double") >= tau)
      .select(col("d1"), col("d2"), col("n_shared"),
        col("nfa"), col("nfb"),
        femit(col("n_shared").cast("double")
          / least(col("nfa"), col("nfb")).cast("double")).as("containment"))
  }

  /** Oracle-facing metadata projection (no stubbed values — byte/char
    * lengths are real and SQL-checkable). */
  def metadata(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("byte_len"),
      length(col("text")).cast("long").as("char_len"),
      col("lang"))
      .orderBy("doc_id")
}
