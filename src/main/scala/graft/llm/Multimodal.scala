package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Oracle-facing metadata projection (no stubbed values — byte/char
    * lengths are real and SQL-checkable). */
  def metadata(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("byte_len"),
      length(col("text")).cast("long").as("char_len"),
      col("lang"))
      .orderBy("doc_id")
}
