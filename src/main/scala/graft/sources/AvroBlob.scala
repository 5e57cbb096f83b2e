package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Avro Object-Container-File sink/source built directly on the public
  * avro-core API (`org.apache.avro.file.{DataFileWriter,DataFileReader}`
  * — the spark-avro connector is not on this classpath, and the OCF
  * layer is the part a pipeline meeting `.avro` drops actually needs):
  * completes the interchange-format family (q50 JSON, q57 CSV, q62 ORC,
  * q243 XML) under the same lossless-oracle contract.
  *
  * Scale: one OCF per input partition, written/streamed entirely
  * executor-side (`foreachPartition` / per-file record iterator — the
  * shape every distributed Avro sink and source uses); the driver
  * touches only the O(files) name list. Deflate codec: JDK-native, no
  * extra dependency, and OCF blocks stay independently decodable.
  *
  * Ref: the reference has no Avro surface — extension operator in the
  * E-interchange family.
  */
object AvroBlob {

  /** Avro record schema of the (doc_id, lang, text) projection the
    * round trip carries (a string literal so executor lambdas capture
    * text, not this module). */
  val DocSchemaJson: String =
    """{"type":"record","name":"Doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"lang","type":"string"},
      |{"name":"text","type":"string"}]}""".stripMargin

  /** Write `df`'s (doc_id, lang, text) projection as one Avro OCF per
    * non-empty partition under `outDir` (cleared first — rerun
    * idempotence, the Scratch-dir convention). */
  def writeAvro(df: DataFrame, outDir: String): Unit = {
    val dirPath = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dirPath)
    val old = dirPath.toFile.listFiles()
    if (old != null) old.filter(f => f.getName.endsWith(".avro")
      || f.getName.endsWith(".avro.tmp")).foreach(_.delete())
    val schemaJson = DocSchemaJson
    val out = outDir
    df.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("text"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
          val tc = org.apache.spark.TaskContext.get()
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val attempt = if (tc == null) 0L else tc.taskAttemptId()
          val w = new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema)
          val fw = new org.apache.avro.file.DataFileWriter(w)
          fw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
          // ADVICE r14: task-commit discipline — write an
          // attempt-unique temp file and atomically rename on success,
          // so a retry or speculative duplicate never interleaves with
          // an in-flight attempt's bytes (last committed rename wins)
          val fin = new java.io.File(f"$out/part-$pid%05d.avro")
          val tmp = new java.io.File(
            f"$out/.part-$pid%05d-a$attempt%d.avro.tmp")
          fw.create(schema, tmp)
          var ok = false
          try {
            it.foreach { r =>
              val rec = new org.apache.avro.generic.GenericData.Record(schema)
              rec.put("doc_id", r.getLong(0))
              rec.put("lang", r.getString(1))
              rec.put("text", r.getString(2))
              fw.append(rec)
            }
            ok = true
          } finally {
            fw.close()
            if (ok) java.nio.file.Files.move(tmp.toPath, fin.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            else tmp.delete()
          }
        }
      }
  }

  /** EVOLVED reader schema (q447): drops `text`, adds a defaulted
    * `quality` — the two Avro schema-resolution moves a consumer makes
    * when the producer's schema marches ahead (spec: "Schema
    * Resolution" — reader fields absent from the writer take their
    * default; writer fields absent from the reader are skipped
    * without decoding). */
  val DocReaderSchemaJson: String =
    """{"type":"record","name":"Doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"lang","type":"string"},
      |{"name":"quality","type":"long","default":-1}]}""".stripMargin

  /** Read `.avro` OCFs written under [[DocSchemaJson]] through the
    * EVOLVED reader schema — avro-core performs the resolution (the
    * skipped `text` field is never materialized; `quality` comes from
    * its default). */
  def readAvroEvolved(spark: SparkSession, dir: String): DataFrame = {
    val files = avroFiles(dir)
    val readerJson = DocReaderSchemaJson
    import spark.implicits._
    spark.createDataset(files.toSeq)
      .repartition(math.max(files.length, 1))
      .flatMap { path =>
        val reader = new org.apache.avro.Schema.Parser().parse(readerJson)
        val rdr = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]()
        rdr.setExpected(reader)
        val dfr = new org.apache.avro.file.DataFileReader(
          new java.io.File(path), rdr)
        closeAtTaskEnd(dfr)
        new Iterator[(Long, String, Long)] {
          def hasNext: Boolean = {
            val h = dfr.hasNext
            if (!h) dfr.close()
            h
          }
          def next(): (Long, String, Long) = {
            val r = dfr.next()
            (r.get("doc_id").asInstanceOf[Long], r.get("lang").toString,
              r.get("quality").asInstanceOf[Long])
          }
        }
      }.toDF("doc_id", "lang", "quality")
  }

  /** File list of an OCF directory, FAILING FAST when the directory is
    * missing or holds no `.avro` files (ADVICE r14: an empty DataFrame
    * here silently reads as "zero rows written", masking a wrong
    * path). */
  private def avroFiles(dir: String): Seq[String] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    files.toSeq
  }

  /** Close the per-file reader at task end even when a consumer stops
    * before exhaustion (a `limit` head abandons the iterator mid-file
    * — ADVICE r14); the exhaustion-path close stays for eager release,
    * double-close is a no-op on the underlying channel. */
  private def closeAtTaskEnd(c: java.io.Closeable): Unit =
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => c.close()))

  /** Read every `.avro` OCF under `dir` back as a (doc_id, lang, text)
    * DataFrame — one task per file, records streamed (never the whole
    * file as one object). `DataFileReader` itself verifies the OCF
    * magic and per-block sync markers, so corruption fails loudly. */
  def readAvro(spark: SparkSession, dir: String): DataFrame = {
    val files = avroFiles(dir)
    val schemaJson = DocSchemaJson
    import spark.implicits._
    spark.createDataset(files.toSeq)
      .repartition(math.max(files.length, 1))
      .flatMap { path =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val rdr = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](schema)
        val dfr = new org.apache.avro.file.DataFileReader(
          new java.io.File(path), rdr)
        closeAtTaskEnd(dfr)
        new Iterator[(Long, String, String)] {
          def hasNext: Boolean = {
            val h = dfr.hasNext
            if (!h) dfr.close()
            h
          }
          def next(): (Long, String, String) = {
            val r = dfr.next()
            (r.get("doc_id").asInstanceOf[Long],
              r.get("lang").toString, r.get("text").toString)
          }
        }
      }.toDF("doc_id", "lang", "text")
  }
}
