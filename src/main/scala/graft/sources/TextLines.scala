package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Tokenize

/** Text-file source/sink parity with the reference (SURVEY.md §2 O1, O6,
  * O12).
  *
  *  - O1: `TextInputFormat` / `sc.textFile` → [[readLines]]:
  *    `spark.read.text` plus a per-file-stable line id (the reference's
  *    byte-offset record key is only ever used as an opaque id —
  *    `HadoopWordCount.java:31` — so a monotonic id is semantically
  *    equivalent).
  *  - O6: the custom `Partitioner` routing word-keys and number-keys to
  *    different reducers ⇒ different output files
  *    (`HadoopWordCount.java:82-104`) → [[writeByCategory]]:
  *    `partitionBy("category")` produces `category=alpha/` and
  *    `category=num/` directories — same file-layout contract, handled
  *    by the writer instead of a bespoke shuffle route.
  *  - O12: `TextOutputFormat` tab-separated `key \t value`
  *    (`HadoopWordCount.java:124`) → [[writeTsv]] with `coalesce(1)`
  *    (the reference's `repartition(1)` forces an extra shuffle —
  *    `SparkWordCount.scala:40` — coalesce does not).
  */
object TextLines {

  /** O1: read text files line-by-line as (line_id, text). */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(monotonically_increasing_id().as("line_id"), col("value").as("text"))

  /** O5+O6 end-to-end: word count over text lines, written split by
    * category exactly like the reference's two reducer outputs. */
  def wordCountToDir(spark: SparkSession, in: String, out: String,
                     lowercase: Boolean = false): Unit =
    writeByCategory(
      graft.text.CoOccur.wordCount(readLines(spark, in), "text", lowercase), out)

  /** O6: categorical partition routing via the writer. */
  def writeByCategory(df: DataFrame, out: String): Unit =
    df.write.mode("overwrite").partitionBy("category").parquet(out)

  /** O12: tab-separated text sink (`key \t value` per line). */
  def writeTsv(df: DataFrame, out: String): Unit =
    df.select(concat_ws("\t", df.columns.map(col): _*).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(out)

  /** Read back a [[writeTsv]] directory as string columns `cols`. */
  def readTsv(spark: SparkSession, path: String, cols: String*): DataFrame = {
    val parts = split(col("value"), "\t")
    spark.read.text(path)
      .select(cols.zipWithIndex.map { case (c, i) =>
        element_at(parts, i + 1).as(c)
      }: _*)
  }

  /** Deterministic raw-text fixture for the end-to-end text I/O query:
    * the parquet `documents` corpus contains no numeric tokens, so the
    * reference's number category is corpus-untested without it. Content
    * exercises both categories, tokens matching neither (mixed case,
    * `2.5.5`, leading-dot `.5`, punctuation), empty tokens from double
    * spaces, and the signed/trailing-dot number edge cases
    * (`HadoopWordCount.java:39-40` regexes). */
  val FixtureLines: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with 42 dozen liquor jugs and 42 more",
    "i study in 1 luxembourg",
    "a group of 3 20 year adults with weight 2.5.5",
    "-7 +3. 0.5 .5 100 100 7",
    "MiXeD CaSe TOKENS stay OUT and so does punct-u-ation!",
    "double  space and trailing space ",
    "under_score and hyphen-word count too")

  /** Write the fixture once (idempotent — content is deterministic) and
    * return its path. Lives under target/ (build scratch, gitignored). */
  def ensureFixture(): String = {
    val p = java.nio.file.Paths.get(graft.Scratch.dir("fixture/lines.txt"))
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, FixtureLines.mkString("\n").getBytes("UTF-8"))
    }
    p.toString
  }

  /** Classify a raw token file into the reference's two categories —
    * the minimal O1→O4 pipeline as a reusable source transform. */
  def classifiedTokens(spark: SparkSession, path: String): DataFrame =
    Tokenize.tokens(readLines(spark, path), "line_id", "text")
      .where(col("category").isNotNull)

  /** ORC sink (Spark's other native columnar format — a lake that
    * standardized on ORC swaps one format string). */
  def writeOrc(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode("overwrite").orc(out)

  /** ORC source, schema pinned (same rationale as [[readJsonl]]). */
  def readOrc(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** CSV sink: RFC-4180 quoting (doubled quote as escape) + header, so
    * any other engine — including the DuckDB oracle's reader — parses
    * the same rows. */
  def writeCsv(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(out)

  /** CSV source with an EXPLICIT schema (same pinning rationale as
    * [[readJsonl]]) and multiLine for quoted embedded newlines. */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** Corrupt-tolerant CSV source: PERMISSIVE mode with the malformed
    * raw line captured in `_corrupt_record` instead of failing the job —
    * at crawl scale some fraction of records is ALWAYS malformed, and an
    * ingest that dies on the first bad byte never finishes. Callers
    * split the frame on `_corrupt_record IS NULL` (clean path) vs not
    * (quarantine path). */
  def readCsvPermissive(spark: SparkSession, path: String,
                        schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("header", "false").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Fixture for the corrupt-record query: unambiguous outcomes only —
    * three type-clean rows and one whose doc_id fails the BIGINT parse
    * (Spark's documented PERMISSIVE behavior: malformed field nulled,
    * raw line captured). */
  val CorruptCsvLines: Seq[String] =
    Seq("1,en", "2,de", "bad,fr", "9,xx")

  /** Write the corrupt-CSV fixture once (idempotent). */
  def ensureCorruptCsv(): String = {
    val p = java.nio.file.Paths.get(graft.Scratch.dir("fixture/corrupt.csv"))
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, CorruptCsvLines.mkString("\n").getBytes("UTF-8"))
    }
    p.toString
  }

  /** JSON-lines sink: one JSON object per line (the interchange format
    * a crawl/ingest pipeline hands off). Lossless for string content —
    * the writer escapes, the reader unescapes. */
  def writeJsonl(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(out)

  /** JSON-lines source with an EXPLICIT schema. Schema-on-read
    * inference is a full extra pass over the data and type-drifts with
    * content (an int-looking string column becomes bigint); a 100-TB
    * pipeline always pins the schema. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
