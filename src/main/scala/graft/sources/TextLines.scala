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

  /** Classify a raw token file into the reference's two categories —
    * the minimal O1→O4 pipeline as a reusable source transform. */
  def classifiedTokens(spark: SparkSession, path: String): DataFrame =
    Tokenize.tokens(readLines(spark, path), "line_id", "text")
      .where(col("category").isNotNull)
}
