package graft.sources

import graft.SparkSpec

class TextLinesSpec extends SparkSpec {

  test("text source -> wordcount -> category-routed sink round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.txt"),
      "i am 20\nhello hello 7 World\n")
    val lines = TextLines.readLines(spark, s"$dir/in.txt")
    assert(lines.count() == 2)

    TextLines.wordCountToDir(spark, s"$dir/in.txt", s"$dir/out")
    val alpha = spark.read.parquet(s"$dir/out/category=alpha")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val num = spark.read.parquet(s"$dir/out/category=num")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(alpha == Map("i" -> 1L, "am" -> 1L, "hello" -> 2L))
    assert(num == Map("20" -> 1L, "7" -> 1L)) // "World" matches neither
  }

  test("tsv sink writes key<TAB>value lines in one file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv").toString
    TextLines.writeTsv(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), s"$dir/out")
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.length == 1, "coalesce(1) => single part file")
    val got = scala.io.Source.fromFile(files.head).getLines().toSet
    assert(got == Set("a\t1", "b\t2"))
  }

  test("readTsv round-trips writeTsv including pair keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv-rt").toString
    val df = Seq(("am:in", 3L), ("group:of", 1L)).toDF("pair", "cnt")
    TextLines.writeTsv(df, s"$dir/out")
    val back = TextLines.readTsv(spark, s"$dir/out", "pair", "cnt")
      .collect().map(r => r.getString(0) -> r.getString(1).toLong).toSet
    assert(back == Set("am:in" -> 3L, "group:of" -> 1L))
  }

  test("fixture contains numeric-category tokens (corpus gap coverage)") {
    val wc = graft.text.CoOccur.wordCount(
      TextLines.readLines(spark, TextLines.ensureFixture()), "text")
    val byCat = wc.collect().groupBy(_.getString(0))
    assert(byCat("num").nonEmpty, "fixture must exercise the num category")
    assert(byCat("alpha").nonEmpty)
    val num = byCat("num").map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(num("42") == 2L && num("100") == 2L && num("+3.") == 1L && num("-7") == 1L)
    assert(!num.contains(".5") && !num.contains("2.5.5"), "leading-dot and multi-dot are category-less")
  }

  test("classifiedTokens drops non-category tokens but keeps positions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cls").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.txt"), "i Am 3\n")
    val rows = TextLines.classifiedTokens(spark, s"$dir/in.txt")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set((0, "i", "alpha"), (2, "3", "num")))
  }
}
