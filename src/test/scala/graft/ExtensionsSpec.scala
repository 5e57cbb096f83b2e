package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make the native functions reachable from plain
  * `spark.sql` with no imperative registration — the spark.sql.extensions
  * wiring a library user would configure. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions wires native functions into plain spark.sql") {
    val base = spark // force the shared session (and its context) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c, " +
          "shingles('a b c d', 3) AS sh, " +
          "lsh_bands(array(1.0d), 2, 4, 1) AS bands").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
      assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
      assert(r.getSeq[Long](2).length == 2)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
