package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-count / pairs / stripes operators (reference parity, SURVEY.md §2
  * O5, O7–O11).
  *
  * Design: co-occurrence generation happens *inside each source row* with
  * higher-order array functions (`transform`/`slice`/`filter`/`flatten`),
  * so the only shuffle in any of these plans is the final `groupBy` —
  * which Catalyst executes as partial + final HashAggregate (the
  * reference's combiner, `HadoopWordCount.java:119`, for free). At 100 TB
  * this is embarrassingly parallel: no window shuffle, no self-join, and
  * the map-side combine collapses the pair stream to the (small) distinct
  * pair vocabulary before the exchange.
  *
  * Caveat for pathological inputs: per-row generation materializes
  * O(len·m) pair structs per line. For corpora with multi-megabyte single
  * lines, [[pairsViaWindow]] (one shuffle by line, `lead(d)` per distance)
  * bounds per-row memory instead; it is semantically identical and is
  * cross-checked against the array form in the test suite.
  */
object CoOccur {
  import Tokenize.{category, tokCats}

  /** O5: per-category token frequency: (category, tok, cnt).
    * Reference: `HadoopWordCount.java:66-79` (reduce = sum of ones). */
  def wordCount(lines: DataFrame, textCol: String,
                lowercase: Boolean = false): DataFrame =
    lines
      .select(explode(tokCats(col(textCol), lowercase)).as("t"))
      .select(col("t.tok").as("tok"), col("t.cat").as("category"))
      .where(col("category").isNotNull)
      .groupBy("category", "tok")
      .agg(count(lit(1)).as("cnt"))

  /** O11: top-k tokens of one category, deterministic tiebreak
    * (cnt desc, tok asc) — reference `SparkWordCount.scala:34-35` is
    * nondeterministic on ties; SURVEY.md §7.4d adds the tiebreak.
    * Catalyst plans orderBy+limit as TakeOrderedAndProject (per-partition
    * top-k, driver merges k×partitions rows — no global sort). */
  def topK(wc: DataFrame, cat: String, k: Int): DataFrame =
    wc.where(col("category") === cat)
      .orderBy(col("cnt").desc, col("tok").asc)
      .select("tok", "cnt")
      .limit(k)

  /** Forward windowed pair array for one line: all (w1=tok[i], w2=tok[j])
    * with i &lt; j ≤ i+m, both tokens in the *same* category (cross-
    * category and category-less neighbors are skipped but still occupy
    * positions). m=1 is O7 (`HadoopWordPairs.java:30-81`), general m is
    * O8 (`HadoopWordPairs2.java:28-79`: partner indices i+1..min(i+m,
    * len-1), same-regex check at :61-62). Pairs are ordered (left:right),
    * never canonicalized, and never cross line boundaries. */
  def pairArray(text: Column, m: Int): Column = {
    val ts = tokCats(text)
    flatten(transform(ts, (x, i) =>
      transform(
        filter(slice(ts, i + lit(2), lit(m)),
          y => x("cat").isNotNull && y("cat") === x("cat")),
        y => struct(x("tok").as("w1"), y("tok").as("w2")))))
  }

  /** O7/O8 aggregated: (w1, w2, cnt) over all lines. */
  def pairs(lines: DataFrame, textCol: String, m: Int,
            lowercase: Boolean = false): DataFrame = {
    val txt = if (lowercase) lower(col(textCol)) else col(textCol)
    lines
      .select(explode(pairArray(txt, m)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equivalent pair generation via one window shuffle + lead(d) per
    * distance d ∈ 1..m — the bounded-memory alternative for corpora with
    * pathological single-line sizes (see class doc). Used by tests as an
    * independent implementation oracle for [[pairs]]. */
  def pairsViaWindow(lines: DataFrame, idCol: String, textCol: String,
                     m: Int, lowercase: Boolean = false): DataFrame = {
    val t = Tokenize.tokens(lines, idCol, textCol, lowercase)
    val w = Window.partitionBy("line_id").orderBy("pos")
    val leads = (1 to m).map(d =>
      lead(struct(col("tok"), col("category")), d).over(w).as(s"lead_$d"))
    t.select((col("tok") +: col("category") +: leads): _*)
      .select(col("tok").as("w1"), col("category").as("cat"),
        explode(array((1 to m).map(d => col(s"lead_$d")): _*)).as("y"))
      .where(col("cat").isNotNull && col("y.category") === col("cat"))
      .select(col("w1"), col("y.tok").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
  }

  /** O9/O10 exploded stripes: (word, neighbor, cnt) where cnt counts
    * occurrences of `neighbor` within m positions of `word` on EITHER
    * side, same category (`HadoopWordStripes2.java:67-107`). Stripes are
    * exactly the re-association of forward pairs run in both directions:
    * stripes(w,n) = pairsF(w,n) + pairsF(n,w). The reference reducer's
    * element-wise map merge (`HadoopWordStripes.java:129-160`) is the
    * second groupBy. We shuffle flat (word,neighbor) counts, never maps —
    * same shuffle-volume reduction as the stripes pattern, without
    * serializing MapWritable-style values (SURVEY.md §4).
    *
    * `HadoopWordStripes.java` as committed NPEs on any eligible line and
    * carries divergent regex variants (SURVEY.md §2 O9); we implement its
    * documented intent: m=1, standard category regexes. */
  def stripesExploded(lines: DataFrame, textCol: String, m: Int,
                      lowercase: Boolean = false): DataFrame = {
    val p = pairs(lines, textCol, m, lowercase)
    p.select(col("w1").as("word"), col("w2").as("neighbor"), col("cnt"))
      .unionAll(
        p.select(col("w2").as("word"), col("w1").as("neighbor"), col("cnt")))
      .groupBy("word", "neighbor")
      .agg(sum("cnt").as("cnt"))
  }

  /** O9/O10 map-typed API form: (word, stripe: map&lt;neighbor,cnt&gt;).
    * Matches the reference's emission rule: every occurrence-distinct
    * word that itself matches a category appears, *even with an empty
    * stripe* (`HadoopWordStripes2.java:108-111` writes unconditionally
    * for category words). Not part of the DuckDB oracle surface — map
    * ordering is engine-specific (FIXTURES.md §3) — covered by unit
    * goldens instead. */
  def stripesMap(lines: DataFrame, textCol: String, m: Int,
                 lowercase: Boolean = false): DataFrame = {
    val txt = if (lowercase) lower(col(textCol)) else col(textCol)
    val words = lines
      .select(explode(tokCats(txt)).as("t"))
      .where(col("t.cat").isNotNull)
      .select(col("t.tok").as("word"))
      .distinct()
    val flat = stripesExploded(lines, textCol, m, lowercase)
    words.join(flat, Seq("word"), "left")
      .groupBy("word")
      .agg(map_from_entries(
        collect_list(when(col("neighbor").isNotNull,
          struct(col("neighbor"), col("cnt"))))).as("stripe"))
  }
}
