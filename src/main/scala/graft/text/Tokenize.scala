package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenization + 2-way token classification core (reference parity).
  *
  * Semantics derived from the reference corpus (see SURVEY.md §1–2):
  *  - tokens are produced by splitting a line on a single literal space
  *    (reference `HadoopWordCount.java:52`, `SparkWordCount.scala:28`);
  *    consecutive spaces yield empty tokens which match neither category
  *    and are dropped by the category filter, never pre-filtered — they
  *    still occupy a position and break co-occurrence adjacency.
  *  - every token is classified whole-match into exactly one of two
  *    disjoint categories (reference `HadoopWordCount.java:39-40`):
  *      alpha: ^[a-z-_]+$   num: ^[-+]?[0-9]+[.]{0,1}[0-9]*$
  *    Non-matching tokens (uppercase, `2.5.5`, `.5`, punctuation, "")
  *    belong to no category (`category` is NULL).
  *  - case folding is an explicit parameter: the five Hadoop jobs never
  *    lowercase, `SparkWordCount.scala:29` does (SURVEY.md §7.4a).
  *
  * Scale posture: everything here is a narrow, codegen'd projection over
  * the source rows — no shuffle is introduced before the first aggregate,
  * so the work distributes trivially across any number of executors and
  * partial aggregation (the reference's "combiner") applies downstream.
  */
object Tokenize {
  /** Alpha-word category regex — reference `HadoopWordCount.java:39`. */
  val AlphaRe = "^[a-z-_]+$"
  /** Number category regex — reference `HadoopWordCount.java:40`. We use
    * the standard variant everywhere; the `HadoopWordStripes.java:40`
    * leading-dot variant is a documented reference inconsistency
    * (SURVEY.md §2 O9) that we intentionally do not reproduce. */
  val NumRe = "^[-+]?[0-9]+[.]{0,1}[0-9]*$"

  /** Category of a token: "alpha", "num", or NULL (no category).
    * `rlike` uses java.util.regex — the same engine as the reference —
    * and the patterns are ^$-anchored, so find() ≡ full match. */
  def category(tok: Column): Column =
    when(tok.rlike(AlphaRe), "alpha").when(tok.rlike(NumRe), "num")

  /** Split a line into its token array (literal single-space delimiter,
    * keep empty tokens: limit -1 ≈ Java split except trailing empties,
    * which are category-less and therefore semantically inert). */
  def toks(text: Column, lowercase: Boolean = false): Column =
    split(if (lowercase) lower(text) else text, " ", -1)

  /** Token array zipped with per-token category:
    * array&lt;struct&lt;tok,cat&gt;&gt;. The building block for the
    * shuffle-free co-occurrence generators in [[CoOccur]]. */
  def tokCats(text: Column, lowercase: Boolean = false): Column =
    transform(toks(text, lowercase), t => struct(t.as("tok"), category(t).as("cat")))

  /** Long-form token table: (line_id, pos, tok, category), one row per
    * token, positions 0-based and dense (non-matching tokens keep their
    * position — adjacency in [[CoOccur]] is positional, as in the
    * reference where `lastWord` advances over every token,
    * `HadoopWordPairs.java:78`). */
  def tokens(lines: DataFrame, idCol: String, textCol: String,
             lowercase: Boolean = false): DataFrame =
    lines
      .select(col(idCol).as("line_id"),
        posexplode(toks(col(textCol), lowercase)).as(Seq("pos", "tok")))
      .withColumn("category", category(col("tok")))
}
