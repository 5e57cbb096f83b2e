package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics goldens for the temporal joins: inclusive as-of matching,
  * tie handling, left-outer nulls, and band-join exactly-once emission
  * across cell boundaries. Plan-shape assertions live in PlanSpec. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val right = Seq(
    // (user, ts, id, value)
    (1L, 100L, 10L, 1.0),
    (1L, 200L, 11L, 2.0),
    (1L, 200L, 12L, 3.0), // tie on ts: greatest id (12) must win
    (2L, 500L, 20L, 4.0)
  ).toDF("user_id", "us", "view_id", "view_value")
    .withColumn("view_us", col("us"))

  private val left = Seq(
    (1L, 50L, 100L),  // before any right row -> null match
    (1L, 200L, 101L), // equal ts -> inclusive, id 12 wins the tie
    (1L, 999L, 102L), // after all -> latest (id 12)
    (2L, 501L, 103L), // normal match
    (3L, 700L, 104L)  // key with no right rows -> null match
  ).toDF("user_id", "us", "event_id")

  test("asofJoin: inclusive bound, greatest-id tie, left-outer nulls") {
    val out = Temporal.asofJoin(left, right, Seq("user_id"), "us", "view_id",
        Seq("view_id", "view_us", "view_value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("event_id")),
        Option(r.get(r.fieldIndex("m_view_id"))).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some(12L), 102L -> Some(12L),
      103L -> Some(20L), 104L -> None))
  }

  test("asofJoin: matched payload columns come from the SAME right row") {
    // right row id=12 has value 3.0; a per-column last() would be free
    // to mix id=12 with value from another row if fields were carried
    // separately — the struct carrier pins them together.
    val r = Temporal.asofJoin(left, right, Seq("user_id"), "us", "view_id",
        Seq("view_id", "view_us", "view_value"))
      .where(col("event_id") === 101L).head()
    assert(r.getLong(r.fieldIndex("m_view_id")) == 12L &&
      r.getDouble(r.fieldIndex("m_view_value")) == 3.0 &&
      r.getLong(r.fieldIndex("m_view_us")) == 200L)
  }

  test("bandJoin: exactly-once across cell boundaries, gap bounds, ties") {
    // width 100: pairs (1,2) gap 100 (boundary, spans cells), (2,3) gap 0
    // (tie, ordered by id once), (3,4) gap 100, (1,x)-(4,x) gap 200 excluded
    val df = Seq(
      (7L, 0L, 1L), (7L, 100L, 2L), (7L, 100L, 3L), (7L, 200L, 4L),
      (8L, 0L, 9L) // other key: no pairs
    ).toDF("user_id", "us", "event_id")
    val got = Temporal.bandJoin(df, "user_id", "us", "event_id", 100L)
      .select("a_event_id", "b_event_id", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 100L), (1L, 3L, 100L), (2L, 3L, 0L),
      (2L, 4L, 100L), (3L, 4L, 100L)))
  }

  test("bandJoin agrees with a brute-force theta join on real events") {
    val e = Queries.events(spark, sf0001)
      .withColumn("us", expr("unix_micros(ts)"))
      .select("user_id", "us", "event_id")
    val w = 600L * 1000000L
    val banded = Temporal.bandJoin(e, "user_id", "us", "event_id", w)
      .select("a_event_id", "b_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = e.select(col("user_id"), col("us").as("us1"), col("event_id").as("e1"))
    val b = e.select(col("user_id"), col("us").as("us2"), col("event_id").as("e2"))
    val brute = a.join(b, Seq("user_id"))
      .where((col("us2") - col("us1")).between(0L, w) &&
        (col("us1") < col("us2") ||
          (col("us1") === col("us2") && col("e1") < col("e2"))))
      .select("e1", "e2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute && banded.nonEmpty)
  }

  test("intervalJoin: exactly-once across cells, inclusive ends, overlap len") {
    // key 7: [0,100] x [50,120] overlap 50 (spans cells of width 40);
    // [0,100] x [100,200] touch at a point (inclusive -> overlap 0);
    // [130,140] x [50,120] disjoint; key 8 isolated from key 7
    val iv = Seq(
      (7L, 1L, 0L, 100L), (7L, 2L, 50L, 120L), (7L, 3L, 100L, 200L),
      (7L, 4L, 130L, 140L), (8L, 5L, 0L, 1000L)
    ).toDF("k", "id", "s", "e")
    val got = Temporal.intervalJoin(iv, Seq("k"), "id", "s", "e", 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((7L, 1L, 2L, 50L), (7L, 1L, 3L, 0L), (7L, 2L, 3L, 20L),
      (7L, 3L, 4L, 10L)), got.toString)
  }

  test("intervalJoin agrees with a brute-force theta join on real events") {
    val iv = Queries.events(spark, sf0001)
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("unix_micros(ts)").as("us"))
      .groupBy("user_id", "day")
      .agg(min(col("us")).as("s"), max(col("us")).as("e"))
    val got = Temporal.intervalJoin(iv, Seq("day"), "user_id", "s", "e",
        6L * 3600L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val a = iv.select(col("day"), col("user_id").as("u1"), col("s").as("s1"), col("e").as("e1"))
    val b = iv.select(col("day"), col("user_id").as("u2"), col("s").as("s2"), col("e").as("e2"))
    val brute = a.join(b, Seq("day"))
      .where(col("u1") < col("u2") && col("s1") <= col("e2") && col("s2") <= col("e1"))
      .select(col("day"), col("u1"), col("u2"),
        (least(col("e1"), col("e2")) - greatest(col("s1"), col("s2"))).as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == brute && got.nonEmpty)
  }

  test("pacfDaily: lag-1 PACF equals lag-1 ACF and replays a local Durbin-Levinson") {
    val rows = Queries.pacfDaily(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length == 6)
    val (l1, a1, p1) = rows.head
    assert(l1 == 1L && math.abs(a1 - p1) <= 1e-12)
    // all pacf in [-1, 1] up to emission rounding
    rows.foreach { case (_, a, p) =>
      assert(p.abs <= 1.0 + 1e-6 && a.abs <= 1.0 + 1e-6)
    }
    // replay the recursion locally from the emitted (rounded) acf —
    // the 6-decimal grid keeps the replay within a loose band
    val rho = rows.map(_._2)
    val phi = Array.ofDim[Double](7, 7)
    phi(1)(1) = rho(0)
    for (k <- 2 to 6) {
      val s1 = (1 until k).map(j => phi(k - 1)(j) * rho(k - 1 - j)).sum
      val s2 = (1 until k).map(j => phi(k - 1)(j) * rho(j - 1)).sum
      phi(k)(k) = (rho(k - 1) - s1) / (1.0 - s2)
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    rows.foreach { case (k, _, p) =>
      assert(math.abs(p - phi(k.toInt)(k.toInt)) <= 1e-3,
        s"lag $k: $p vs ${phi(k.toInt)(k.toInt)}")
    }
  }

  test("thetaForecast: forecast is the exact average of line and SES level") {
    val rows = Queries.thetaForecast(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == 7)
    val ses = rows.map(_._3).distinct
    assert(ses.length == 1) // level is h-invariant
    rows.foreach { case (h, tl, lz, f) =>
      assert(math.abs(f - (tl + lz) * 0.5) <= 2e-6, s"h=$h")
    }
    // trend line moves by b per step: second differences vanish
    val tls = rows.map(_._2)
    tls.sliding(3).foreach { case Array(x, y, z) =>
      assert(math.abs((z - y) - (y - x)) <= 5e-6)
    }
  }

  test("croston: dyadic SES levels sit inside the observed ranges") {
    val r = Queries.croston(spark, sf0001).collect().head
    val m = r.getAs[Long]("n_demands")
    assert(m >= 2, s"fixture must be intermittent-capable, m=$m")
    val z = r.getAs[Double]("z_level"); val q = r.getAs[Double]("q_level")
    assert(z >= 1.0 - 1e-9) // demands are counts >= 1
    assert(q >= 1.0 - 1e-9) // gaps are >= 1 day
    assert(q <= r.getAs[Long]("span_days").toDouble + 1e-9)
    val rate = r.getAs[Double]("croston_rate")
    assert(math.abs(r.getAs[Double]("sba_rate") - rate * 0.75) <= 2e-6)
  }
}
