package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val quotes = Seq(
    (1L, ts(0), 10.0), (1L, ts(5), 11.0), (1L, ts(9), 12.0),
    (2L, ts(3), 99.0)
  ).toDF("key", "qts", "price")

  private val trades = Seq(
    (1L, ts(4), "t1"),  // latest quote at 10:00 → 10.0
    (1L, ts(5), "t2"),  // inclusive: the 10:05 quote itself → 11.0
    (1L, ts(30), "t3"), // latest overall → 12.0
    (2L, ts(2), "t4"),  // before any quote for key 2 → null
    (3L, ts(4), "t5")   // key never quoted → null
  ).toDF("key", "tts", "tag")

  test("backward as-of picks the latest right row at or before each left ts") {
    val got = AsofJoin.asofBackward(trades, quotes, Seq("key"), "tts", "qts",
        Seq("qts", "price"))
      .select($"tag", $"price").as[(String, Option[Double])]
      .collect().toMap
    assert(got === Map("t1" -> Some(10.0), "t2" -> Some(11.0),
      "t3" -> Some(12.0), "t4" -> None, "t5" -> None))
  }

  test("null keys and null timestamps never match, rows still survive") {
    val l = Seq((Some(1L), Some(ts(6)), "a"), (None, Some(ts(6)), "b"),
      (Some(1L), None, "c")).toDF("key", "tts", "tag")
    val r = Seq((Some(1L), Some(ts(0)), 5.0), (None, Some(ts(0)), 7.0))
      .toDF("key", "qts", "price")
    val got = AsofJoin.asofBackward(l, r, Seq("key"), "tts", "qts", Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(got === Map("a" -> Some(5.0), "b" -> None, "c" -> None))
  }

  test("matches a brute-force range-join + argmax oracle on random data") {
    val rnd = new scala.util.Random(13)
    val l = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i.toLong))
      .toDF("key", "lts", "lid")
    val r = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i.toLong))
      // drop duplicate (key, ts) so the winner is deterministic
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      .toDF("key", "rts", "rid")

    val got = AsofJoin.asofBackward(l, r, Seq("key"), "lts", "rts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap

    val brute = l.join(r, Seq("key"), "left")
      .filter($"rts".isNull || $"rts" <= $"lts")
      .groupBy($"lid")
      .agg(max_by(struct($"rts", $"rid"), $"rts").getField("rid").as("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    // brute's left join loses rows whose only candidates were filtered; they
    // must appear with None in both maps
    val want = l.select($"lid").as[Long].collect()
      .map(id => id -> brute.getOrElse(id, None)).toMap
    assert(got === want)
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val got = AsofJoin.asofForward(trades, quotes, Seq("key"), "tts", "qts",
        Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(got === Map(
      "t1" -> Some(11.0), // ts(4) → next quote ts(5)
      "t2" -> Some(11.0), // inclusive at ts(5)
      "t3" -> None,       // after the last quote
      "t4" -> Some(99.0), // ts(2) → key-2 quote at ts(3)
      "t5" -> None))      // key never quoted
  }

  test("forward matches a brute-force range-join + argmin oracle on random data") {
    val rnd = new scala.util.Random(17)
    val l = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i.toLong))
      .toDF("key", "lts", "lid")
    val r = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(50), rnd.nextInt(60)), i.toLong))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      .toDF("key", "rts", "rid")

    val got = AsofJoin.asofForward(l, r, Seq("key"), "lts", "rts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap

    val brute = l.join(r, Seq("key"), "left")
      .filter($"rts".isNull || $"rts" >= $"lts")
      .groupBy($"lid")
      .agg(min_by(struct($"rts", $"rid"), $"rts").getField("rid").as("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    val want = l.select($"lid").as[Long].collect()
      .map(id => id -> brute.getOrElse(id, None)).toMap
    assert(got === want)
  }

  test("forward direction: null keys and timestamps never match either") {
    // desc_nulls_first must still park null-ts left rows before any right
    // row of their key — the mirror of the backward ordering guarantee
    val l = Seq((Some(1L), Some(ts(1)), "a"), (None, Some(ts(1)), "b"),
      (Some(1L), None, "c")).toDF("key", "tts", "tag")
    val r = Seq((Some(1L), Some(ts(5)), 5.0), (None, Some(ts(5)), 7.0))
      .toDF("key", "qts", "price")
    val got = AsofJoin.asofForward(l, r, Seq("key"), "tts", "qts", Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(got === Map("a" -> Some(5.0), "b" -> None, "c" -> None))
  }

  test("composite keys match on the full key tuple only") {
    val r = Seq((1L, "x", ts(0), 10.0), (1L, "y", ts(0), 20.0),
      (2L, "x", ts(0), 30.0)).toDF("k1", "k2", "qts", "price")
    val l = Seq((1L, "x", ts(5), "a"), (1L, "y", ts(5), "b"),
      (2L, "y", ts(5), "c")).toDF("k1", "k2", "tts", "tag")
    val got = AsofJoin.asofBackward(l, r, Seq("k1", "k2"), "tts", "qts",
        Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(got === Map("a" -> Some(10.0), "b" -> Some(20.0), "c" -> None))

    // the forward branch must honor the full composite key too (quotes sit
    // BEFORE the trades, so forward finds nothing; move them after via a
    // later fixture)
    val rLate = r.withColumn("qts", lit(ts(30)))
    val fwd = AsofJoin.asofForward(l, rLate, Seq("k1", "k2"), "tts", "qts",
        Seq("price"))
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(fwd === Map("a" -> Some(10.0), "b" -> Some(20.0), "c" -> None))
  }

  test("mismatched timestamp column types are rejected, not coerced") {
    val l = Seq((1L, java.sql.Date.valueOf("2024-01-02"), "a"))
      .toDF("key", "tts", "tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, quotes, Seq("key"), "tts", "qts", Seq("price"))
    }
    assert(e.getMessage.contains("timestamp column types differ"))
  }

  test("reserved _asof_* column names are rejected on either side") {
    val l = Seq((1L, 5L, "x")).toDF("key", "tts", "_asof_tag")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, quotes, Seq("key"), "tts", "qts", Seq("price"))
    }
    assert(e.getMessage.contains("_asof_"))
    val r = Seq((1L, 5L, 1.0)).toDF("key", "_asof_ts", "price")
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades, r, Seq("key"), "tts", "_asof_ts", Seq("price"))
    }
    assert(e2.getMessage.contains("_asof_"))
  }

  test("plan is one shuffle on the key — no window funnel, no range cross join") {
    val plan = AsofJoin.asofBackward(trades, quotes, Seq("key"), "tts", "qts",
      Seq("price")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"as-of must not plan a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"as-of must not cross join:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan.toLowerCase).size >= 1)
  }
}
