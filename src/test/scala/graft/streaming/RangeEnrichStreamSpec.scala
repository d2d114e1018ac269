package graft.streaming

import graft.SparkTestBase
import graft.operators.RangeJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming range enrichment must equal the batch binned range join no
  * matter how the stream is sliced — one event's interval matches depend
  * only on that event and the static interval snapshot. */
class RangeEnrichStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 3600000000L // 1h in micros

  // static intervals: (user_id, start, end, tag)
  private lazy val intervals = Seq(
    (1L, 0L, 2 * H, "morning"), (1L, 3 * H, 5 * H, "afternoon"),
    (2L, H, 2 * H, "short"))
    .toDF("user_id", "s_us", "e_us", "tag")
    .select($"user_id", timestamp_micros($"s_us").as("w_start"),
      timestamp_micros($"e_us").as("w_end"), $"tag")

  // point events: (event_id, user_id, ts) — some outside any interval
  private val events = Seq(
    (10L, 1L, H), (11L, 1L, 4 * H), (12L, 1L, 6 * H),
    (13L, 2L, H + H / 2), (14L, 2L, 3 * H))

  private def evDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("event_id", "user_id", "t_us")
      .select($"event_id", $"user_id", timestamp_micros($"t_us").as("ts"))

  test("multi-batch streamed enrichment equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val streamDf = input.toDF().toDF("event_id", "user_id", "t_us")
      .select($"event_id", $"user_id", timestamp_micros($"t_us").as("ts"))
    val q = EventStreams.rangeEnrichStream(streamDf, intervals,
      Seq("user_id"), "w_start", "w_end", "ts") { (enriched, _) =>
      got.synchronized {
        got ++= enriched.select("event_id", "user_id", "tag")
          .as[(Long, Long, String)].collect()
      }
    }.start()
    input.addData(events.take(2): _*)
    q.processAllAvailable()
    input.addData(events.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val batch = RangeJoin.binnedRangeJoin(intervals, evDf(events),
      Seq("user_id"), "w_start", "w_end", "ts")
      .select("event_id", "user_id", "tag")
      .as[(Long, Long, String)].collect()

    assert(got.toSet === batch.toSet)
    // inner-join semantics: events 12 and 14 fall outside every interval
    assert(!got.exists(r => r._1 == 12L || r._1 == 14L))
    assert(got.map(_._1).toSet === Set(10L, 11L, 13L))
  }
}
