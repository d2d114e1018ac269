package graft.streaming

import graft.SparkTestBase
import graft.operators.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming as-of enrichment must equal the batch operator no matter how
  * the stream is sliced into micro-batches — each left row's enrichment
  * depends only on that row and the static right snapshot, so the
  * per-batch foreachBatch recipe is semantics-transparent. */
class AsofEnrichStreamSpec extends SparkTestBase {
  import spark.implicits._

  // trades (stream left): (trade_id, sym, trade ts)
  private val trades = Seq(
    (1L, "A", 10L), (2L, "A", 25L), (3L, "B", 12L),
    (4L, "B", 5L),  // before any B quote -> null payload
    (5L, "A", 20L), (6L, "C", 50L)) // C never quoted -> null payload

  // quotes (static right): (sym, quote ts, px)
  private val quotes = Seq(
    ("A", 8L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 10L, 9.5))

  test("multi-batch streamed enrichment equals the batch as-of join") {
    implicit val sqlCtx = spark.sqlContext
    val right = quotes.toDF("sym", "q_ts", "px")
    val input = MemoryStream[(Long, String, Long)]

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Option[Double])]
    val writer = EventStreams.asofEnrichStream(
      input.toDF().toDF("trade_id", "sym", "t_ts"), right,
      keyCols = Seq("sym"), leftTsCol = "t_ts", rightTsCol = "q_ts",
      payloadCols = Seq("px")) { (enriched, _) =>
      got.synchronized {
        got ++= enriched.select("trade_id", "sym", "t_ts", "px")
          .as[(Long, String, Long, Option[Double])].collect()
      }
    }
    val q = writer.start()
    // two micro-batches slicing A's trades across the quote updates —
    // batch boundaries must not change any row's enrichment
    input.addData(trades.take(3): _*)
    q.processAllAvailable()
    input.addData(trades.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val batch = AsofJoin.asofBackward(trades.toDF("trade_id", "sym", "t_ts"),
      right, Seq("sym"), "t_ts", "q_ts", Seq("px"))
      .select("trade_id", "sym", "t_ts", "px")
      .as[(Long, String, Long, Option[Double])].collect()

    assert(got.toSet === batch.toSet)
    assert(got.size === trades.size)
    // spot contract: trade 2 (A@25) sees the A@20 quote; trade 4 has none
    assert(got.find(_._1 == 2L).get._4 === Some(2.0))
    assert(got.find(_._1 == 4L).get._4 === None)
  }
}
