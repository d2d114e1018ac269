package graft.store

import graft.SparkTestBase
import java.nio.file.Files

/** Mirrors the reference's KV-store contract (DoubleTests.cs / FIXTURES A4):
  * set-semantics insert, duplicate rejection across sessions, putOrAppend
  * insertion order, sorted key scans, rank lookup. */
class KeyValueColumnSpec extends SparkTestBase {
  import spark.implicits._

  private def freshColumn(): KeyValueColumn = {
    val dir = Files.createTempDirectory("kvcol").toFile
    dir.delete()
    new KeyValueColumn(spark, dir.getAbsolutePath)
  }

  test("single write/read round-trip") {
    val col = freshColumn()
    assert(col.tryPutAll(Seq((1.5, "a")).toDF("key", "value")) === 1L)
    val got = col.get(1.5).as[(Double, String)].collect()
    assert(got.toList === List((1.5, "a")))
    col.truncate()
  }

  test("tryPutAll rejects duplicates in-batch and across sessions") {
    val col = freshColumn()
    // in-batch: 3 rows, 2 distinct keys
    assert(col.tryPutAll(Seq((1.0, "a"), (1.0, "dup"), (2.0, "b"))
      .toDF("key", "value")) === 2L)
    // cross-session: 1.0/2.0 already exist column-wide
    assert(col.tryPutAll(Seq((1.0, "x"), (3.0, "c")).toDF("key", "value")) === 1L)
    assert(col.keys().as[Double].collect().toList === List(1.0, 2.0, 3.0))
    // first writer won
    assert(col.get(1.0).as[(Double, String)].head()._2 === "a")
    col.truncate()
  }

  test("putOrAppend preserves insertion order across sessions") {
    // ≙ DoubleTests.cs:301-338: key 2.0 with values appended over 3 sessions
    val col = freshColumn()
    col.putOrAppend(Seq((2.0, 2.0)).toDF("key", "value"))
    col.putOrAppend(Seq((2.0, 3.0)).toDF("key", "value"))
    col.putOrAppend(Seq((2.0, 4.0)).toDF("key", "value"))
    val (vals, n) = col.getMany(2.0)
    assert(n === 3L)
    assert(vals.select("value").as[Double].collect().toList === List(2.0, 3.0, 4.0))
    val g = col.grouped("value")
      .select("values").as[Seq[Double]].head()
    assert(g.toList === List(2.0, 3.0, 4.0))
    col.truncate()
  }

  test("caller seq preserves strict arrival order through a shuffled batch") {
    val col = freshColumn()
    // tag arrival order, then repartition so partition order no longer
    // matches it — the stamp fallback (monotonically_increasing_id) could
    // not recover the order; the explicit seq column must
    val batch = Seq((1.0, 0L, "first"), (1.0, 1L, "second"), (1.0, 2L, "third"),
      (2.0, 0L, "solo"))
      .toDF("key", "seq", "value")
      .repartition(4)
    col.putOrAppend(batch)
    assert(col.get(1.0).select("value").as[String].collect().toList ===
      List("first", "second", "third"))
    col.truncate()
  }

  test("tryPutAll with caller seq keeps the min-seq row per key") {
    val col = freshColumn()
    val batch = Seq((1.0, 5L, "later"), (1.0, 2L, "earliest"), (2.0, 9L, "b"))
      .toDF("key", "seq", "value")
      .repartition(3)
    assert(col.tryPutAll(batch) === 2L)
    // deterministic first-writer-wins: min seq, not scan order
    assert(col.get(1.0).select("value").as[String].head() === "earliest")
    col.truncate()
  }

  test("larger batch survives write and stays sorted") {
    // page-boundary analog of DoubleTests.cs:47-167 — parquet has no page
    // limit, so assert the 513-key batch round-trips fully and key scans sort
    val col = freshColumn()
    val batch = (0 until 513).map(i => (i.toDouble, s"v$i"))
    assert(col.tryPutAll(batch.toDF("key", "value")) === 513L)
    val keys = col.keys().as[Double].collect()
    assert(keys.length === 513)
    assert(keys.toList === keys.sorted.toList)
    col.truncate()
  }

  test("keyExists and indexOf") {
    val col = freshColumn()
    col.tryPutAll(Seq((10.0, "a"), (20.0, "b"), (30.0, "c")).toDF("key", "value"))
    assert(col.keyExists(20.0))
    assert(!col.keyExists(25.0))
    assert(col.indexOf(10.0) === 0L)
    assert(col.indexOf(30.0) === 2L)
    assert(col.indexOf(25.0) === -1L)
    col.truncate()
  }

  test("get on missing key / empty column returns empty") {
    val col = freshColumn()
    assert(col.getMany(9.9)._2 === 0L)
    col.tryPutAll(Seq((1.0, "a")).toDF("key", "value"))
    assert(col.get(9.9).count() === 0L)
    assert(!col.keyExists(9.9))
    col.truncate()
  }
}
