package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The tombstone sidecar's own contracts: schema-hinted empty reads,
  * strictly-before ledger reads, and the self-enforcing liveOnly guard
  * (double-delete nets zero, crash replay recomputes in full). */
class TombstonesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tomb").toString

  test("read honors the caller's id-type hint when no delete has landed") {
    val path = tmp()
    assert(Tombstones.read(spark, path).schema("id").dataType === LongType)
    assert(Tombstones.read(spark, path, StringType)
      .schema("id").dataType === StringType)
    assert(Tombstones.read(spark, path, StringType).count() === 0)
  }

  test("filter derives the empty-read type from the stored side") {
    val path = tmp()
    // string-keyed stored side, one delete landed: the anti-join must
    // type-match (a hardcoded LongType would mismatch or miscompare)
    Tombstones.append(spark, path, Seq("b").toDF("k"), "k")
    val stored = Seq("a", "b", "c").toDF("k")
    val kept = Tombstones.filter(spark, path, stored, "k")
      .as[String].collect().toSet
    assert(kept === Set("a", "c"))
  }

  test("readBefore excludes the given installment and everything after") {
    val path = tmp()
    Tombstones.appendAt(spark, path, Seq(1L).toDF("id"), "id", 0)
    Tombstones.appendAt(spark, path, Seq(2L).toDF("id"), "id", 1)
    Tombstones.appendAt(spark, path, Seq(3L).toDF("id"), "id", 2)
    assert(Tombstones.readBefore(spark, path, 0).count() === 0)
    assert(Tombstones.readBefore(spark, path, 2)
      .as[Long].collect().toSet === Set(1L, 2L))
    // full set through read()
    assert(Tombstones.read(spark, path)
      .as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("liveOnly: double-delete contributes nothing, replay keeps its ids") {
    val path = tmp()
    Tombstones.appendAt(spark, path, Seq(1L, 2L).toDF("id"), "id", 0)
    val batch = Seq(2L, 3L).toDF("id")
    // a NEW delete at installment 1 sees 2 already tombstoned → only 3
    assert(Tombstones.liveOnly(spark, path, batch, "id", 1)
      .as[Long].collect().toSet === Set(3L))
    // a REPLAY of installment 0 excludes its own partition → full batch
    assert(Tombstones.liveOnly(spark, path, Seq(1L, 2L).toDF("id"), "id", 0)
      .as[Long].collect().toSet === Set(1L, 2L))
  }
}
