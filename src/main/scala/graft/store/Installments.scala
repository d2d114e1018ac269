package graft.store

import org.apache.spark.sql.SparkSession

/**
 * Shared numbering discipline for the append-only persisted indexes
 * (minhash `sets/`, BM25 `stats/`, int8 `codes/` — the `installment=N`
 * partition-dir contract). One place owns "what is the next installment",
 * so every index family fails the same way on the same broken layouts.
 */
object Installments {

  /** Next installment number for an append-only index directory: one past
    * the max existing `installment=N` child.
    *
    * An existing-but-EMPTY listing fails with a descriptive error rather
    * than silently restarting at 0: every build writes `installment=0`
    * before any append can run, so a present-but-empty directory means
    * the index was half-deleted or half-written, and renumbering from 0
    * would bury that corruption under fresh data. (The bare
    * `UnsupportedOperationException: empty.max` this replaces told the
    * operator nothing.) A MISSING directory still fails with the
    * filesystem's not-found error — also correct: appends target indexes
    * that a build already created. */
  def next(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("installment="))
      .map(_.stripPrefix("installment=").toInt)
      .reduceOption(_ max _)
      .map(_ + 1)
      .getOrElse(throw new IllegalStateException(
        s"$dir exists but contains no installment= partitions — the index " +
          "is corrupt or only partially written; rebuild it (or restore " +
          "installment=0 from backup) before appending"))
  }

  /** Next `ingest=` number for the IVF family's TWO-LEVEL layout
    * (`list_id=X/ingest=N/` — list pruning stays the top-level partition,
    * the ingest level is what makes appends replay-idempotent): one past
    * the max ingest found under ANY list dir. Same corruption contract as
    * [[next]]: a listing with list dirs but no ingest level means a
    * half-written index, never a silent restart at 0. */
  def nextIngest(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listDirs = fs.listStatus(p)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("list_id="))
    val ingests = listDirs.flatMap(ld =>
      fs.listStatus(ld.getPath).map(_.getPath.getName)
        .filter(_.startsWith("ingest="))
        .map(_.stripPrefix("ingest=").toInt))
    ingests.reduceOption(_ max _)
      .map(_ + 1)
      .getOrElse(throw new IllegalStateException(
        s"$dir exists but contains no list_id=/ingest= partitions — the " +
          "index is corrupt or only partially written; rebuild it before " +
          "appending"))
  }
}
