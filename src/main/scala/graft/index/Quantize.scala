package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.functions.TopK

/**
 * Int8 scalar quantization for embedding columns — the storage/bandwidth
 * scale path for vector search: a 64-dim float32 embedding (256 B + array
 * overhead) becomes 64 bytes packed binary, so a 100 TB embedding corpus
 * scans, shuffles, and caches at a quarter of the I/O, and the integer
 * dot-product kernel is exactly reproducible on ANY engine (the float
 * kernels in [[SimilarityIndex]] agree across engines only at argmax
 * granularity; the quantized scores agree BIT-FOR-BIT).
 *
 * Scheme: symmetric, single GLOBAL scale = maxabs / 127 (one corpus
 * aggregate). code_i = floor(v_i / scale + 0.5) ∈ [-127, 127] — every
 * step (cast float→double, divide, add, floor) is one correctly-rounded
 * IEEE op, so codes are identical in Spark and DuckDB. Similarity on
 * codes is integer arithmetic:
 *
 *   dot   = Σ ca_i · cb_i                  (exact BIGINT)
 *   cos_q = dot / (sqrt(na) · sqrt(nb))    (na/nb integer self-dots;
 *                                           sqrt/mul/div correctly rounded)
 *
 * A per-dimension scale would quantize tighter but turns the dot product
 * back into an order-sensitive float sum; the global scale keeps the
 * oracle-checkable exactness contract (the repo-wide design rule) at the
 * cost of ~1 bit of precision on anisotropic data.
 */
object Quantize {

  /** Global max |component| of a float-vector column — the one corpus
    * aggregate quantization needs (driver-side single-row result by
    * design, the routing-constant pattern of ivfSearchIndexed). */
  def maxAbs(df: DataFrame, vecCol: String): Double = {
    val rowMax = udf { (v: Seq[Float]) =>
      var m = 0.0; var i = 0
      if (v != null) while (i < v.length) {
        val a = math.abs(v(i).toDouble); if (a > m) m = a; i += 1
      }
      m
    }
    val r = df.agg(max(rowMax(col(vecCol)))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Int8 codes (as array<int> — see [[packCodesUdf]] for the stored
    * binary form): floor(v/scale + 0.5), in [-127, 127] by construction
    * when scale = maxAbs/127. Fails fast on a non-positive scale — an
    * all-zero (or empty) corpus has maxAbs 0, and dividing by it would
    * silently turn every code into Int.MaxValue. */
  def codesUdf(scale: Double): UserDefinedFunction = {
    require(scale > 0 && !scale.isNaN,
      s"quantization scale must be positive, got $scale — " +
        "an all-zero or empty corpus cannot be int8-quantized")
    udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val out = new Array[Int](v.length)
        var i = 0
        while (i < v.length) {
          out(i) = math.floor(v(i).toDouble / scale + 0.5).toInt
          i += 1
        }
        out
      }
    }
  }

  /** Exact integer dot product of two code arrays (BIGINT — 64 dims of
    * ±127 cannot overflow; associative, so no summation-order hazard).
    * Null in → null out (a null embedding row quantizes to null codes;
    * the `> 0` norm filters then drop it like any zero-norm row). */
  def dotUdf: UserDefinedFunction = udf { (a: Seq[Int], b: Seq[Int]) =>
    if (a == null || b == null) None
    else {
      var s = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toLong * b(i); i += 1 }
      Some(s)
    }
  }

  /** Integer self-dot (squared norm) of a code array; null-safe like
    * [[dotUdf]]. */
  def normSqUdf: UserDefinedFunction = udf { (a: Seq[Int]) =>
    if (a == null) None
    else {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i).toLong * a(i); i += 1 }
      Some(s)
    }
  }

  /** Pack int8 codes into a binary column — the at-rest form (1 byte per
    * dimension; parquet byte-array encoding compresses runs further). */
  def packCodesUdf: UserDefinedFunction = udf { (a: Seq[Int]) =>
    if (a == null) null
    else {
      val out = new Array[Byte](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i).toByte; i += 1 }
      out
    }
  }

  /** Unpack a binary code column back to array<int>. */
  def unpackCodesUdf: UserDefinedFunction = udf { (b: Array[Byte]) =>
    if (b == null) null
    else {
      val out = new Array[Int](b.length)
      var i = 0
      while (i < b.length) { out(i) = b(i).toInt; i += 1 }
      out
    }
  }

  /**
   * Brute-force top-k by QUANTIZED cosine: quantize corpus and queries
   * with one shared global scale, score every (query, corpus) pair on
   * integer dots, rank through the bounded [[TopK.topKPerGroup]]
   * aggregator. Zero-norm rows (all-zero code vectors) are excluded on
   * both sides — their cosine is 0/0.
   *
   * Scale shape: queries broadcast (an interactive probe set); the corpus
   * streams map-side through the scoring join — one pass, no corpus
   * shuffle before the bounded top-k aggregation. The float analog of
   * this shape is `SimilarityIndex.bruteForceTopK`; swap this in when
   * cross-engine score parity or 4× scan bandwidth matters more than the
   * last two cosine decimals, and compose with IVF/LSH candidate pruning
   * exactly as the float kernels do.
   */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int, scale: Double,
               corpusId: String = "vec_id", corpusVec: String = "embedding",
               queryId: String = "query_id", queryVec: String = "query_vec",
               excludeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(corpusId), codesUdf(scale)(col(corpusVec)).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    val q = queries.select(col(queryId), codesUdf(scale)(col(queryVec)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    val scored = c.join(broadcast(q),
        if (excludeSelf) col(corpusId) =!= col(queryId) else lit(true))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("cosine_q", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .select(col(queryId), col(corpusId), col("cosine_q"))
    TopK.topKPerGroup(scored, queryId, corpusId, "cosine_q", k)
  }

  /**
   * Persist a quantized copy of an embedding table: packed int8 codes +
   * a one-row `meta` (scale, dims) so every later batch quantizes with
   * the SAME scale (append parity — the minhash/IVF/BM25 stored-meta
   * precedent). Codes from different scales are not comparable; readers
   * must join scores only within one index.
   */
  def int8Build(df: DataFrame, path: String,
                idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = df.sparkSession
    val scale = maxAbs(df, vecCol) / 127.0
    df.select(col(idCol), packCodesUdf(codesUdf(scale)(col(vecCol))).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes/installment=0")
    spark.createDataFrame(Seq(Tuple1(scale))).toDF("scale")
      .write.mode("overwrite").parquet(s"$path/meta")
    // a rebuild starts a new index generation — drop the previous
    // generation's tombstones or they silently filter the new rows
    graft.store.Tombstones.clear(spark, path)
  }

  /** Quantize a new batch with the STORED scale and append it as the next
    * installment — new ids only, sequential appends (the shared
    * append-only index contract). */
  def int8Append(spark: SparkSession, path: String, newDf: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val next = graft.store.Installments.next(spark, s"$path/codes")
    int8AppendAt(spark, path, newDf, next, idCol, vecCol)
  }

  /** Append at an EXPLICIT installment — the idempotent form for
    * at-least-once writers (the bm25IndexAppendAt contract): replaying
    * the same (batch, installment) overwrites its own partition dir, so
    * retries can never duplicate codes. Callers own the numbering
    * discipline. */
  def int8AppendAt(spark: SparkSession, path: String, newDf: DataFrame,
                   installment: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    newDf.select(col(idCol), packCodesUdf(codesUdf(scale)(col(vecCol))).as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes/installment=$installment")
  }

  /**
   * IVF-SQ8 — the standard billion-scale ANN configuration (FAISS's
   * `IVF<nlist>,SQ8`): coarse k-means routing from [[SimilarityIndex]]
   * composed with this file's int8 codes. The index stores, per
   * `list_id=` partition, the PACKED codes (1 B/dim — the probe scan
   * reads a quarter of the float bytes on top of reading only probed
   * lists), plus `centroids/` (float routing table) and `meta/` (the
   * global scale):
   *
   *   - build: fit centroids on a sample, assign map-side, quantize
   *     with one global scale, write codes partitioned by list.
   *   - search: resolve probe lists driver-side (float query × float
   *     centroids — routing stays full precision), partition-pruned
   *     scan of the probed lists only, integer-dot cosine against the
   *     scale-quantized query, bounded top-k.
   *
   * Scores are the [[int8TopK]] integer kernel — bit-identical on any
   * engine; recall follows the IVF probe contract (a corpus-member
   * query probes its own list and its own code matches exactly, so
   * top1 = self deterministically).
   */
  def ivfSq8Build(corpus: DataFrame, path: String, nlist: Int = 64,
                  corpusId: String = "vec_id", corpusVec: String = "embedding",
                  fitSampleFraction: Double = 0.5,
                  storeRaw: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the fit, the scale pass, and the four writes below are
    // independent except through (centers, scale) — overlap them
    // (guide §2.6; the ivfPqBuild concurrent-fits precedent): fit ∥
    // maxAbs first, then centroids/meta/codes/raw writes concurrently.
    // All awaited before return — the on-disk contract is unchanged.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val scaleF = Future { maxAbs(corpus, corpusVec) / 127.0 }
    val centers = SimilarityIndex.fitCentroids(corpus, corpusVec, nlist,
      fitSampleFraction)
    val centroidsF = Future {
      centers.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
        .toDF("list_id", "centroid")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$path/centroids")
    }
    val scale = Await.result(scaleF, Duration.Inf)
    val metaF = Future {
      spark.createDataFrame(Seq(Tuple1(scale))).toDF("scale")
        .write.mode("overwrite").parquet(s"$path/meta")
    }
    val assigned = corpus.select(col(corpusId),
      SimilarityIndex.assignUdf(centers)(col(corpusVec)).as("list_id"),
      col(corpusVec))
    // two-level layout (the ivfBuild contract): list_id stays the top
    // partition for probe pruning; the ingest level makes appends
    // replay-idempotent and foldable
    val codesF = Future {
      assigned.select(col(corpusId), col("list_id"),
          packCodesUdf(codesUdf(scale)(col(corpusVec))).as("codes"))
        .withColumn("ingest", lit(0))
        .write.mode("overwrite").partitionBy("list_id", "ingest")
        .parquet(s"$path/codes")
    }
    // refine sidecar: the ORIGINAL float vectors, partitioned by the SAME
    // list assignment, so an exact re-rank reads only probed lists (see
    // ivfSq8SearchRefined). Costs the full-precision bytes back at rest —
    // opt in only when the refine path is wanted.
    val rawF =
      if (storeRaw) Some(Future {
        assigned.withColumn("ingest", lit(0))
          .write.mode("overwrite").partitionBy("list_id", "ingest")
          .parquet(s"$path/raw")
      })
      else None
    // settle EVERYTHING before returning (and before an error
    // propagates — Future.sequence fails fast but the residual writes
    // run to completion against a corpus frame the caller still owns)
    Await.result(Future.sequence(
      Seq(centroidsF, metaF, codesF) ++ rawF.toSeq), Duration.Inf)
    // rebuild = new generation: stale tombstones must not filter it
    graft.store.Tombstones.clear(spark, path)
  }

  private[index] def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fold new vectors in against the FROZEN centroids and scale (the
    * ivfAppend contract: map-side assignment + quantization, appends
    * into matching `list_id=` partitions, nothing re-read or rewritten;
    * re-fit with [[ivfSq8Build]] when the distribution drifts). */
  def ivfSq8Append(spark: SparkSession, path: String, newVecs: DataFrame,
                   corpusId: String = "vec_id",
                   corpusVec: String = "embedding"): Unit =
    ivfSq8AppendAt(spark, path, newVecs,
      graft.store.Installments.nextIngest(spark, s"$path/codes"),
      corpusId, corpusVec)

  /** [[ivfSq8Append]] at an EXPLICIT ingest number — the replay-
    * idempotent form (the `*AppendAt` contract): the batch lands as
    * `list_id=X/ingest=N/` dirs via DYNAMIC partition overwrite, so a
    * retry replaces exactly its own dirs — codes can never duplicate,
    * and the raw/ sidecar rides the identical numbering so it can never
    * drift out of lockstep. Callers own the numbering discipline
    * ([[graft.streaming.EventStreams.ivfSq8IngestStream]]). */
  def ivfSq8AppendAt(spark: SparkSession, path: String, newVecs: DataFrame,
                     ingest: Int, corpusId: String = "vec_id",
                     corpusVec: String = "embedding"): Unit = {
    val centers = SimilarityIndex.readCentroids(spark, path)
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val assigned = newVecs.select(col(corpusId),
      SimilarityIndex.assignUdf(centers)(col(corpusVec)).as("list_id"),
      col(corpusVec))
    assigned.select(col(corpusId), col("list_id"),
        packCodesUdf(codesUdf(scale)(col(corpusVec))).as("codes"))
      .withColumn("ingest", lit(ingest))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("list_id", "ingest")
      .parquet(s"$path/codes")
    // the build decided whether this index carries the refine sidecar; an
    // append must keep raw/ in lockstep with codes/ or refined searches
    // would silently stop seeing appended vectors
    if (dirExists(spark, s"$path/raw"))
      assigned.withColumn("ingest", lit(ingest))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("list_id", "ingest")
        .parquet(s"$path/raw")
  }

  /**
   * IVF-SQ8 index maintenance — the small-file compaction the
   * append-only contract promises (the ivfCompact/bm25IndexCompact/
   * minhashIndexCompactSizes sibling): every [[ivfSq8Append]] lands one
   * parquet file per touched `list_id=` partition, so a daily cadence
   * accumulates hundreds of small files per list and probe reads
   * degrade to file-open overhead. Rewrites the packed codes
   * hash-clustered by list (one file per list per writing task),
   * materialized fully in a side dir before an atomic delete+rename
   * swap — a concurrent search sees the old or the new layout, never a
   * mix; code bytes are untouched, so search results are bit-identical.
   * Centroids and the stored scale are not touched. Returns the
   * compacted code row count.
   */
  def ivfSq8Compact(spark: SparkSession, path: String,
                    corpusId: String = "vec_id"): Long = {
    val rows = compactListDir(spark, path, s"$path/codes", corpusId)
    // keep the refine sidecar's file layout in step with the codes it
    // shadows (same small-file accumulation per append — and the SAME
    // tombstone fold, or refined re-ranks would resurrect deleted rows)
    if (dirExists(spark, s"$path/raw"))
      compactListDir(spark, path, s"$path/raw", corpusId)
    graft.store.Tombstones.clear(spark, path)
    rows
  }

  /** Rewrite one `list_id=`-partitioned dir hash-clustered by list via the
    * atomic side-dir swap (shared by codes/ and the raw/ refine sidecar,
    * and by [[Pq.ivfPqCompact]] — the same two-level layout), dropping
    * tombstoned rows during the fold. */
  private[index] def compactListDir(spark: SparkSession, indexPath: String,
                                    dir: String, corpusId: String): Long = {
    import org.apache.hadoop.fs.Path
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "._compacting")
    graft.store.Tombstones.filter(spark, indexPath,
        spark.read.parquet(dir), corpusId)
      .withColumn("ingest", lit(0)) // the ingest history folds away
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id", "ingest")
      .parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    if (!fs.delete(out, true) || !fs.rename(tmp, out))
      throw new java.io.IOException(s"codes swap failed for $dir")
    spark.catalog.refreshByPath(dir)
    rows
  }

  /** Search a persisted [[ivfSq8Build]] index: driver-resolved probe
    * lists → partition-pruned code scan → integer-dot cosine → bounded
    * top-k. */
  def ivfSq8Search(spark: SparkSession, path: String, queries: DataFrame,
                   k: Int, nprobe: Int = 8,
                   corpusId: String = "vec_id",
                   queryId: String = "query_id",
                   queryVec: String = "query_vec"): DataFrame = {
    import spark.implicits._
    val centers = SimilarityIndex.readCentroids(spark, path)
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val qProbed = queries.withColumn("list_id",
      explode(SimilarityIndex.probeUdf(centers, nprobe)(col(queryVec))))
    val probedLists = qProbed.select("list_id").distinct().as[Int].collect()
    val q = qProbed
      .select(col(queryId), col("list_id"),
        codesUdf(scale)(col(queryVec)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    val c = graft.store.Tombstones.filter(spark, path,
        spark.read.parquet(s"$path/codes")
          .filter(col("list_id").isin(probedLists.map(_.asInstanceOf[Any]): _*)),
        corpusId)
      .select(col(corpusId), col("list_id"),
        unpackCodesUdf(col("codes")).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    val scored = c.join(broadcast(q), Seq("list_id"))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("cosine_q", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .select(col(queryId), col(corpusId), col("cosine_q"))
    TopK.topKPerGroup(scored, queryId, corpusId, "cosine_q", k)
  }

  /**
   * IVF-SQ8 search with EXACT float re-ranking — FAISS's
   * `IndexRefineFlat` composition: the packed int8 codes generate a
   * candidate pool (`candidateK` per query, quantized integer scoring
   * over the probed lists only), then the pool is re-scored against the
   * ORIGINAL float vectors from the `raw/` sidecar and cut to the final
   * top-k by exact cosine. Quantization error can only shuffle ranks
   * INSIDE the pool, so with candidateK ≫ k the result converges to the
   * exact float top-k over the probed lists — full-precision answers at
   * quantized scan cost.
   *
   * Scale shape: both scans are partition-pruned to the probed lists;
   * the candidate pool (≤ |queries|·candidateK id pairs) and the query
   * vectors broadcast into the raw read, so the corpus-sized sides never
   * shuffle. The re-rank reads float bytes for probed lists only — the
   * 4× scan saving of SQ8 still applies to the candidate-generation
   * pass, which is the one that touches every probed row.
   *
   * Requires an index built with `storeRaw = true` ([[ivfSq8Build]]);
   * fails fast otherwise.
   */
  def ivfSq8SearchRefined(spark: SparkSession, path: String, queries: DataFrame,
                          k: Int, candidateK: Int = 32, nprobe: Int = 8,
                          corpusId: String = "vec_id",
                          corpusVec: String = "embedding",
                          queryId: String = "query_id",
                          queryVec: String = "query_vec"): DataFrame = {
    require(candidateK >= k,
      s"candidateK ($candidateK) must be at least k ($k)")
    require(dirExists(spark, s"$path/raw"),
      s"$path has no raw/ refine sidecar — build with storeRaw = true " +
        "to enable refined search")
    import spark.implicits._
    val centers = SimilarityIndex.readCentroids(spark, path)
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val qProbed = queries.withColumn("list_id",
      explode(SimilarityIndex.probeUdf(centers, nprobe)(col(queryVec))))
    val probedLists = qProbed.select("list_id").distinct().as[Int].collect()
      .map(_.asInstanceOf[Any])
    // pass 1 — quantized candidate generation over the probed code lists
    val q = qProbed
      .select(col(queryId), col("list_id"),
        codesUdf(scale)(col(queryVec)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    val c = graft.store.Tombstones.filter(spark, path,
        spark.read.parquet(s"$path/codes")
          .filter(col("list_id").isin(probedLists: _*)),
        corpusId)
      .select(col(corpusId), col("list_id"),
        unpackCodesUdf(col("codes")).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    val scored = c.join(broadcast(q), Seq("list_id"))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("_cq", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .select(col(queryId), col(corpusId), col("_cq"))
    val pool = TopK.topKPerGroup(scored, queryId, corpusId, "_cq", candidateK)
      .select(col(queryId), col(corpusId))
    // pass 2 — exact float re-rank of the pool against the raw sidecar
    val raw = spark.read.parquet(s"$path/raw")
      .filter(col("list_id").isin(probedLists: _*))
      .select(col(corpusId), col(corpusVec))
    val rescored = raw
      .join(broadcast(pool), Seq(corpusId))
      .join(broadcast(queries.select(col(queryId), col(queryVec))), Seq(queryId))
      .withColumn("cosine",
        graft.functions.expressions.CosineSimilarity.cosineNative(
          col(corpusVec), col(queryVec)))
      .select(col(queryId), col(corpusId), col("cosine"))
    TopK.topKPerGroup(rescored, queryId, corpusId, "cosine", k)
  }

  /**
   * Flat-index refine — [[ivfSq8SearchRefined]]'s sidecar-free sibling
   * for the installment int8 index: the packed codes generate a
   * `candidateK` pool per query (quantized scan at 1 B/dim), then the
   * pool re-ranks by exact float cosine against the CALLER's float
   * corpus (the source-of-truth table the index was built from — no
   * raw copy stored). The candidate id pairs and query vectors
   * broadcast into the float scan, so the corpus is filtered map-side
   * and never shuffles; float bytes are touched once, for pool rows
   * only. `asOfInstallment` pins the CANDIDATE read to a snapshot; pass
   * the matching corpus slice for exact-as-of semantics.
   */
  def int8SearchRefined(spark: SparkSession, path: String, queries: DataFrame,
                        corpus: DataFrame, k: Int, candidateK: Int = 32,
                        corpusId: String = "vec_id",
                        corpusVec: String = "embedding",
                        queryId: String = "query_id",
                        queryVec: String = "query_vec",
                        asOfInstallment: Int = Int.MaxValue): DataFrame = {
    require(candidateK >= k,
      s"candidateK ($candidateK) must be at least k ($k)")
    val pool = int8SearchIndexed(spark, path, queries, candidateK,
      corpusId, queryId, queryVec, asOfInstallment)
      .select(col(queryId), col(corpusId))
    val rescored = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(pool), Seq(corpusId))
      .join(broadcast(queries.select(col(queryId), col(queryVec))), Seq(queryId))
      .withColumn("cosine",
        graft.functions.expressions.CosineSimilarity.cosineNative(
          col(corpusVec), col(queryVec)))
      .select(col(queryId), col(corpusId), col("cosine"))
    TopK.topKPerGroup(rescored, queryId, corpusId, "cosine", k)
  }

  /**
   * Incremental embedding near-dup detection against a persisted
   * [[int8Build]] index — the vector-modality sibling of
   * [[graft.dedup.Dedup.minhashIndexProbe]], and the read side of the
   * daily-ingest dedup loop: quantize the incoming batch with the STORED
   * scale, score it against the stored codes with the integer dot/norm
   * kernel, and emit every `(corpus_id, new_id, cosine_q)` pair whose
   * quantized cosine clears `threshold`.
   *
   * Exactness contract: unlike the LSH-candidate probes, there is no
   * recall caveat — every stored row is scored, and the scores are
   * [[int8TopK]]'s integer arithmetic (one double division at the end),
   * so the threshold decision reproduces bit-for-bit on any engine.
   *
   * Scale shape: the quantized batch BROADCASTS into the scoring join and
   * the stored code scan streams map-side at 1 B/dim — the corpus never
   * shuffles (the probe-path invariant). The flat scan prices each probe
   * at one read of the stored codes; when that is too much, route the
   * batch through [[ivfSq8Search]]'s partition-pruned lists instead and
   * accept the IVF recall contract. Batch ids must be NEW ids (the
   * [[int8Append]] contract); zero-norm and null batch rows pair with
   * nothing. `asOfInstallment` pins the stored side to a snapshot
   * (partition-pruned, valid between compactions).
   */
  def int8NearDupProbe(spark: SparkSession, path: String, newVecs: DataFrame,
                       threshold: Double,
                       corpusId: String = "vec_id",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       asOfInstallment: Int = Int.MaxValue): DataFrame = {
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val codes0 = spark.read.parquet(s"$path/codes")
    val codes1 = if (asOfInstallment == Int.MaxValue) codes0
      else codes0.filter(col("installment") <= asOfInstallment)
    // tombstoned rows can no longer anchor or pair (takedown semantics)
    val codes = graft.store.Tombstones.filter(spark, path, codes1, corpusId)
    val c = codes
      .select(col(corpusId).as("corpus_id"), unpackCodesUdf(col("codes")).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    val q = newVecs
      .select(col(idCol).as("new_id"), codesUdf(scale)(col(vecCol)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    c.join(broadcast(q), col("corpus_id") =!= col("new_id"))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("cosine_q", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .filter(col("cosine_q") >= threshold)
      .select(col("corpus_id"), col("new_id"), col("cosine_q"))
  }

  /**
   * Prune an incoming batch against the persisted index — the one-call
   * last mile of incremental SEMANTIC dedup (the
   * [[graft.dedup.Dedup.semanticDedup]] policy applied at ingest time):
   * a batch row is dropped when its duplicate component (transitive
   * closure over stored×batch pairs from [[int8NearDupProbe]] PLUS
   * batch-internal pairs at the same threshold) contains any STORED row
   * — the corpus already has a representative — or when it is a
   * non-minimal member of a batch-only component (keep-min, the
   * semanticDedup rule). Survivors keep the caller's schema and are what
   * [[int8Append]] should fold in.
   *
   * Scale shape: pairs are batch-bounded, so the star-contraction CC runs
   * on probe-sized data; the drop list anti-joins back ids-only
   * (`broadcastDrop = true` when the dup set is known small). The stored
   * corpus is touched only by the flat probe scan. Call
   * [[graft.dedup.Dedup.release]] on the result when the CC checkpoint
   * blocks should be freed eagerly.
   */
  def int8ProbePrune(spark: SparkSession, path: String, newVecs: DataFrame,
                     threshold: Double,
                     corpusId: String = "vec_id",
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     broadcastDrop: Boolean = false,
                     asOfInstallment: Int = Int.MaxValue): DataFrame = {
    require(!newVecs.columns.exists(_.startsWith("_ip_")),
      "int8ProbePrune reserves internal column names starting with _ip_")
    // the probe's scoring join feeds THREE consumers (the CC pair list,
    // the stored-id set, and the anchored-component flags) — materialize
    // its pair-sized result once instead of re-scoring the stored corpus
    // per consumer (the minhashIndexProbe newShingled precedent; blocks
    // are freed by [[graft.dedup.Dedup.release]] on the result)
    val stored = int8NearDupProbe(spark, path, newVecs, threshold,
      corpusId, idCol, vecCol, asOfInstallment)
      .select(col("corpus_id").as("id_a"), col("new_id").as("id_b"))
      .localCheckpoint()
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val internal = batchInternalPairs(newVecs, scale, threshold, idCol, vecCol)
    probePrunePolicy(newVecs, stored, internal, idCol, broadcastDrop)
  }

  /** Batch-internal near-dup pairs at `threshold`: the batch quantizes
    * with the STORED scale (same code space as the probe), self-scored
    * with one broadcast side — batch-sized, never corpus-sized. The
    * EXACT form (every pair scored), used by the flat prune. */
  private def batchInternalPairs(newVecs: DataFrame, scale: Double,
                                 threshold: Double, idCol: String,
                                 vecCol: String): DataFrame = {
    val q = newVecs
      .select(col(idCol).as("_ip_id"), codesUdf(scale)(col(vecCol)).as("_ip_c"))
      .withColumn("_ip_n", normSqUdf(col("_ip_c")))
      .filter(col("_ip_n") > 0)
    val qb = q.select(col("_ip_id").as("_ip_id2"), col("_ip_c").as("_ip_c2"),
      col("_ip_n").as("_ip_n2"))
    q.join(broadcast(qb), col("_ip_id") < col("_ip_id2"))
      .withColumn("_ip_dot", dotUdf(col("_ip_c"), col("_ip_c2")))
      .filter(col("_ip_dot").cast("double") /
        (sqrt(col("_ip_n").cast("double")) * sqrt(col("_ip_n2").cast("double")))
        >= threshold)
      .select(col("_ip_id").as("id_a"), col("_ip_id2").as("id_b"))
  }

  /** IVF-ROUTED batch-internal pairs — the scale form used by
    * [[ivfSq8ProbePrune]]: two batch vectors are candidates iff their
    * `nprobe` probe-list sets INTERSECT (an equi-join on probed list_id —
    * candidate volume is per-list collisions, not |batch|²; the sf1 scale
    * run showed the exact n² self-join becoming the routed prune's floor
    * once the stored side was pruned). Candidates dedup ids-only, then
    * re-score EXACTLY with the integer kernel — the prune gates which
    * pairs compete, never what a pair scores (the closestMatchHashedIds
    * guard principle). Recall matches the stored probe's contract: true
    * near-dups (cosine ≈ 1) route to the same nearest centroids, and at
    * `nprobe = nlist` every pair shares every list, so the result equals
    * [[batchInternalPairs]] exactly — the configuration the oracle pins. */
  private def batchInternalPairsRouted(newVecs: DataFrame,
                                       centers: Array[Array[Double]],
                                       scale: Double, threshold: Double,
                                       nprobe: Int, idCol: String,
                                       vecCol: String): DataFrame = {
    val q = newVecs
      .select(col(idCol).as("_ip_id"), col(vecCol).as("_ip_v"))
      .withColumn("_ip_c", codesUdf(scale)(col("_ip_v")))
      .withColumn("_ip_n", normSqUdf(col("_ip_c")))
      .filter(col("_ip_n") > 0)
    val probed = q.select(col("_ip_id"),
      explode(SimilarityIndex.probeUdf(centers, nprobe)(col("_ip_v")))
        .as("_ip_list"))
    val candidates = probed
      .join(probed.select(col("_ip_id").as("_ip_id2"), col("_ip_list")),
        Seq("_ip_list"))
      .filter(col("_ip_id") < col("_ip_id2"))
      .select("_ip_id", "_ip_id2")
      .distinct()
    val codes = q.select(col("_ip_id"), col("_ip_c"), col("_ip_n"))
    candidates
      .join(broadcast(codes), Seq("_ip_id"))
      .join(broadcast(codes.select(col("_ip_id").as("_ip_id2"),
        col("_ip_c").as("_ip_c2"), col("_ip_n").as("_ip_n2"))), Seq("_ip_id2"))
      .withColumn("_ip_dot", dotUdf(col("_ip_c"), col("_ip_c2")))
      .filter(col("_ip_dot").cast("double") /
        (sqrt(col("_ip_n").cast("double")) * sqrt(col("_ip_n2").cast("double")))
        >= threshold)
      .select(col("_ip_id").as("id_a"), col("_ip_id2").as("id_b"))
  }

  /** The anchored/keep-min ingest policy — ONE implementation shared with
    * the hamming loop, hosted at [[graft.dedup.Dedup.ingestPrunePolicy]]
    * (the r10 review's divergence warning). */
  private def probePrunePolicy(newVecs: DataFrame, stored: DataFrame,
                               internal: DataFrame, idCol: String,
                               broadcastDrop: Boolean): DataFrame =
    graft.dedup.Dedup.ingestPrunePolicy(newVecs, stored, internal, idCol,
      broadcastDrop)

  /**
   * IVF-ROUTED incremental near-dup probe — [[int8NearDupProbe]]'s scale
   * path, and the engine's answer to its one remaining scale-linear scan:
   * instead of scoring the batch against EVERY stored code, each batch
   * vector routes through the stored coarse centroids and scores only the
   * codes in its `nprobe` nearest lists (the [[ivfSq8Search]]
   * partition-pruned read — the reference's seekable-search principle,
   * ≙ SeekableGraphReader.cs:57–104: read the search path, not the
   * index). Per-batch cost is |probed lists|, not |corpus|.
   *
   * Recall contract: a near-duplicate pair is found iff the stored twin
   * lives in one of the batch vector's probed lists. True near-dups
   * (cosine ≈ 1) land in the same or adjacent lists, so recall at small
   * `nprobe` is high but NOT guaranteed — at `nprobe = nlist` every list
   * is probed and the result equals [[int8NearDupProbe]] exactly (the
   * configuration the oracle pins). Scores keep the integer-kernel
   * bit-exactness either way; only candidate coverage is approximate.
   *
   * Scale shape: the quantized batch BROADCASTS into an equi-join on
   * `list_id`; the stored side is a partition-pruned scan of the probed
   * lists only and never shuffles (the probe-path invariant). Each stored
   * row lives in exactly one list and probe lists are distinct per batch
   * vector, so no pair can be emitted twice.
   */
  def ivfSq8NearDupProbe(spark: SparkSession, path: String, newVecs: DataFrame,
                         threshold: Double, nprobe: Int = 8,
                         corpusId: String = "vec_id",
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         asOfIngest: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val centers = SimilarityIndex.readCentroids(spark, path)
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val qProbed = newVecs.select(col(idCol).as("new_id"), col(vecCol))
      .withColumn("list_id",
        explode(SimilarityIndex.probeUdf(centers, nprobe)(col(vecCol))))
    val probedLists = qProbed.select("list_id").distinct().as[Int].collect()
      .map(_.asInstanceOf[Any])
    val q = qProbed
      .select(col("new_id"), col("list_id"),
        codesUdf(scale)(col(vecCol)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    // asOfIngest pins the stored side to a fixed ingest history (the
    // second-level partition prunes alongside list_id) — what lets a
    // replayed dedup-ingest batch probe exactly what its first attempt
    // probed (see EventStreams.ivfSq8DedupIngestStream); tombstones
    // still apply in full (takedown semantics)
    val codes0 = spark.read.parquet(s"$path/codes")
      .filter(col("list_id").isin(probedLists: _*))
    val codes1 = if (asOfIngest == Int.MaxValue) codes0
      else codes0.filter(col("ingest") <= asOfIngest)
    val c = graft.store.Tombstones.filter(spark, path, codes1, corpusId)
      .select(col(corpusId).as("corpus_id"), col("list_id"),
        unpackCodesUdf(col("codes")).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    c.join(broadcast(q), Seq("list_id"))
      .filter(col("corpus_id") =!= col("new_id"))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("cosine_q", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .filter(col("cosine_q") >= threshold)
      .select(col("corpus_id"), col("new_id"), col("cosine_q"))
  }

  /**
   * IVF-routed ingest-time pruning — [[int8ProbePrune]] with the
   * [[ivfSq8NearDupProbe]] candidate pass: the batch routes through the
   * stored centroids, stored×batch pairs come from the probed lists only,
   * batch-internal pairs stay exact (the batch self-join is batch-sized
   * regardless), and the drop decision is the shared policy — anchored
   * components drop, batch-only components keep their min id. This is the
   * daily-ingest dedup loop priced at |probed lists| per batch instead of
   * |corpus|: survivors are what [[ivfSq8Append]] should fold in.
   *
   * Recall follows the probe contract above: at `nprobe = nlist` the
   * result equals the flat [[int8ProbePrune]] over the same corpus and
   * scale exactly; below that, a stored twin outside the probed lists is
   * missed and its batch copy survives (tune `nprobe` to the dedup
   * recall the pipeline needs).
   */
  def ivfSq8ProbePrune(spark: SparkSession, path: String, newVecs: DataFrame,
                       threshold: Double, nprobe: Int = 8,
                       corpusId: String = "vec_id",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       broadcastDrop: Boolean = false,
                       asOfIngest: Int = Int.MaxValue): DataFrame = {
    require(!newVecs.columns.exists(_.startsWith("_ip_")),
      "ivfSq8ProbePrune reserves internal column names starting with _ip_")
    val stored = ivfSq8NearDupProbe(spark, path, newVecs, threshold, nprobe,
      corpusId, idCol, vecCol, asOfIngest)
      .select(col("corpus_id").as("id_a"), col("new_id").as("id_b"))
      .localCheckpoint()
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    // batch-internal pairs route through the SAME probe lists (r11): the
    // exact n² self-join was the routed prune's residual floor at scale —
    // with the stored side pruned to probed lists, the batch² term
    // dominated (sf1: 1667² comparisons constant in nprobe). Routed,
    // candidate volume is per-list collisions; recall follows the probe
    // contract. At nprobe ≥ nlist every pair shares every list, so the
    // routed join devolves to all-pairs WITH an nlist-way dedup on top —
    // strictly worse than the exact broadcast form; take the exact path
    // there (identical output, the oracle-pinned configuration).
    val centers = SimilarityIndex.readCentroids(spark, path)
    val internal =
      if (nprobe >= centers.length)
        batchInternalPairs(newVecs, scale, threshold, idCol, vecCol)
      else batchInternalPairsRouted(newVecs, centers, scale,
        threshold, nprobe, idCol, vecCol)
    probePrunePolicy(newVecs, stored, internal, idCol, broadcastDrop)
  }

  /**
   * Tombstone a set of vector ids out of an [[int8Build]] index — the
   * delete half of the installment lifecycle ([[graft.store.Tombstones]]):
   * one id-list append, no data table touched. Every search/probe drops
   * tombstoned rows via a broadcast anti-join (takedown semantics — the
   * set applies to asOf snapshots too); [[int8Compact]] folds the
   * deletion physically and clears the list. Returns the deletes
   * installment written ([[int8DeleteAt]] is the replay-idempotent
   * sibling for at-least-once writers).
   */
  def int8Delete(spark: SparkSession, path: String, ids: DataFrame,
                 idCol: String = "vec_id"): Int =
    graft.store.Tombstones.append(spark, path, ids, idCol)

  /** [[int8Delete]] at an EXPLICIT deletes installment — replays
    * overwrite their own partition (the `*AppendAt` contract). */
  def int8DeleteAt(spark: SparkSession, path: String, ids: DataFrame,
                   installment: Int, idCol: String = "vec_id"): Unit =
    graft.store.Tombstones.appendAt(spark, path, ids, idCol, installment)

  /** [[int8Delete]] for an [[ivfSq8Build]] index — same sidecar, same
    * read/compact contract ([[ivfSq8Compact]] folds it). */
  def ivfSq8Delete(spark: SparkSession, path: String, ids: DataFrame,
                   idCol: String = "vec_id"): Int =
    graft.store.Tombstones.append(spark, path, ids, idCol)

  /**
   * Installment-index maintenance for [[int8Build]]/[[int8Append]] — the
   * bm25IndexCompact sibling: fold every `installment=` partition of
   * packed codes into ONE `installment=0` dir via the atomic side-dir
   * swap (a concurrent search sees the old or the new listing, never a
   * mix). Tombstoned rows are dropped during the fold and the deletes
   * list is cleared after the swap — compaction is where logical deletes
   * become physical. Surviving code bytes and the stored scale are
   * untouched, so search results are bit-identical; `asOfInstallment`
   * snapshots are only meaningful between compactions (the append
   * history folds away — the shared appendable-index contract). Returns
   * the compacted row count.
   */
  def int8Compact(spark: SparkSession, path: String,
                  corpusId: String = "vec_id"): Long = {
    import org.apache.hadoop.fs.Path
    val cPath = s"$path/codes"
    val out = new Path(cPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(cPath + "._compacting")
    graft.store.Tombstones.filter(spark, path,
        spark.read.parquet(cPath).drop("installment"), corpusId)
      .write.mode("overwrite")
      .parquet(new Path(tmp, "installment=0").toString)
    val rows = spark.read.parquet(tmp.toString).count()
    if (!fs.delete(out, true) || !fs.rename(tmp, out))
      throw new java.io.IOException(s"compaction swap failed for $cPath")
    spark.catalog.refreshByPath(cPath)
    graft.store.Tombstones.clear(spark, path)
    rows
  }

  /** Search a persisted [[int8Build]] index: unpack map-side, score with
    * the integer kernel. Queries quantize with the stored scale.
    * `asOfInstallment` pins the search to a fixed snapshot of the
    * append history (partition-pruned `installment <= asOf` read). */
  def int8SearchIndexed(spark: SparkSession, path: String, queries: DataFrame,
                        k: Int, corpusId: String = "vec_id",
                        queryId: String = "query_id",
                        queryVec: String = "query_vec",
                        asOfInstallment: Int = Int.MaxValue): DataFrame = {
    val scale = spark.read.parquet(s"$path/meta").head().getDouble(0)
    val codes0 = spark.read.parquet(s"$path/codes")
    val codes1 = if (asOfInstallment == Int.MaxValue) codes0
      else codes0.filter(col("installment") <= asOfInstallment)
    // tombstones apply to every read, snapshots included (takedown
    // semantics); a no-op on an index with no deletes dir
    val codes = graft.store.Tombstones.filter(spark, path, codes1, corpusId)
    val c = codes
      .select(col(corpusId), unpackCodesUdf(col("codes")).as("_cc"))
      .withColumn("_cn", normSqUdf(col("_cc")))
      .filter(col("_cn") > 0)
    val q = queries.select(col(queryId), codesUdf(scale)(col(queryVec)).as("_qc"))
      .withColumn("_qn", normSqUdf(col("_qc")))
      .filter(col("_qn") > 0)
    val scored = c.join(broadcast(q), lit(true))
      .withColumn("_dot", dotUdf(col("_cc"), col("_qc")))
      .withColumn("cosine_q", col("_dot").cast("double") /
        (sqrt(col("_cn").cast("double")) * sqrt(col("_qn").cast("double"))))
      .select(col(queryId), col(corpusId), col("cosine_q"))
    TopK.topKPerGroup(scored, queryId, corpusId, "cosine_q", k)
  }

  /**
   * Hard-negative mining over the persisted int8 index — the
   * similarity-mined complement to [[graft.pipeline.Sampling.negativePairs]]
   * (random negatives): for each query vector, the k MOST similar non-self
   * corpus vectors, the classic hard negatives of contrastive training
   * (in-batch-negative quality depends on exactly these; e.g. DPR,
   * Karpukhin et al. 2020 mine them with BM25/ANN). Searches k+1, drops
   * the self hit, and CLOSES THE RANK GAP (new rank = old − 1 behind the
   * self row), so the output ranking equals a direct (cosine desc, id)
   * top-k over non-self rows — including when an exact duplicate with a
   * smaller id outranks self, or self fell outside the k+1 pool entirely.
   * Bit-portable for the same reason [[int8SearchIndexed]] is: integer
   * dot/norm kernels, one double division per score.
   */
  def hardNegatives(spark: SparkSession, path: String, queries: DataFrame,
                    k: Int, corpusId: String = "vec_id",
                    queryId: String = "query_id",
                    queryVec: String = "query_vec",
                    asOfInstallment: Int = Int.MaxValue): DataFrame = {
    require(!queries.columns.contains("_hn_selfrank"),
      "hardNegatives reserves the internal column name _hn_selfrank")
    val hits = int8SearchIndexed(spark, path, queries, k + 1, corpusId,
      queryId, queryVec, asOfInstallment)
    val selfRank = hits.filter(col(corpusId) === col(queryId))
      .select(col(queryId), col("rank").as("_hn_selfrank"))
    hits.filter(col(corpusId) =!= col(queryId))
      .join(broadcast(selfRank), Seq(queryId), "left")
      .withColumn("rank",
        when(col("_hn_selfrank").isNotNull && col("rank") > col("_hn_selfrank"),
          col("rank") - 1).otherwise(col("rank")))
      .filter(col("rank") <= k)
      .drop("_hn_selfrank")
  }
}
