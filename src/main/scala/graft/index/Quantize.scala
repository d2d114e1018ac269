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
    * when scale = maxAbs/127. */
  def codesUdf(scale: Double): UserDefinedFunction = udf { (v: Seq[Float]) =>
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

  /** Exact integer dot product of two code arrays (BIGINT — 64 dims of
    * ±127 cannot overflow; associative, so no summation-order hazard). */
  def dotUdf: UserDefinedFunction = udf { (a: Seq[Int], b: Seq[Int]) =>
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toLong * b(i); i += 1 }
    s
  }

  /** Integer self-dot (squared norm) of a code array. */
  def normSqUdf: UserDefinedFunction = udf { (a: Seq[Int]) =>
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i).toLong * a(i); i += 1 }
    s
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
  }

  /** Quantize a new batch with the STORED scale and append it as the next
    * installment — new ids only, sequential appends (the shared
    * append-only index contract). */
  def int8Append(spark: SparkSession, path: String, newDf: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val codesPath = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = fs.listStatus(codesPath).map(_.getPath.getName)
      .filter(_.startsWith("installment="))
      .map(_.stripPrefix("installment=").toInt).max + 1
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
    val codes = if (asOfInstallment == Int.MaxValue) codes0
      else codes0.filter(col("installment") <= asOfInstallment)
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
}
