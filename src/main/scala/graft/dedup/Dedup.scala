package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines: exact, normalized,
 * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale design: every variant is built from codegen'd built-ins
 * (xxhash64 / array higher-order functions), shuffles exactly once on the
 * candidate key (hash or band bucket), and verifies candidates only within
 * buckets — never an all-pairs cross join. At 100 TB the band-bucket
 * explode is the only data amplification (bands × rows), and bucket joins
 * hash-partition cleanly; skewed buckets (boilerplate shingles) are handled
 * by AQE skew-split plus the `maxBucketSize` guard.
 */
object Dedup {

  // ------------------------------------------------------------- exact dedup

  /** Exact duplicate groups by content hash (md5 — portable to any engine). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one representative row per exact-duplicate group (min id wins). */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Canonical text normalization for near-exact dedup: lowercase, strip
    * non-alphanumerics, collapse whitespace. Portable (Java regex ≡ RE2). */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  // ------------------------------------------------------------ shingling

  /** Word k-shingles of the normalized text as an array<string> column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(normalized(text), " ")
    val n = size(toks)
    when(n < k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), n - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
  }

  // --------------------------------------------------------- MinHash + LSH

  /**
   * MinHash signature: numHashes independent min-hashes over the shingle
   * set, hash_i(s) = xxhash64(i, s). Pure built-ins → codegen'd, no UDF.
   */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(i, s))))

  /** Band hashes for LSH: split the signature into `bands` bands of
    * `rowsPerBand` and hash each band. */
  def bandHashes(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sigCol, b * rowsPerBand + lit(1), lit(rowsPerBand))))

  /**
   * MinHash-LSH candidate pairs with exact-Jaccard verification.
   * Pipeline: shingle → signature → band-explode → bucket self-join →
   * distinct candidate pairs → verify Jaccard on true shingle sets.
   *
   * @param maxBucketSize guard against degenerate buckets (e.g. empty/
   *        boilerplate docs all sharing a band) — buckets larger than this
   *        are dropped rather than exploded quadratically.
   */
  def minhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                            shingleK: Int = 3, numHashes: Int = 64,
                            bands: Int = 16, threshold: Double = 0.8,
                            maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val base = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = base
      .select(col("id"), posexplode(bandHashes(col("sig"), bands, rowsPerBand))
        .as(Seq("band", "bucket")))

    // bucket self-join via groupBy (one shuffle), guard huge buckets
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)

    val pairs = buckets
      .select(explode(candidatePairsExpr(col("ids"))).as("pair"))
      .select(col("pair.a").as("a"), col("pair.b").as("b"))
      .distinct()

    // verify with exact Jaccard over the true shingle sets
    val left = base.select(col("id").as("a"), col("sh").as("sh_a"))
    val right = base.select(col("id").as("b"), col("sh").as("sh_b"))
    pairs.join(left, "a").join(right, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"), col("jaccard"))
      .distinct()
  }

  /** All unordered pairs {a,b} (a<b) from an id array, as struct<a,b>. */
  private def candidatePairsExpr(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => struct(x.as("a"), y.as("b")))))
  }

  // ----------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a token multiset (pure Scala kernel). */
  def simhash64(tokens: Seq[String]): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      var h = -3750763034362895579L // FNV-1a over UTF-16
      var i = 0
      while (i < t.length) { h ^= t.charAt(i).toLong; h *= 1099511628211L; i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash column over normalized whitespace tokens (Scala UDF kernel —
    * the per-bit accumulation isn't expressible as a codegen'd built-in). */
  def simhashCol(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) 0L else simhash64(s.split(" ").toSeq))
    f(normalized(text))
  }

  /**
   * SimHash near-duplicates: hamming(simhash_a, simhash_b) <= maxHamming.
   * Candidate generation by the 4×16-bit chunk trick: pairs within hamming
   * ≤3 share at least one exact 16-bit chunk, so bucket-join on chunks and
   * verify with bit_count(a^b) — one shuffle, no cross join.
   */
  def simhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                            maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk trick is exact only for hamming <= 3 with 4 chunks")
    val base = df.select(col(idCol).as("id"), simhashCol(col(textCol)).as("sh"))
    val chunks = array((0 until 4).map(i =>
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val chunked = base.select(col("id"), col("sh"),
      posexplode(chunks).as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("chunk_idx"), col("chunk"))
    val b = chunked.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("chunk_idx"), col("chunk"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  // -------------------------------------------------- n-gram Jaccard (exact)

  /**
   * Exact n-gram Jaccard similarity join via shingle-inverted-index:
   * explode shingles → co-occurrence counts per pair → Jaccard from
   * |A∩B| and set sizes (|A∪B| = |A|+|B|-|A∩B|). One shuffle on shingle,
   * one on pair. Rare-shingle pruning keeps the index from exploding on
   * boilerplate (a shingle shared by >maxDocFreq docs cannot identify
   * near-dups anyway).
   */
  def ngramJaccardJoin(df: DataFrame, textCol: String, idCol: String,
                       shingleK: Int = 3, threshold: Double = 0.5,
                       maxDocFreq: Int = 1000): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleK)).as("sh"))
      .withColumn("setsize", size(col("sh")))
    val inverted = sets
      .select(col("id"), col("setsize"), explode(col("sh")).as("shingle"))
    val byShingle = inverted.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("setsize"))).as("docs"))
      .filter(size(col("docs")).between(2, maxDocFreq))
    val coocc = byShingle
      .select(explode(candidatePairStructs(col("docs"))).as("p"))
      .select(col("p.a_id").as("id_a"), col("p.a_size").as("size_a"),
        col("p.b_id").as("id_b"), col("p.b_size").as("size_b"))
      .groupBy("id_a", "id_b", "size_a", "size_b")
      .agg(count(lit(1)).as("inter"))
    coocc
      .withColumn("jaccard", col("inter").cast("double") /
        (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  private def candidatePairStructs(docs: Column): Column = {
    val sorted = array_sort(docs) // struct sort: by id then size — ids unique
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => struct(
        x.getField("id").as("a_id"), x.getField("setsize").as("a_size"),
        y.getField("id").as("b_id"), y.getField("setsize").as("b_size")))))
  }

  // ------------------------------------------- embedding cosine near-dup

  /**
   * Embedding near-duplicates above a cosine threshold, via random-
   * hyperplane LSH buckets + in-bucket verification. `planes` deterministic
   * pseudo-random hyperplanes are generated from xxhash64 — reproducible
   * across runs with no RNG state shipped to executors.
   */
  def embeddingNearDuplicates(df: DataFrame, vecCol: String, idCol: String,
                              dims: Int, threshold: Double = 0.95,
                              planes: Int = 16, bands: Int = 4,
                              maxBucketSize: Int = 2000): DataFrame = {
    val planesPerBand = planes / bands
    val sigBits = signBits(col(vecCol), dims, planes)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sigBits.as("bits"))
    val banded = base.select(col("id"), col("v"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("bits"), b * planesPerBand + lit(1), lit(planesPerBand)))))
        .as(Seq("band", "bucket")))
    val buckets = banded.groupBy("band", "bucket")
      .agg(collect_list(struct(col("id"), col("v"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucketSize))
    val pairs = buckets
      .select(explode(vecPairStructs(col("docs"))).as("p"))
      .select(col("p.a_id").as("id_a"), col("p.a_v").as("v_a"),
        col("p.b_id").as("id_b"), col("p.b_v").as("v_b"))
      .distinct()
    pairs
      .withColumn("cosine", graft.functions.VectorOps.cosineCol(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Sign bits of the vector against `planes` deterministic hyperplanes.
    * Plane p, dim d gets component in [-1,1) derived from xxhash64(p, d). */
  def signBits(vec: Column, dims: Int, planes: Int): Column =
    transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(zip_with(vec,
        transform(sequence(lit(0), lit(dims - 1)),
          d => (xxhash64(p, d) % 1000000L).cast("double") / 1000000.0),
        (x, h) => x * h), lit(0.0d), (acc, x) => acc + x) >= 0, lit(1)).otherwise(lit(0)))

  private def vecPairStructs(docs: Column): Column = {
    val sorted = array_sort(docs)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => struct(
        x.getField("id").as("a_id"), x.getField("v").as("a_v"),
        y.getField("id").as("b_id"), y.getField("v").as("b_v")))))
  }
}
