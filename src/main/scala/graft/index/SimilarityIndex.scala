package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/**
 * Batch similarity search over embedding columns — the Spark-native
 * delivery of the reference's vector-tree capabilities (SURVEY.md §2.4):
 *
 *  - bruteForceTopK ≙ GraphTraverser.Traverse + GraphSearcher.Search
 *    (GraphTraverser.cs:7-28, GraphSearcher.cs:12-16): exact scoring of
 *    every (query, item) pair, top-k per query.
 *  - lshTopK        ≙ GraphExtensions.ClosestMatch / SeekableGraphReader
 *    (GraphExtensions.cs:46-84, SeekableGraphReader.cs:57-104): approximate
 *    search that only touches a candidate subset (hyperplane buckets play
 *    the role of the tree path / seek offsets).
 *  - buildVocabulary / bagOfWords ≙ LexiconBuilder.BuildLexicon +
 *    Tokenizer.Tokenize + sentence-vector sum (LexiconBuilder.cs:5-18,
 *    Tokenizer.cs:16-27, GraphBuilder.cs:26-30).
 *  - validateIndex  ≙ GraphIndexValidator.ValidateIndex
 *    (GraphIndexValidator.cs:24-55): every build-corpus query must return
 *    itself at ≈ identical score.
 *
 * Scale shape: brute force broadcasts the (small) query side so the big
 * corpus never shuffles; LSH hashes both sides into band buckets — one
 * shuffle each — and scores within buckets only. Top-k per query is a
 * window over (query, score), which AQE partitions by query id.
 */
object SimilarityIndex {

  /**
   * Exact top-k: score every corpus row against every query (queries
   * broadcast — the corpus side never moves), rank per query.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "query_id", queryVec: String = "query_vec",
                     excludeSelf: Boolean = false): DataFrame = {
    val crossed = corpus.crossJoin(broadcast(queries))
    val candidates =
      if (excludeSelf) crossed.filter(col(corpusId) =!= col(queryId)) else crossed
    val scored = candidates
      .withColumn("cosine", graft.functions.expressions.CosineSimilarity.cosineNative(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(desc("cosine"), col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /**
   * Approximate top-k via random-hyperplane LSH: items sharing at least one
   * band bucket with the query are scored; others are never touched (the
   * scale path — candidate count is ~bucket-sized, not corpus-sized).
   * Recall/cost tradeoff via (planes, bands).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
              planes: Int = 16, bands: Int = 8,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    require(planes % bands == 0, "bands must divide planes")
    val ppb = planes / bands
    def banded(df: DataFrame, vec: String, keep: Seq[Column]): DataFrame = {
      val bits = graft.dedup.Dedup.signBitsUdf(dims, planes)(col(vec))
      df.select(keep :+ bits.as("bits"): _*)
        .select(keep :+ posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("bits"), b * ppb + lit(1), lit(ppb)))))
          .as(Seq("band", "bucket")): _*)
    }
    val c = banded(corpus, corpusVec, Seq(col(corpusId), col(corpusVec)))
    val q = banded(queries, queryVec, Seq(col(queryId), col(queryVec)))
    val candidates = c.join(q, Seq("band", "bucket"))
      .select(col(queryId), col(queryVec), col(corpusId), col(corpusVec))
      .distinct()
    val w = Window.partitionBy(col(queryId)).orderBy(desc("cosine"), col(corpusId))
    candidates
      .withColumn("cosine", graft.functions.expressions.CosineSimilarity.cosineNative(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  /**
   * IVF (inverted-file) approximate top-k — the clustered-data scale path
   * alongside `lshTopK`:
   *
   *   1. fit nlist k-means centroids (MLlib, fixed seed — deterministic),
   *   2. assign every corpus vector to its nearest centroid (map-side, the
   *      centroid matrix broadcasts; the corpus never shuffles for this),
   *   3. each query probes its `nprobe` nearest centroids and scores only
   *      vectors in those lists.
   *
   * At 100 TB: fit on a sample (`fitSampleFraction`), persist assignments
   * partitioned by `list_id` so a query touches only matching partitions —
   * the Spark analog of the reference reading only the nodes on the search
   * path (SeekableGraphReader.cs:57-104).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 64, nprobe: Int = 8,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "query_id", queryVec: String = "query_vec",
              fitSampleFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vectors => MLVectors}
    val spark = corpus.sparkSession
    val toVec = udf((a: Seq[Float]) =>
      MLVectors.dense(a.map(_.toDouble).toArray))
    val trainBase = corpus.select(toVec(col(corpusVec)).as("features"))
    val train = if (fitSampleFraction < 1.0)
      trainBase.sample(withReplacement = false, fitSampleFraction, seed = 42L)
    else trainBase
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").fit(train)
    val centers: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centers)

    def sqDist(v: Seq[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
      s
    }
    val assignUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < cs.length) {
        val d = sqDist(v, cs(j)); if (d < bestD) { bestD = d; best = j }; j += 1
      }
      best
    }
    val probeUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map(j => (sqDist(v, cs(j)), j)).sorted
        .take(math.min(nprobe, cs.length)).map(_._2).toArray
    }
    val cAssigned = corpus.withColumn("list_id", assignUdf(col(corpusVec)))
    val qProbed = queries.withColumn("list_id", explode(probeUdf(col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(desc("cosine"), col(corpusId))
    cAssigned.join(qProbed, Seq("list_id"))
      .withColumn("cosine", graft.functions.expressions.CosineSimilarity.cosineNative(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rank"))
  }

  // ------------------------------------------------- vocab / bag-of-words

  /**
   * Dense word→index vocabulary from a corpus of `;`-separated sentences
   * (≙ LexiconBuilder: first-seen order becomes a stable sorted order here —
   * alphabetical, since "first seen" is meaningless under parallel scan).
   */
  def buildVocabulary(sentences: DataFrame, textCol: String = "sentence",
                      sep: String = ";"): DataFrame = {
    val words = sentences
      .select(explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
    // two-phase distributed rank — no single-partition global window
    graft.store.Ranks.withOrderedIndex(words, "word", "index")
      .withColumn("index", col("index").cast("int"))
  }

  /**
   * Bag-of-words sentence vectors against a vocabulary: unknown words are
   * skipped (≙ Tokenizer.cs:16-27), counts summed (≙ GraphBuilder.cs:26-30).
   * Output: (id, sentence, indices array<int>, counts array<double>) sparse form.
   */
  def bagOfWords(sentences: DataFrame, vocab: DataFrame,
                 idCol: String = "id", textCol: String = "sentence",
                 sep: String = ";"): DataFrame = {
    // token rows and both aggregations carry the numeric id only — the
    // sentence string joins back at the end instead of riding two shuffles
    val toks = sentences.select(col(idCol),
      explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("word"))
    val grouped = toks.join(vocab, Seq("word")) // inner join drops unknown words
      .groupBy(col(idCol), col("index"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("index"), col("cnt")))),
          x => x.getField("index")).as("indices"),
        transform(array_sort(collect_list(struct(col("index"), col("cnt")))),
          x => x.getField("cnt")).as("counts"))
    // sentences whose every token is unknown still get a (zero) vector —
    // exhaustive closestMatch ranks them at score 0 instead of losing them.
    // (closestMatchInverted documents its own contract: zero-overlap
    // queries return no row, since only shared dims generate candidates.)
    sentences.select(col(idCol), col(textCol))
      .join(grouped, Seq(idCol), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("indices"), array().cast("array<int>")).as("indices"),
        coalesce(col("counts"), array().cast("array<double>")).as("counts"))
  }

  /** Sparse cosine over (indices, counts) pairs — for BoW vectors. */
  private val sparseCos = udf(
    (ia: Seq[Int], va: Seq[Double], ib: Seq[Int], vb: Seq[Double]) =>
      VectorOps.cosineSparse(ia.toArray, va.toArray, ib.toArray, vb.toArray))

  /**
   * Closest match of each query sentence against the indexed corpus
   * (≙ GraphService.Search → ClosestMatch): exact top-1 by cosine.
   */
  def closestMatch(indexed: DataFrame, queries: DataFrame): DataFrame = {
    val idx = indexed.select(col("id").as("corpus_id"),
      col("sentence").as("corpus_sentence"),
      col("indices").as("c_idx"), col("counts").as("c_cnt"))
    val q = queries.select(col("id").as("query_id"),
      col("sentence").as("query_sentence"),
      col("indices").as("q_idx"), col("counts").as("q_cnt"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col("corpus_id"))
    idx.crossJoin(broadcast(q))
      .withColumn("score", sparseCos(col("c_idx"), col("c_cnt"), col("q_idx"), col("q_cnt")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("query_id"), col("query_sentence"),
        col("corpus_id"), col("corpus_sentence"), col("score"))
  }

  /**
   * Scale path for closestMatch: sparse cosine via an inverted-index join
   * on shared vocabulary indices instead of a crossJoin — dot(q,c) =
   * Σ cnt_q·cnt_c over shared dims, norms precomputed per side. Candidates
   * are only (query, corpus) pairs sharing ≥1 word, so the shuffle is
   * proportional to real term overlap, not |corpus|×|queries|. Queries with
   * zero vocabulary overlap (score would be 0 everywhere) return no row.
   */
  def closestMatchInverted(indexed: DataFrame, queries: DataFrame): DataFrame = {
    // token rows carry ids only — sentences would otherwise ride every
    // per-dim shuffle row; they join back after the top-1 cut
    def toks(df: DataFrame, idAs: String, cntAs: String): DataFrame =
      df.select(col("id").as(idAs),
        explode(arrays_zip(col("indices"), col("counts"))).as("z"))
        .select(col(idAs), col("z.indices").as("dim"), col("z.counts").as(cntAs))
    def norms(df: DataFrame, idAs: String, normAs: String): DataFrame =
      df.select(col("id").as(idAs),
        sqrt(aggregate(col("counts"), lit(0.0d), (acc, x) => acc + x * x)).as(normAs))

    val dots = toks(indexed, "corpus_id", "cnt_c")
      .join(toks(queries, "query_id", "cnt_q"), Seq("dim"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("cnt_c") * col("cnt_q")).as("dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("score"), col("corpus_id"))
    dots
      .join(norms(indexed, "corpus_id", "norm_c"), "corpus_id")
      .join(norms(queries, "query_id", "norm_q"), "query_id")
      .withColumn("score",
        when(col("norm_c") === 0.0 || col("norm_q") === 0.0, lit(0.0))
          .otherwise(col("dot") / (col("norm_c") * col("norm_q"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .join(queries.select(col("id").as("query_id"),
        col("sentence").as("query_sentence")), "query_id")
      .join(indexed.select(col("id").as("corpus_id"),
        col("sentence").as("corpus_sentence")), "corpus_id")
      .select(col("query_id"), col("query_sentence"),
        col("corpus_id"), col("corpus_sentence"), col("score"))
  }

  /**
   * ≙ GraphIndexValidator: re-query the build corpus; every sentence must
   * find itself (or an identical-vector twin) at score ≈ identicalAngle.
   * Returns rows that FAIL the check (empty result = index is valid).
   */
  def validateIndex(indexed: DataFrame, identicalAngle: Double = 0.99,
                    precision: Double = 0.01): DataFrame =
    closestMatch(indexed, indexed)
      .filter(col("score") < identicalAngle - precision)
}
