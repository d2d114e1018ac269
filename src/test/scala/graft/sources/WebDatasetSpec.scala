package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WebDatasetSpec extends SparkTestBase {
  import spark.implicits._

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("tar round-trips members, plain and gzip, incl. GNU long names") {
    val longDir = "deep/" + ("x" * 120)
    val entries = Seq(
      ("d/000001.txt", "hello tar".getBytes(utf8)),
      ("d/000001.json", """{"id":1}""".getBytes(utf8)),
      (s"$longDir/000002.txt", "long-name member".getBytes(utf8)),
      ("blob", Array.tabulate[Byte](1500)(i => (i * 13 % 251).toByte)))
    for (gz <- Seq(false, true)) {
      val got = WebDataset.parseTar(WebDataset.encodeTar(entries, gz))
      assert(got.map(_.name) === entries.map(_._1), s"gz=$gz")
      got.zip(entries).foreach { case (e, (_, b)) =>
        assert(e.bytes.toSeq === b.toSeq, s"${e.name} gz=$gz")
      }
    }
  }

  test("zstd shards parse like gzip ones (.tar.zst, the modern packaging)") {
    val entries = Seq(
      ("z/000.txt", "zstd payload".getBytes(utf8)),
      ("z/000.json", """{"z":true}""".getBytes(utf8)))
    val plain = WebDataset.encodeTar(entries)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(plain)
    z.close()
    val got = WebDataset.parseTar(bos.toByteArray)
    assert(got.map(_.name) === entries.map(_._1))
    assert(new String(got.head.bytes, utf8) === "zstd payload")
    // corrupt zstd: None path, no throw
    val bad = bos.toByteArray
    bad(bad.length / 2) = 0x11
    WebDataset.parseTar(bad)
  }

  test("tolerates corruption: checksum flip, truncation, garbage") {
    val tar = WebDataset.encodeTar(Seq(
      ("a.txt", "aaa".getBytes(utf8)),
      ("b.txt", "bbb".getBytes(utf8))))
    assert(WebDataset.parseTar(tar).length === 2)
    // flip a byte in the SECOND header: first member survives, walk stops
    val bad = tar.clone()
    bad(1024 + 50) = 0x7F // second header starts at 1024 (3-byte a.txt pads to 512)
    assert(WebDataset.parseTar(bad).map(_.name) === Seq("a.txt"))
    assert(WebDataset.parseTar(java.util.Arrays.copyOf(tar, 700))
      .map(_.name) === Seq("a.txt"), "truncated mid-second-header")
    assert(WebDataset.parseTar(java.util.Arrays.copyOf(tar, 300)).isEmpty,
      "truncated mid-first-data")
    assert(WebDataset.parseTar(Array.fill[Byte](1024)(0x55)).isEmpty)
    assert(WebDataset.parseTar(Array.emptyByteArray).isEmpty)
    assert(WebDataset.parseTar(null).isEmpty)
  }

  test("samples group by contiguous key; dirs and pax entries skip") {
    val png = graft.multimodal.Multimodal.encodePng(9, 8,
      Array.tabulate(9 * 8 * 3)(i => (i * 5 % 256).toByte))
    val tar = WebDataset.encodeTar(Seq(
      ("s/000.json", """{"k":0}""".getBytes(utf8)),
      ("s/000.png", png),
      ("s/000.cls.txt", "label".getBytes(utf8)), // multi-dot ext
      ("s/001.json", """{"k":1}""".getBytes(utf8)),
      ("s/001.png", png)))
    val samples = WebDataset.webdatasetSamples(
      Seq((0L, tar)).toDF("g", "payload")).collect()
    assert(samples.map(_.key).toSeq === Seq("s/000", "s/001"))
    assert(samples(0).parts.keySet === Set("json", "png", "cls.txt"))
    assert(samples(1).parts.keySet === Set("json", "png"))
    // the image member decodes through the real codec chain
    val Some((w, h, _)) =
      graft.multimodal.Multimodal.decodeFirstFrame(samples(0).parts("png"))
    assert((w, h) === (9, 8))
    // no shuffle in the plan: contiguity makes grouping map-side
    val plan = WebDataset.webdatasetSamples(Seq((0L, tar)).toDF("g", "payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample grouping must not shuffle:\n$plan")
  }

  test("writeWebdatasetShards round-trips samples, rolls shards, long keys") {
    val tmp = java.nio.file.Files.createTempDirectory("wds_write_").toFile
    try {
      val longKey = ("k" * 110) + "/7"
      val rows = (0 until 7).map { i =>
        val key = if (i == 6) longKey else f"s/$i%03d"
        val parts = Map(
          "txt" -> s"caption $i".getBytes(utf8),
          "json" -> s"""{"i":$i}""".getBytes(utf8)) ++
          (if (i % 2 == 0)
            Map("png" -> graft.multimodal.Multimodal.encodePng(4, 3,
              Array.tabulate(4 * 3 * 3)(j => ((i + j) % 251).toByte)))
          else Map.empty)
        (key, parts)
      }
      val df = rows.toDF("key", "parts").repartition(2)
      WebDataset.writeWebdatasetShards(df, tmp.getAbsolutePath,
        samplesPerShard = 2, gzip = true)
      val files = tmp.listFiles().filter(_.getName.endsWith(".tar.gz"))
      // 7 samples over 2 partitions at 2/shard: at least 4 shards
      assert(files.length >= 4, files.map(_.getName).mkString(","))
      // members of one sample are contiguous (the writer's contract the
      // reader's consecutive-run grouping relies on) and sorted by ext
      files.foreach { f =>
        val entries = WebDataset.parseTar(
          java.nio.file.Files.readAllBytes(f.toPath))
        val keys = entries.map(e => WebDataset.keyExt(e.name)._1)
        val runs = keys.foldLeft(List.empty[String]) { (acc, k) =>
          if (acc.headOption.contains(k)) acc else k :: acc
        }
        assert(runs.size === keys.distinct.size,
          s"non-contiguous sample in ${f.getName}: $keys")
        entries.groupBy(e => WebDataset.keyExt(e.name)._1).foreach {
          case (k, es) =>
            val exts = es.map(e => WebDataset.keyExt(e.name)._2)
            assert(exts === exts.sorted, s"$k members not ext-sorted")
        }
      }
      val got = WebDataset.webdatasetSamples(
        spark.read.format("binaryFile").load(tmp.getAbsolutePath),
        payloadCol = "content").collect()
      assert(got.length === 7)
      val byKey = got.map(s => s.key -> s.parts).toMap
      rows.foreach { case (key, parts) =>
        assert(byKey(key).keySet === parts.keySet, key)
        parts.foreach { case (ext, bytes) =>
          assert(byKey(key)(ext).toSeq === bytes.toSeq, s"$key.$ext")
        }
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(tmp)
    }
  }

  test("writeWebdatasetShards: byte-budget rolling (r17)") {
    val tmp = java.nio.file.Files.createTempDirectory("wds_bytes_").toFile
    try {
      // each sample = one 1000-byte member -> tar footprint 512 header
      // + 1024 padded data = 1536; budget 4000 fits exactly two
      val rows = (0 until 5).map { i =>
        (f"b/$i%03d", Map("bin" -> Array.tabulate[Byte](1000)(j =>
          ((i * 7 + j) % 251).toByte)))
      }
      val df = rows.toDF("key", "parts").repartition(1)
      WebDataset.writeWebdatasetShards(df, tmp.getAbsolutePath,
        samplesPerShard = 1000, bytesPerShard = 4000L)
      val files = tmp.listFiles().filter(_.getName.endsWith(".tar"))
        .sortBy(_.getName)
      // 5 samples at 2 per budget -> shards of 2, 2, 1
      assert(files.length === 3, files.map(_.getName).mkString(","))
      val perShard = files.map(f => WebDataset.parseTar(
        java.nio.file.Files.readAllBytes(f.toPath)).length)
      assert(perShard.toSeq === Seq(2, 2, 1))
      // a single over-budget sample still ships alone
      val big = Seq(("big/0", Map("bin" -> new Array[Byte](5000))))
        .toDF("key", "parts").repartition(1)
      val dir2 = java.nio.file.Files.createTempDirectory("wds_big_").toFile
      try {
        WebDataset.writeWebdatasetShards(big, dir2.getAbsolutePath,
          samplesPerShard = 1000, bytesPerShard = 4000L)
        val bf = dir2.listFiles().filter(_.getName.endsWith(".tar"))
        assert(bf.length === 1)
        assert(WebDataset.parseTar(
          java.nio.file.Files.readAllBytes(bf(0).toPath)).length === 1)
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(dir2)
      }
      // read-back integrity through the source
      val got = WebDataset.webdatasetSamples(
        spark.read.format("binaryFile").load(tmp.getAbsolutePath),
        payloadCol = "content").collect()
      assert(got.length === 5)
      val byKey = got.map(s => s.key -> s.parts).toMap
      rows.foreach { case (key, parts) =>
        assert(byKey(key)("bin").toSeq === parts("bin").toSeq, key)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(tmp)
    }
  }
}
