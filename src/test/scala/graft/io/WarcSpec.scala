package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.io.warc.Warc

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(d.toFile): Unit))
    d.toString
  }

  private def record(
      wtype: String,
      uri: String,
      content: Array[Byte],
      ctype: String = "application/http; msgtype=response"): Array[Byte] = {
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Record-ID: <urn:test:$wtype>\r\n" +
      s"WARC-Date: 2026-02-03T04:05:06Z\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Type: $ctype\r\n" +
      s"Content-Length: ${content.length}\r\n\r\n").getBytes(UTF_8)
    hdr ++ content ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpBlock(body: String, status: String = "200 OK"): Array[Byte] =
    (s"HTTP/1.1 $status\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n").getBytes(UTF_8) ++
      body.getBytes(UTF_8)

  test("parses warcinfo + request + response records with offsets and fields") {
    val dir = tmpDir("warc_parse_")
    val bytes =
      record("warcinfo", null, "software: graft-test\r\n".getBytes(UTF_8),
        ctype = "application/warc-fields") ++
      record("request", "https://example.org/a",
        "GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n".getBytes(UTF_8),
        ctype = "application/http; msgtype=request") ++
      record("response", "https://example.org/a", httpBlock("<html>héllo</html>"))
    Files.write(java.nio.file.Paths.get(dir, "f.warc"), bytes)
    val out = Warc.readWarc(spark, s"$dir/f.warc")
      .orderBy("record_offset").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "request", "response"))
    assert(out(0).getAs[Long]("record_offset") == 0L)
    assert(out(0).getAs[String]("target_uri") == null)
    assert(out(1).getAs[String]("content_type")
      .contains("msgtype=request"))
    assert(out(1).getAs[Any]("http_status") == null,
      "request records must not claim an http status")
    val resp = out(2)
    assert(resp.getAs[Int]("http_status") == 200)
    assert(resp.getAs[String]("http_content_type") == "text/html; charset=utf-8")
    assert(new String(resp.getAs[Array[Byte]]("payload"), UTF_8) ==
      "<html>héllo</html>", "payload must be the http BODY, utf-8 intact")
    assert(resp.getAs[String]("record_id") == "urn:test:response",
      "angle brackets stripped")
    assert(resp.getAs[String]("warc_date") == "2026-02-03T04:05:06Z")
    // offsets are cumulative byte positions in the stream
    assert(out(2).getAs[Long]("record_offset") > out(1).getAs[Long]("record_offset"))
  }

  test("gzip: concatenated per-record members AND single-stream both parse") {
    val dir = tmpDir("warc_gz_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    val r1 = record("response", "https://e.org/1", httpBlock("one"))
    val r2 = record("response", "https://e.org/2", httpBlock("two"))
    // Common Crawl layout: one gzip member per record, concatenated
    Files.write(java.nio.file.Paths.get(dir, "members.warc.gz"), gz(r1) ++ gz(r2))
    // plain single-member stream of both records
    Files.write(java.nio.file.Paths.get(dir, "single.warc.gz"), gz(r1 ++ r2))
    val out = Warc.readWarc(spark, s"$dir/*.warc.gz")
      .select(regexp_extract(col("warc_file"), "([a-z]+)\\.warc\\.gz", 1).as("f"),
        col("target_uri"))
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("members", "https://e.org/1"), ("members", "https://e.org/2"),
      ("single", "https://e.org/1"), ("single", "https://e.org/2")))
  }

  test("truncated payload and bad terminator fail loud with file context") {
    val dir = tmpDir("warc_bad_")
    val good = record("response", "https://e.org/x", httpBlock("body"))
    Files.write(java.nio.file.Paths.get(dir, "trunc.warc"),
      good.dropRight(10)) // cut inside the terminator/payload
    val e = intercept[Exception](
      Warc.readWarc(spark, s"$dir/trunc.warc").count())
    assert(e.getMessage != null)
    // Content-Length lying about the payload => terminator check trips
    val lying = new String(good, UTF_8).replaceFirst(
      "Content-Length: (\\d+)\r\n\r\nHTTP", "Content-Length: 3\r\n\r\nHTTP")
    Files.write(java.nio.file.Paths.get(dir, "lying.warc"),
      lying.getBytes(UTF_8))
    val e2 = intercept[Exception](
      Warc.readWarc(spark, s"$dir/lying.warc").count())
    assert(e2.getMessage.contains("lying.warc"),
      s"error must carry the file name, got: ${e2.getMessage}")
  }

  test("writeWarc → readWarc round-trips payload bytes, unicode and empties") {
    val dir = tmpDir("warc_rt_") + "/out"
    val docs = Seq(
      (1L, "plain ascii"),
      (2L, "ünïcødé ☃ — em–dash"),
      (3L, ""),
      (4L, "line\nbreaks\r\nand\ttabs")).toDF("doc_id", "text")
      .withColumn("uri", concat(lit("https://example.org/doc/"), col("doc_id")))
      .withColumn("payload", encode(col("text"), "utf-8"))
      .repartition(2)
    Warc.writeWarc(docs, dir, "uri", "payload")
    val fsDir = new java.io.File(dir)
    assert(fsDir.listFiles().exists(_.getName == "_GRAFT_WARC_COMMITTED"),
      "commit marker must exist")
    assert(fsDir.listFiles().count(_.getName.endsWith(".warc.gz")) == 2)
    val back = Warc.readWarc(spark, s"$dir/*.warc.gz")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        decode(col("payload"), "utf-8").as("text"),
        col("http_status"), col("warc_type"))
    val got = back.orderBy("doc_id")
      .as[(Long, String, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, "plain ascii", 200, "response"),
      (2L, "ünïcødé ☃ — em–dash", 200, "response"),
      (3L, "", 200, "response"),
      (4L, "line\nbreaks\r\nand\ttabs", 200, "response")))
  }

  test("DSv2 graft-warc format equals readWarc, prunes columns, caps on limit") {
    val dir = tmpDir("warc_dsv2_") + "/out"
    val docs = (1L to 20L).map(i => (i, s"body $i")).toDF("doc_id", "text")
      .withColumn("uri", concat(lit("https://e.org/"), col("doc_id")))
      .withColumn("payload", encode(col("text"), "utf-8"))
      .repartition(3)
    Warc.writeWarc(docs, dir, "uri", "payload")
    val viaApi = Warc.readWarc(spark, s"$dir/*.warc.gz")
      .select("target_uri", "http_status").collect()
      .map(_.toString).sorted.toSeq
    val viaFormat = spark.read.format("graft-warc").load(dir)
      .select("target_uri", "http_status").collect()
      .map(_.toString).sorted.toSeq
    assert(viaFormat == viaApi && viaFormat.size == 20)
    // pruning reaches the scan description
    val pruned = spark.read.format("graft-warc").load(dir)
      .select("target_uri")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("cols=target_uri"),
      s"pruned scan must carry only the required column:\n$desc")
    // limit caps per partition (3 files -> at most 3 x 2 rows reach Spark)
    val limited = spark.read.format("graft-warc").load(dir).limit(2)
    assert(limited.count() == 2)
    assert(limited.queryExecution.executedPlan.toString.contains("limit=2"))
    // missing path / no matches are loud
    intercept[IllegalArgumentException](
      spark.read.format("graft-warc").load(dir + "/nope").collect())
  }

  test("fuzz: arbitrary junk either parses or fails loud — never hangs or corrupts") {
    val rnd = new java.util.Random(99)
    (1 to 60).foreach { i =>
      val n = rnd.nextInt(400)
      val junk = new Array[Byte](n)
      rnd.nextBytes(junk)
      // make some cases LOOK like warc starts to reach deeper code paths
      val bytes =
        if (i % 3 == 0) "WARC/1.0\r\n".getBytes("UTF-8") ++ junk
        else if (i % 3 == 1) junk
        else ("WARC/1.0\r\nContent-Length: " + rnd.nextInt(1000) +
          "\r\n\r\n").getBytes("UTF-8") ++ junk
      val (it, res) = Warc.recordsWithResource(s"fuzz-$i",
        new java.io.ByteArrayInputStream(bytes))
      try {
        // must terminate: either yields records or throws
        val outcome = scala.util.Try { it.size }
        outcome match {
          case scala.util.Success(k) => assert(k >= 0)
          case scala.util.Failure(e) =>
            assert(e.getMessage == null || e.getMessage.contains(s"fuzz-$i") ||
              e.isInstanceOf[java.io.EOFException],
              s"unexpected error shape: $e")
        }
      } finally { scala.util.Try(res.close()): Unit }
    }
  }

  test("writeWarc record families: warcinfo opens the file, request/metadata link to their response") {
    val dir = tmpDir("warc_fam_") + "/out"
    val docs = Seq(
      (1L, "alpha", "fetchTimeMs: 12\r\n"),
      (2L, "beta", "fetchTimeMs: 34\r\n"),
      (3L, "gamma", null),
      (4L, "delta", "fetchTimeMs: 56\r\n")).toDF("doc_id", "text", "meta")
      .withColumn("uri", concat(lit("https://e.org/"), col("doc_id")))
      .withColumn("payload", encode(col("text"), "utf-8"))
      .coalesce(1)
    Warc.writeWarc(docs, dir, "uri", "payload",
      writeWarcinfo = true, requestRecords = true,
      metadataCol = Some("meta"))
    val back = Warc.readWarc(spark, s"$dir/*.warc.gz")
    val byType = back.groupBy("warc_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map(
      "warcinfo" -> 1L, "request" -> 4L, "response" -> 4L,
      "metadata" -> 3L), s"unexpected type counts: $byType")
    // warcinfo is the FIRST record (offset 0) and names its own file
    val info = back.where($"warc_type" === "warcinfo").collect().head
    assert(info.getAs[Long]("record_offset") == 0L)
    assert(new String(info.getAs[Array[Byte]]("payload"), "UTF-8")
      .contains("software: graft-warc"))
    // each request's payload is the GET for its own target URI
    back.where($"warc_type" === "request").collect().foreach { r =>
      val http = new String(r.getAs[Array[Byte]]("payload"), "UTF-8")
      assert(http.startsWith(s"GET ${r.getAs[String]("target_uri")} HTTP/1.1\r\n"))
      assert(http.contains("Host: e.org"))
    }
    // metadata payload round-trips the warc-fields text; null meta row
    // emitted none
    val metas = back.where($"warc_type" === "metadata")
      .select("target_uri", "payload").collect()
      .map(r => r.getString(0) ->
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
    assert(metas == Map(
      "https://e.org/1" -> "fetchTimeMs: 12\r\n",
      "https://e.org/2" -> "fetchTimeMs: 34\r\n",
      "https://e.org/4" -> "fetchTimeMs: 56\r\n"))
    // record ids are distinct across the whole archive
    val ids = back.select("record_id").as[String].collect()
    assert(ids.distinct.length == ids.length)
    // the minimal default export is unchanged by the new families
    val minDir = tmpDir("warc_min_") + "/out"
    Warc.writeWarc(docs, minDir, "uri", "payload")
    val types = Warc.readWarc(spark, s"$minDir/*.warc.gz")
      .select("warc_type").distinct().as[String].collect().toSeq
    assert(types == Seq("response"))
  }

  test("writeWarc size-targeted split: files roll at the byte target, nothing lost, deterministic") {
    val dir = tmpDir("warc_roll_") + "/out"
    val docs = (1L to 50L).map(i => (i, "x" * 100)).toDF("doc_id", "text")
      .withColumn("uri", concat(lit("https://e.org/"), col("doc_id")))
      .withColumn("payload", encode(col("text"), "utf-8"))
      .coalesce(1)
    Warc.writeWarc(docs, dir, "uri", "payload", targetFileBytes = 1500L)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.getName).sorted
    assert(files.length > 3,
      s"~15 KB at a 1.5 KB target must roll into several files, got $files")
    assert(files.forall(_.matches("part-00000-\\d{4}\\.warc\\.gz")),
      s"rolled files must carry a sequence suffix: ${files.toSeq}")
    // every record present exactly once across the rolled files
    val back = Warc.readWarc(spark, s"$dir/*.warc.gz")
    assert(back.count() == 50)
    assert(back.select("target_uri").distinct().count() == 50)
    // deterministic: a second export cuts at identical boundaries
    val dir2 = tmpDir("warc_roll2_") + "/out"
    Warc.writeWarc(docs, dir2, "uri", "payload", targetFileBytes = 1500L)
    val files2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).map(_.getName).sorted
    assert(files2.toSeq == files.toSeq)
    val a = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/${files.head}"))
    val b = Files.readAllBytes(java.nio.file.Paths.get(s"$dir2/${files2.head}"))
    assert(a.sameElements(b))
  }

  test("writeWarc output is byte-deterministic across runs") {
    val base = tmpDir("warc_det_")
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .withColumn("uri", concat(lit("https://e.org/"), col("doc_id")))
      .withColumn("payload", encode(col("text"), "utf-8"))
      .coalesce(1)
    Warc.writeWarc(docs, s"$base/a", "uri", "payload")
    Warc.writeWarc(docs, s"$base/b", "uri", "payload")
    val a = Files.readAllBytes(java.nio.file.Paths.get(s"$base/a/part-00000.warc.gz"))
    val b = Files.readAllBytes(java.nio.file.Paths.get(s"$base/b/part-00000.warc.gz"))
    assert(a.sameElements(b), "same partition content must gzip to identical bytes")
  }

  test("wetExport writes linked conversion records that round-trip") {
    val base = tmpDir("graft_wet_")
    val docs = Seq(
      ("https://example.org/a", "extracted text of a"),
      ("https://example.org/b", "und hier text b"))
      .toDF("uri", "text").repartition(1)
    Warc.wetExport(docs, s"$base/wet", "uri", "text")
    val back = Warc.readWarc(spark, s"$base/wet/*.warc.gz").collect()
    assert(back.length == 2)
    back.foreach { r =>
      assert(r.getAs[String]("warc_type") == "conversion")
      assert(r.getAs[String]("content_type") == "text/plain")
      assert(r.isNullAt(r.fieldIndex("http_status")),
        "a conversion record carries no HTTP envelope")
    }
    val texts = back.map(r => r.getAs[String]("target_uri") ->
      new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toMap
    assert(texts("https://example.org/a") == "extracted text of a")
    assert(texts("https://example.org/b") == "und hier text b")
    // the Refers-To header links to the deterministic response id of
    // the same URI (raw-bytes check — the parsed schema keeps the core
    // fields only)
    val gz = new java.util.zip.GZIPInputStream(
      Files.newInputStream(java.nio.file.Paths.get(
        s"$base/wet/part-00000.warc.gz")))
    val raw = new String(gz.readAllBytes(), UTF_8)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("https://example.org/a".getBytes(UTF_8))
      .map("%02x".format(_)).mkString
    assert(raw.contains(s"WARC-Refers-To: <urn:graft:sha256:$sha>"))
    // conversion + request records is a contradiction — loud
    intercept[IllegalArgumentException](
      Warc.writeWarc(docs.withColumn("p", encode(col("text"), "utf-8")),
        s"$base/x", "uri", "p", conversion = true, requestRecords = true))
  }

  test("watExport: metadata records whose link lists equal extractLinks, deterministic bytes") {
    val base = tmpDir("graft_wat_")
    val html =
      """<html><body><a href="https://other.example.net/x?a=1&amp;b=2">x</a>
        |<a href='/local/p'>y</a><a href="rel/q.html">z</a>
        |<a href="#frag">f</a><a href="mailto:m@e.x">m</a></body></html>"""
        .stripMargin
    val docs = Seq(
      ("https://example.org/dir/page", html),
      ("https://example.org/plain", "<html><body>no links</body></html>"))
      .toDF("uri", "html").repartition(1)
    Warc.watExport(docs, s"$base/wat", "uri", "html")
    val back = Warc.readWarc(spark, s"$base/wat/*.warc.gz").collect()
    assert(back.length == 2)
    back.foreach { r =>
      assert(r.getAs[String]("warc_type") == "metadata")
      assert(r.getAs[String]("content_type") == "application/json")
      assert(r.isNullAt(r.fieldIndex("http_status")))
    }
    // the envelope's link list equals extractLinks over the same rows,
    // in the same order (the operator IS the link source by contract)
    val envs = back.map { r =>
      r.getAs[String]("target_uri") ->
        new String(r.getAs[Array[Byte]]("payload"), UTF_8)
    }.toMap
    val urlRe = """"url":"([^"]+)"""".r
    val watLinks = envs("https://example.org/dir/page")
    val gotLinks = urlRe.findAllMatchIn(watLinks).map(_.group(1)).toVector
    val opLinks = graft.operators.Urls.extractLinks(
        docs.where($"uri" === "https://example.org/dir/page"),
        "html", "uri")
      .select("link").as[String].collect().toVector
    assert(gotLinks == opLinks, s"wat $gotLinks vs operator $opLinks")
    assert(gotLinks == Vector(
      "https://other.example.net/x?a=1&b=2",
      "https://example.org/dir/rel/q.html",
      "https://example.org/local/p"))
    // linkless page: an explicit empty Links list, never a missing field
    assert(envs("https://example.org/plain").contains(""""Links":[]"""))
    // envelope carries the byte count and the response cross-link id
    assert(watLinks.contains(
      s""""Actual-Content-Length":${html.getBytes(UTF_8).length}"""))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest("https://example.org/dir/page".getBytes(UTF_8))
      .map("%02x".format(_)).mkString
    assert(watLinks.contains(s"urn:graft:sha256:$sha"))
    // WARC-Refers-To names the same deterministic response id (raw bytes)
    val gz = new java.util.zip.GZIPInputStream(
      Files.newInputStream(java.nio.file.Paths.get(
        s"$base/wat/part-00000.warc.gz")))
    val raw = new String(gz.readAllBytes(), UTF_8)
    assert(raw.contains(s"WARC-Refers-To: <urn:graft:sha256:$sha>"))
    // byte-determinism: a second export produces identical archives
    Warc.watExport(docs, s"$base/wat2", "uri", "html")
    val b1 = Files.readAllBytes(java.nio.file.Paths.get(
      s"$base/wat/part-00000.warc.gz"))
    val b2 = Files.readAllBytes(java.nio.file.Paths.get(
      s"$base/wat2/part-00000.warc.gz"))
    assert(java.util.Arrays.equals(b1, b2), "wat export must be " +
      "byte-deterministic across runs")
    // a WAT is metadata records only — extra families are a contradiction
    intercept[IllegalArgumentException](
      Warc.writeWarc(docs.withColumn("p", encode(col("html"), "utf-8")),
        s"$base/x", "uri", "p", wat = true, requestRecords = true))
  }
}
