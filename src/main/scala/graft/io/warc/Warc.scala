package graft.io.warc

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException,
  FilterInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) read/write — the ingestion format of
  * the public crawl ecosystem (Common Crawl ships ~100 TB per monthly
  * snapshot as `.warc.gz`). A crawl-corpus pipeline STARTS here: parse
  * records, keep the HTTP responses, extract text
  * ([[graft.operators.TextAnalysis.htmlToText]]), then dedup/filter/mix
  * downstream.
  *
  * Scale shape: ONE FILE = ONE SPLIT. A `.warc.gz` is a chain of
  * per-record gzip members — not block-splittable without an external
  * index — so the unit of parallelism is the file, exactly how the
  * public corpora are laid out (~1 GB per file, thousands of files per
  * snapshot; a 1000-executor cluster saturates on file count, not
  * in-file splits). Records are STREAMED off the (decompressed) stream
  * one at a time — memory holds one record's payload, never a file.
  *
  * Reference behavior modeled on the public WARC 1.0/1.1 spec; record
  * layout: a `WARC/1.x` version line, CRLF-terminated named headers, an
  * empty line, `Content-Length` payload bytes, then exactly CRLF CRLF.
  * Malformed input fails LOUD with file + offset — a truncated crawl
  * shard must surface, not silently shorten the corpus.
  */
object Warc {

  /** One parsed record. For `application/http; msgtype=response`
    * records, `payload` is the HTTP BODY (headers consumed into
    * `http_status` / `http_content_type`); for everything else it is
    * the raw record block and the http fields are null.
    */
  final case class WarcRecord(
      warc_file: String,
      record_offset: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      http_status: Option[Int],
      http_content_type: String,
      payload: Array[Byte])

  /** Read every record of every WARC file under `path` (glob ok).
    * Gzip is detected per file by suffix (`.gz`/`.wgz`) — Java's
    * GZIPInputStream walks concatenated members natively, so both
    * member-per-record archives and single-stream gzip parse the same.
    * `record_offset` is the record's byte offset in the DECOMPRESSED
    * stream (the stable coordinate for re-reads and dedup keys).
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (file, pds) => records(file, pds.open()) }
    spark.createDataset(rdd)(Encoders.product[WarcRecord]).toDF()
  }

  /** Record iterator over a raw (possibly gzipped, by suffix) stream —
    * shared by [[readWarc]] and the DSv2 connector. The returned
    * closeable aborts the stream on early termination (limit pushdown,
    * task kill); normal exhaustion closes it automatically.
    */
  private[io] def records(
      file: String, raw: InputStream): Iterator[WarcRecord] =
    recordsWithResource(file, raw)._1

  private[io] def recordsWithResource(
      file: String, raw: InputStream): (Iterator[WarcRecord], java.io.Closeable) = {
    val in: InputStream =
      if (file.endsWith(".gz") || file.endsWith(".wgz"))
        new GZIPInputStream(new BufferedInputStream(raw, 1 << 16), 1 << 16)
      else new BufferedInputStream(raw, 1 << 16)
    val counted = new CountingInputStream(in)
    (recordIterator(file, counted), counted)
  }

  /** Export `df` as WARC records — the fixture/interchange path (a
    * corpus handed BACK to WARC-consuming tools), and the read path's
    * round-trip witness. By default one response record per row and one
    * `.warc.gz` per partition of `df` (size the export with
    * `repartition` upstream). Every byte is deterministic: record ids
    * derive from the target URI (sha-256), `WARC-Date` is the caller's
    * literal, and Java's gzip writes no timestamp — identical input
    * partitions produce identical files on any engine run.
    *
    * Optional record families (all OFF by default — the minimal archive
    * stays minimal):
    *  - `writeWarcinfo` — each emitted file OPENS with a `warcinfo`
    *    record carrying `WARC-Filename` (its own final name) and
    *    `application/warc-fields` describing the writer, the way the
    *    public crawls' archives self-describe.
    *  - `requestRecords` — a synthetic `request` record (the GET that
    *    would have fetched the URI) precedes each response, linked via
    *    `WARC-Concurrent-To`.
    *  - `metadataCol` — a STRING column of `application/warc-fields`
    *    text emitted as a `metadata` record after its response, also
    *    `WARC-Concurrent-To`-linked. Null skips the record for that row.
    *
    * `targetFileBytes > 0` rolls to a NEW file once a file's
    * UNCOMPRESSED byte count passes the target (checked at record-group
    * boundaries, so a row's request/response/metadata records never
    * split across files). Uncompressed bytes make the roll decision
    * partition-deterministic — retried attempts cut at identical
    * boundaries. At 100 TB this is what bounds both the memory of
    * downstream one-file-one-split readers and the skew between
    * archive files when upstream partitions are uneven.
    *
    * Commit protocol: parts stream into `<dir>/_tmp_<marker>/`, are
    * renamed into place only after every task succeeded, and the
    * `_GRAFT_WARC_COMMITTED` marker lands LAST — a crashed export is a
    * directory without the marker, never a silently short archive.
    * (Speculative/retried tasks are safe: each attempt writes its own
    * attempt-suffixed temp files and the rename picks exactly one per
    * (partition, sequence) — attempts agree on sequence boundaries by
    * the determinism above.)
    */
  def writeWarc(
      df: DataFrame,
      dir: String,
      uriCol: String,
      payloadCol: String,
      httpContentType: String = "text/plain; charset=utf-8",
      warcDate: String = "2026-01-01T00:00:00Z",
      writeWarcinfo: Boolean = false,
      requestRecords: Boolean = false,
      metadataCol: Option[String] = None,
      targetFileBytes: Long = 0L,
      conversion: Boolean = false,
      wat: Boolean = false): Unit = {
    require(!(conversion && requestRecords),
      "writeWarc: conversion (WET) archives carry no request records — " +
        "a conversion record derives from a response, it is not an exchange")
    require(!(wat && (conversion || requestRecords || metadataCol.isDefined)),
      "writeWarc: a WAT archive is metadata records ONLY — no " +
        "conversion/request/extra-metadata families")
    require(df.schema(payloadCol).dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"payloadCol `$payloadCol` must be BINARY (encode(text, 'utf-8') upstream)")
    metadataCol.foreach { m =>
      require(df.schema(m).dataType ==
          org.apache.spark.sql.types.StringType,
        s"metadataCol `$m` must be STRING (application/warc-fields text)")
    }
    require(targetFileBytes >= 0,
      s"targetFileBytes must be >= 0, got $targetFileBytes")
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir/_tmp_graft_warc"
    val base = Seq(
      col(uriCol).cast("string").as("__uri"),
      col(payloadCol).as("__payload"))
    val rows = df.select(
      (base ++ metadataCol.map(m => col(m).as("__meta")).toSeq): _*)
    val hasMeta = metadataCol.isDefined
    val written = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      val fs = new Path(tmp).getFileSystem(conf.value)
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val files = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, Long)]
      var seq = 0
      var out: CountingOutputStream = null
      var gz: GZIPOutputStream = null
      var n = 0L
      def finalName(s: Int) =
        if (targetFileBytes > 0L) f"part-$pid%05d-$s%04d.warc.gz"
        else f"part-$pid%05d.warc.gz"
      def open(): Unit = {
        val tmpFile = new Path(tmp, s"${finalName(seq)}.a$attempt")
        gz = new GZIPOutputStream(fs.create(tmpFile, true), 1 << 16)
        out = new CountingOutputStream(gz)
        files += ((pid, seq, tmpFile.toString, 0L))
        n = 0L // per-FILE record count — the tuple reports this file alone
        if (writeWarcinfo) writeWarcinfoRecord(out, finalName(seq), warcDate)
      }
      def closeCurrent(): Unit = if (gz != null) {
        gz.close(); gz = null
        files(files.length - 1) = files.last.copy(_4 = n)
      }
      open()
      try {
        it.foreach { r =>
          val uri = r.getString(0)
          require(uri != null, "writeWarc: null target URI")
          val body =
            Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])
              .getOrElse(Array.emptyByteArray)
          val responseId = recordIdFor(uri)
          if (wat)
            writeWatRecord(out, uri, responseId, body, warcDate)
          else if (conversion)
            writeConversionRecord(out, uri, responseId, body, warcDate)
          else {
            if (requestRecords)
              writeRequestRecord(out, uri, responseId, warcDate)
            writeResponseRecord(out, uri, responseId, body, httpContentType,
              warcDate)
          }
          if (hasMeta && !r.isNullAt(2))
            writeMetadataRecord(out, uri, responseId, r.getString(2), warcDate)
          n += 1
          if (targetFileBytes > 0L && out.count >= targetFileBytes && it.hasNext) {
            closeCurrent(); seq += 1; open()
          }
        }
      } finally closeCurrent()
      files.iterator
    }.collect() // bounded: one small tuple per emitted file
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep exactly one attempt per (partition, sequence) — attempts are
    // byte-identical by construction — then marker LAST
    written.groupBy(w => (w._1, w._2)).toSeq.sortBy(_._1).foreach {
      case ((pid, seq), atts) =>
        val keep = atts.minBy(_._3)
        val name =
          if (targetFileBytes > 0L) f"part-$pid%05d-$seq%04d.warc.gz"
          else f"part-$pid%05d.warc.gz"
        val dst = new Path(dir, name)
        require(fs.rename(new Path(keep._3), dst),
          s"writeWarc: commit rename failed for $dst")
    }
    fs.delete(new Path(tmp), true)
    val marker = fs.create(new Path(dir, "_GRAFT_WARC_COMMITTED"), true)
    marker.write(
      s"parts=${written.map(w => (w._1, w._2)).distinct.length}\n".getBytes(UTF_8))
    marker.close()
  }

  /** Export a text corpus as a WET archive (conversion records): the
    * Common Crawl handoff format between "crawled" and "training-ready"
    * — pair with [[graft.operators.TextAnalysis.htmlToText]] upstream
    * to turn a response WARC into its WET sibling. Same committed-marker
    * / size-targeted-roll write path as [[writeWarc]]; read it back
    * with [[readWarc]] (`warc_type = 'conversion'`, payload = the
    * utf-8 text).
    */
  def wetExport(
      df: DataFrame,
      dir: String,
      uriCol: String,
      textCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      writeWarcinfo: Boolean = false,
      targetFileBytes: Long = 0L): Unit =
    writeWarc(
      df.withColumn("__wet_payload",
        encode(coalesce(col(textCol), lit("")), "utf-8")),
      dir, uriCol, "__wet_payload",
      warcDate = warcDate,
      writeWarcinfo = writeWarcinfo,
      targetFileBytes = targetFileBytes,
      conversion = true)

  /** Export a response corpus as a WAT archive — Common Crawl's third
    * format (next to WARC and WET): one `metadata` record per response,
    * whose payload is a JSON envelope describing the record it refers
    * to — target URI, date, type, the deterministic response record id,
    * the payload byte count, and the page's OUTLINKS. A WAT is what a
    * link-graph / frontier job reads when it must not pay for the full
    * HTML archive (~1/5 the bytes).
    *
    * The link list IS [[graft.operators.Urls.extractLinks]] over the
    * same responses by construction — the identical `hrefs` +
    * `resolveLink` expression chain runs per row (document order within
    * quoting style, dropped hrefs absent), so a WAT exported next to a
    * link-graph job agrees with it edge for edge. The envelope is
    * `to_json` of a fixed struct — field order, entity decoding and
    * link order are all deterministic, so exports are byte-identical
    * across runs/engines (the [[writeWarc]] determinism contract:
    * sha-derived record ids, caller-literal date, timestamp-free gzip).
    *
    * `WARC-Refers-To` carries the response id [[writeWarc]] derives for
    * the same URI — a WAT exported next to its WARC cross-links with no
    * shared state. Same committed-marker / size-targeted-roll write
    * path; read it back with [[readWarc]] (`warc_type = 'metadata'`,
    * payload = the JSON envelope).
    */
  def watExport(
      df: DataFrame,
      dir: String,
      uriCol: String,
      htmlCol: String,
      warcDate: String = "2026-01-01T00:00:00Z",
      writeWarcinfo: Boolean = false,
      targetFileBytes: Long = 0L): Unit = {
    require(df.schema(htmlCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"watExport: htmlCol `$htmlCol` must be STRING (decode a binary " +
        "response payload upstream)")
    val uri = col(uriCol).cast("string")
    val html = coalesce(col(htmlCol), lit(""))
    val links = filter(
      transform(graft.operators.Urls.hrefs(html),
        h => graft.operators.Urls.resolveLink(uri, h)),
      l => l.isNotNull)
    val envelope = to_json(struct(
      struct(
        struct(
          uri.as("WARC-Target-URI"),
          lit(warcDate).as("WARC-Date"),
          lit("response").as("WARC-Type"),
          concat(lit("<"), lit("urn:graft:sha256:"),
            sha2(uri.cast("binary"), 256), lit(">"))
            .as("WARC-Record-ID")).as("WARC-Header-Metadata"),
        struct(
          length(encode(html, "utf-8")).cast("long")
            .as("Actual-Content-Length"),
          struct(
            struct(
              transform(links, l => struct(l.as("url"))).as("Links"))
              .as("HTML-Metadata")).as("HTTP-Response-Metadata"))
          .as("Payload-Metadata")).as("Envelope")))
    writeWarc(
      df.withColumn("__wat_payload", encode(envelope, "utf-8")),
      dir, uriCol, "__wat_payload",
      warcDate = warcDate,
      writeWarcinfo = writeWarcinfo,
      targetFileBytes = targetFileBytes,
      wat = true)
  }

  // ---------------------------------------------------------------- write

  private def recordIdFor(key: String): String =
    "urn:graft:sha256:" + sha256Hex(key.getBytes(UTF_8))

  /** One WARC record: version line, the given headers, the block, the
    * CRLF CRLF terminator. All byte counts flow through `out` so the
    * size-targeted roll sees the true uncompressed position.
    */
  private def writeRecord(
      out: OutputStream,
      headers: Seq[(String, String)],
      block: Array[Byte]): Unit = {
    val head = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
    head.append(s"Content-Length: ${block.length}\r\n\r\n")
    out.write(head.toString.getBytes(UTF_8))
    out.write(block)
    out.write("\r\n\r\n".getBytes(UTF_8))
  }

  private def writeWarcinfoRecord(
      out: OutputStream, filename: String, warcDate: String): Unit = {
    val body = ("software: graft-warc/1.0\r\n" +
      "format: WARC File Format 1.0\r\n").getBytes(UTF_8)
    writeRecord(out, Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<${recordIdFor(s"warcinfo:$filename")}>",
      "WARC-Date" -> warcDate,
      "WARC-Filename" -> filename,
      "Content-Type" -> "application/warc-fields"), body)
  }

  private def writeRequestRecord(
      out: OutputStream,
      uri: String,
      responseId: String,
      warcDate: String): Unit = {
    // the synthetic GET this corpus row would have come from; Host is
    // parsed best-effort (an unparseable URI still gets a valid record)
    val host =
      try Option(java.net.URI.create(uri).getHost).getOrElse("")
      catch { case _: IllegalArgumentException => "" }
    val http = (s"GET $uri HTTP/1.1\r\n" +
      (if (host.nonEmpty) s"Host: $host\r\n" else "") +
      "\r\n").getBytes(UTF_8)
    writeRecord(out, Seq(
      "WARC-Type" -> "request",
      "WARC-Record-ID" -> s"<${recordIdFor(s"request:$uri")}>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "WARC-Concurrent-To" -> s"<$responseId>",
      "Content-Type" -> "application/http; msgtype=request"), http)
  }

  private def writeResponseRecord(
      out: OutputStream,
      uri: String,
      recordId: String,
      body: Array[Byte],
      httpContentType: String,
      warcDate: String): Unit = {
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    writeRecord(out, Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<$recordId>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      http ++ body)
  }

  /** A WET conversion record (ISO 28500 §6.8, the Common Crawl WET
    * shape): `WARC-Type: conversion`, plain-text block with NO HTTP
    * envelope, `WARC-Refers-To` naming the response record the text
    * was extracted from — this library's deterministic response id for
    * the same URI, so a WET exported next to its WARC cross-links
    * without any shared state.
    */
  private def writeConversionRecord(
      out: OutputStream,
      uri: String,
      responseId: String,
      body: Array[Byte],
      warcDate: String): Unit =
    writeRecord(out, Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> s"<${recordIdFor(s"conversion:$uri")}>",
      "WARC-Refers-To" -> s"<$responseId>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "text/plain"),
      body)

  /** A WAT metadata record ([[watExport]]): `WARC-Type: metadata`, JSON
    * envelope block, `WARC-Refers-To` naming the response record the
    * envelope describes — the same deterministic response id
    * [[writeWarc]] derives for the URI, so WAT and WARC cross-link
    * without shared state.
    */
  private def writeWatRecord(
      out: OutputStream,
      uri: String,
      responseId: String,
      envelope: Array[Byte],
      warcDate: String): Unit =
    writeRecord(out, Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> s"<${recordIdFor(s"wat:$uri")}>",
      "WARC-Refers-To" -> s"<$responseId>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/json"),
      envelope)

  private def writeMetadataRecord(
      out: OutputStream,
      uri: String,
      responseId: String,
      fields: String,
      warcDate: String): Unit =
    writeRecord(out, Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> s"<${recordIdFor(s"metadata:$uri")}>",
      "WARC-Date" -> warcDate,
      "WARC-Target-URI" -> uri,
      "WARC-Concurrent-To" -> s"<$responseId>",
      "Content-Type" -> "application/warc-fields"),
      fields.getBytes(UTF_8))

  /** Counts bytes written (pre-compression — the roll coordinate). */
  private final class CountingOutputStream(out: OutputStream)
      extends java.io.FilterOutputStream(out) {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
  }

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map(x => f"$x%02x").mkString

  // ----------------------------------------------------------------- read

  /** Counts bytes CONSUMED (buffering lives below, so the count is the
    * parser's true stream position).
    */
  private final class CountingInputStream(in: InputStream)
      extends FilterInputStream(in) {
    var count: Long = 0L
    override def read(): Int = {
      val b = super.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(b, off, len); if (n > 0) count += n; n
    }
  }

  private def recordIterator(
      file: String,
      in: CountingInputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private def fetch(): Unit = {
        if (nextRec == null && !done) {
          // close BEFORE rethrowing a parse error: the task may survive
          // (caller catches per-file) and the file handle must not wait
          // for GC
          nextRec =
            try parseRecord(file, in)
            catch { case e: Throwable =>
              try in.close() catch { case _: Throwable => () }
              throw e
            }
          if (nextRec == null) { done = true; in.close() }
        }
      }
      override def hasNext: Boolean = { fetch(); !done }
      override def next(): WarcRecord = {
        fetch()
        if (done) throw new NoSuchElementException("end of WARC stream")
        val r = nextRec; nextRec = null; r
      }
    }

  /** Parse one record off the stream; null at clean EOF; loud anywhere
    * else.
    */
  private def parseRecord(
      file: String,
      in: CountingInputStream): WarcRecord = {
    // skip any stray blank lines between records (some writers pad)
    var offset = in.count
    var line = readLine(in)
    while (line != null && line.isEmpty) { offset = in.count; line = readLine(in) }
    if (line == null) return null
    require(line.startsWith("WARC/"),
      s"$file @ $offset: expected WARC/x.y version line, got `$line`")
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      require(i > 0, s"$file @ $offset: malformed WARC header line `$h`")
      headers.put(h.substring(0, i).trim.toLowerCase, h.substring(i + 1).trim)
      h = readLine(in)
    }
    require(h != null, s"$file @ $offset: EOF inside WARC headers")
    val len = headers.getOrElse("content-length",
      sys.error(s"$file @ $offset: record missing Content-Length")).toLong
    require(len >= 0 && len <= Int.MaxValue,
      s"$file @ $offset: unsupported Content-Length $len")
    val block = readFully(in, len.toInt,
      s"$file @ $offset: EOF inside record payload")
    // the spec's record terminator: exactly two CRLFs
    val term = readFully(in, 4, s"$file @ $offset: EOF in record terminator")
    require(term.sameElements("\r\n\r\n".getBytes(UTF_8)),
      s"$file @ $offset: record not terminated by CRLFCRLF " +
        "(Content-Length disagrees with the actual payload?)")
    val ctype = headers.getOrElse("content-type", "")
    val isHttpResponse = ctype.startsWith("application/http") &&
      ctype.contains("response")
    val (status, httpCt, payload) =
      if (isHttpResponse) parseHttp(file, offset, block)
      else (None, null, block)
    WarcRecord(
      warc_file = file,
      record_offset = offset,
      warc_type = headers.getOrElse("warc-type", ""),
      record_id = headers.get("warc-record-id")
        .map(_.stripPrefix("<").stripSuffix(">")).orNull,
      target_uri = headers.get("warc-target-uri").orNull,
      warc_date = headers.get("warc-date").orNull,
      content_type = ctype,
      http_status = status,
      http_content_type = httpCt,
      payload = payload)
  }

  /** Split an HTTP response block into (status, content-type, body). */
  private def parseHttp(
      file: String,
      offset: Long,
      block: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    require(sep >= 0,
      s"$file @ $offset: http response block has no header terminator")
    val head = new String(block, 0, sep, UTF_8)
    val lines = head.split("\r\n")
    require(lines.nonEmpty && lines(0).startsWith("HTTP/"),
      s"$file @ $offset: http block does not start with a status line")
    val status = lines(0).split(" ", 3) match {
      case parts if parts.length >= 2 && parts(1).forall(_.isDigit) =>
        Some(parts(1).toInt)
      case _ => None
    }
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    (status, ct, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** CRLF- (or bare-LF-) terminated line as UTF-8, terminator dropped;
    * null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, UTF_8)
  }

  private def readFully(in: InputStream, n: Int, errMsg: String): Array[Byte] = {
    val out = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(out, got, n - got)
      if (r < 0) throw new EOFException(s"$errMsg (read $got of $n)")
      got += r
    }
    out
  }
}
