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

  /** Export `df` as WARC response records — the fixture/interchange
    * path (a corpus handed BACK to WARC-consuming tools), and the read
    * path's round-trip witness. One `.warc.gz` per partition of `df`
    * (size the export with `repartition` upstream). Every byte is
    * deterministic: record ids derive from the target URI (sha-256),
    * `WARC-Date` is the caller's literal, and Java's gzip writes no
    * timestamp — identical input partitions produce identical files on
    * any engine run.
    *
    * Commit protocol: parts stream into `<dir>/_tmp_<marker>/`, are
    * renamed into place only after every task succeeded, and the
    * `_GRAFT_WARC_COMMITTED` marker lands LAST — a crashed export is a
    * directory without the marker, never a silently short archive.
    * (Speculative/retried tasks are safe: each attempt writes its own
    * attempt-suffixed temp file and the rename picks exactly one.)
    */
  def writeWarc(
      df: DataFrame,
      dir: String,
      uriCol: String,
      payloadCol: String,
      httpContentType: String = "text/plain; charset=utf-8",
      warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    require(df.schema(payloadCol).dataType ==
        org.apache.spark.sql.types.BinaryType,
      s"payloadCol `$payloadCol` must be BINARY (encode(text, 'utf-8') upstream)")
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir/_tmp_graft_warc"
    val rows = df.select(
      col(uriCol).cast("string").as("__uri"),
      col(payloadCol).as("__payload"))
    val written = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      val fs = new Path(tmp).getFileSystem(conf.value)
      val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
      val tmpFile = new Path(tmp, f"part-$pid%05d-a$attempt.warc.gz")
      val out = new GZIPOutputStream(fs.create(tmpFile, true), 1 << 16)
      var n = 0L
      try {
        it.foreach { r =>
          val uri = r.getString(0)
          require(uri != null, "writeWarc: null target URI")
          val body =
            Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])
              .getOrElse(Array.emptyByteArray)
          writeResponseRecord(out, uri, body, httpContentType, warcDate)
          n += 1
        }
      } finally out.close()
      Iterator.single((pid, tmpFile.toString, n))
    }.collect() // bounded: one small triple per partition
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep exactly one attempt per partition (first in sorted order —
    // attempts are byte-identical by construction), then marker LAST
    written.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (pid, atts) =>
      val keep = atts.minBy(_._2)
      val dst = new Path(dir, f"part-$pid%05d.warc.gz")
      require(fs.rename(new Path(keep._2), dst),
        s"writeWarc: commit rename failed for $dst")
    }
    fs.delete(new Path(tmp), true)
    val marker = fs.create(new Path(dir, "_GRAFT_WARC_COMMITTED"), true)
    marker.write(s"parts=${written.map(_._1).distinct.length}\n".getBytes(UTF_8))
    marker.close()
  }

  // ---------------------------------------------------------------- write

  private def writeResponseRecord(
      out: OutputStream,
      uri: String,
      body: Array[Byte],
      httpContentType: String,
      warcDate: String): Unit = {
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val recordId = "urn:graft:sha256:" + sha256Hex(uri.getBytes(UTF_8))
    val header = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <$recordId>\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n").getBytes(UTF_8)
    out.write(header)
    out.write(http)
    out.write(body)
    out.write("\r\n\r\n".getBytes(UTF_8))
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
