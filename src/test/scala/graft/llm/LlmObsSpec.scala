package graft.llm

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkTestBase
import graft.obs.{BufferedTableSink, ProgressTracker}

class LlmObsSpec extends SparkTestBase {
  import spark.implicits._

  test("withEmbeddings batches, chunks, and aggregates deterministically") {
    val df = Seq((1L, "abcdef"), (2L, "xyz"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Llm.withEmbeddings(df, "text",
      () => HashEmbeddingsClient(dims = 4, normalize = false),
      batchSize = 2,
      textSplitter = Some(() => CharChunkSplitter(3)),
      aggregation = "mean")
    val rows = out.orderBy("id").collect()
    // row 1: chunks "abc","def" → mean of two stub vectors
    val stub = graft.similarity.HashStubEncoder(4, normalize = false)
    val expected = {
      val Seq(a, b) = stub.encode(Seq("abc", "def"))
      a.zip(b).map { case (x, y) => (x + y) / 2 }
    }
    val got = rows(0).getSeq[Float](2)
    expected.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-6f) }
    // "first" aggregation picks the first chunk's vector
    val first = Llm.withEmbeddings(df, "text",
      () => HashEmbeddingsClient(4, normalize = false), batchSize = 2,
      textSplitter = Some(() => CharChunkSplitter(3)), aggregation = "first")
      .orderBy("id").collect()(0).getSeq[Float](2)
    stub.encode(Seq("abc")).head.zip(first).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-6f)
    }
    // null text embeds as empty string → zero vector
    assert(rows(2).getSeq[Float](2).forall(_ == 0.0f))
  }

  test("mapColumnWithLlm dry-run maps case-insensitively with stats") {
    val df = Seq("Apple", "BANANA", "cherry", "durian", "", null)
      .toDF("fruit")
    val result = Llm.mapColumnWithLlm(df, "fruit",
      Seq("Apple", "Banana", "Cherry"), dryRun = true)
    val got = result.df.collect()
      .map(r => Option(r.getAs[String]("fruit_mapped"))).toSeq
    assert(got.count(_.isDefined) == 3)
    assert(got.flatten.toSet == Set("Apple", "Banana", "Cherry"))
    assert(result.stats.mapped == 3 && result.stats.unmapped == 3)
    assert(result.stats.apiCalls == 0)
  }

  test("mapColumnWithLlm live path caches per distinct value via mock server") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      calls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val answer = if (body.contains("pomme")) "Apple" else "none"
      val resp =
        s"""{"choices": [{"message": {"role": "assistant", "content": "$answer"}}]}"""
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val client = Llm.OpenAiChatClient(env = Map(
        "OPENAI_API_KEY" -> "test-key",
        "OPENAI_BASE_URL" -> s"http://127.0.0.1:${server.getAddress.getPort}/v1"))
      val df = Seq("pomme", "pomme", "bizarre").toDF("fruit").coalesce(1)
      val result = Llm.mapColumnWithLlm(df, "fruit", Seq("Apple", "Banana"),
        chatClient = Some(client))
      val mapped = result.df.collect().map(r => Option(r.getAs[String]("fruit_mapped")))
      assert(mapped.count(_.contains("Apple")) == 2)
      assert(result.stats.apiCalls == 2) // memo cache: 2 distinct values
      assert(result.stats.mapped == 2 && result.stats.unmapped == 1)
    } finally server.stop(0)
  }

  test("live completions outside the target list are unmapped; quotes stripped") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      // quoted valid target / free-form hallucination / explicit none
      val answer =
        if (body.contains("pomme")) "\\\"apple\\\""
        else if (body.contains("weird")) "Some creative answer"
        else "none"
      val resp =
        s"""{"choices": [{"message": {"role": "assistant", "content": "$answer"}}]}"""
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val client = Llm.OpenAiChatClient(env = Map(
        "OPENAI_API_KEY" -> "test-key",
        "OPENAI_BASE_URL" -> s"http://127.0.0.1:${server.getAddress.getPort}/v1"))
      val df = Seq("pomme", "weird", "nada").toDF("fruit").coalesce(1)
      val result = Llm.mapColumnWithLlm(df, "fruit", Seq("Apple", "Banana"),
        chatClient = Some(client))
      val mapped = result.df.collect()
        .map(r => (r.getAs[String]("fruit"), Option(r.getAs[String]("fruit_mapped"))))
        .toMap
      assert(mapped("pomme").contains("Apple")) // quote-stripped, canonical case
      assert(mapped("weird").isEmpty) // hallucinated value does not leak
      assert(mapped("nada").isEmpty)
      assert(result.stats.mapped == 1 && result.stats.unmapped == 2)
    } finally server.stop(0)
  }

  test("progress tracker buffers events into a parquet sink") {
    val target = Files.createTempDirectory("graft_obs_").toString + "/events"
    val sink = new BufferedTableSink(spark, target, flushEvery = 3)
    val tracker = new ProgressTracker("t1", total = Some(4), sinks = Seq(sink))
    tracker.logStart("begin")
    tracker.advance(2)
    tracker.advance(2)
    assert(tracker.count == 4)
    tracker.logEnd("done")
    tracker.close()
    val events = spark.read.parquet(target)
    assert(events.count() == 4)
    val kinds = events.collect().map(_.getAs[String]("event")).toSet
    assert(kinds == Set("start", "progress", "end"))
    intercept[IllegalArgumentException] {
      graft.obs.LogEventRecord(
        new java.sql.Timestamp(0), "NOPE", "x", "y", Map.empty)
    }
  }

  test("recursive splitter respects structure, size cap, and overlap") {
    val s = RecursiveCharSplitter(chunkSize = 12)
    val text = "aa bb cc\n\ndd ee\nff gg hh ii"
    val chunks = s.splitText(text)
    // lossless with zero overlap, every chunk within the cap
    assert(chunks.mkString == text)
    assert(chunks.forall(_.length <= 12))
    // paragraph boundary survives: first chunk ends at the blank line
    assert(chunks.head == "aa bb cc\n\n")
    // short input passes through untouched
    assert(s.splitText("tiny") == Seq("tiny"))
    // a word longer than the cap falls back to hard character cuts
    assert(RecursiveCharSplitter(chunkSize = 4).splitText("abcdefghij")
      == Seq("abcd", "efgh", "ij"))
    val overlapped = RecursiveCharSplitter(chunkSize = 12, chunkOverlap = 3)
      .splitText(text)
    overlapped.sliding(2).foreach {
      case Seq(prev, cur) => assert(cur.startsWith(prev.takeRight(3).take(3)))
      case _ =>
    }
    // the cap INCLUDES the overlap prefix (a downstream encoder's hard
    // input limit must hold for every chunk)
    assert(overlapped.forall(_.length <= 12), overlapped)
    val dense = RecursiveCharSplitter(chunkSize = 8, chunkOverlap = 4)
      .splitText("aaaa bbbb cccc dddd eeee ffff")
    assert(dense.forall(_.length <= 8), dense)
  }

  test("token splitter windows by token count with overlap") {
    val s = TokenChunkSplitter(chunkTokens = 3, overlapTokens = 1)
    assert(s.splitText("a b c d e") == Seq("a b c", "c d e"))
    assert(s.splitText("a  b") == Seq("a  b")) // within budget: verbatim
    assert(TokenChunkSplitter(2).splitText("a b c d e")
      == Seq("a b", "c d", "e"))
    intercept[IllegalArgumentException](TokenChunkSplitter(2, 2))
  }

  test("splitters plug into withEmbeddings chunk aggregation") {
    import spark.implicits._
    val df = Seq((1L, "one two three four five six")).toDF("id", "text")
    val out = Llm.withEmbeddings(df, "text",
      () => HashEmbeddingsClient(dims = 4),
      textSplitter = Some(() => TokenChunkSplitter(chunkTokens = 2)),
      aggregation = "mean")
    val vec = out.select("embedding").as[Seq[Float]].head()
    // mean of the three 2-token chunk embeddings
    val enc = graft.similarity.HashStubEncoder(4, normalize = true)
    val chunks = Seq("one two", "three four", "five six").map(c => enc.encode(Seq(c)).head)
    val expect = (0 until 4).map(i => chunks.map(_(i)).sum / 3)
    vec.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }
}
