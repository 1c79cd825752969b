package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.io.{Http, Json}

/** LLM-powered transforms. Reference: src/spark_fuse/utils/llm.py —
  * `with_langchain_embeddings` (:53-236) and `map_column_with_llm`
  * (:416-561). The external clients are pluggable traits; deterministic
  * offline implementations (hash-stub embedder, dry-run mapper) are the
  * defaults in this zero-egress environment, and the live HTTP path is an
  * OpenAI-compatible chat client exercised against local mock servers.
  */
trait EmbeddingsClient extends Serializable {
  /** Must return exactly one vector per input text. */
  def embedDocuments(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic offline embedder backed by the SHA-256 hash stub. */
final case class HashEmbeddingsClient(dims: Int = 16, normalize: Boolean = true)
    extends EmbeddingsClient {
  private val encoder = graft.similarity.HashStubEncoder(dims, normalize)
  def embedDocuments(texts: Seq[String]): Seq[Array[Float]] = encoder.encode(texts)
}

trait TextSplitter extends Serializable {
  def splitText(text: String): Seq[String]
}

/** Fixed-size character chunker (the shape of LangChain's splitters). */
final case class CharChunkSplitter(chunkSize: Int) extends TextSplitter {
  require(chunkSize > 0, "chunkSize must be positive")
  def splitText(text: String): Seq[String] =
    if (text.isEmpty) Seq(text) else text.grouped(chunkSize).toSeq
}

/** Structure-aware chunker in the shape of LangChain's
  * RecursiveCharacterTextSplitter (the reference's splitter seam,
  * llm.py:107-128): try separators in order (paragraph → line → word),
  * recursively re-split pieces that still exceed `chunkSize` with the
  * remaining separators, then greedily pack adjacent pieces into chunks.
  * Each piece keeps its trailing separator, so with `chunkOverlap` = 0 the
  * chunks concatenate back to the exact input. `chunkOverlap` > 0 prefixes
  * every chunk after the first with the tail of its predecessor; fresh
  * content is packed to `chunkSize - chunkOverlap` so no emitted chunk
  * ever exceeds `chunkSize` INCLUDING its overlap — the LangChain contract
  * (a downstream encoder's hard input limit must hold for every chunk).
  */
final case class RecursiveCharSplitter(
    chunkSize: Int,
    chunkOverlap: Int = 0,
    separators: Seq[String] = Seq("\n\n", "\n", " ", "")) extends TextSplitter {
  require(chunkSize > 0, "chunkSize must be positive")
  require(chunkOverlap >= 0 && chunkOverlap < chunkSize,
    "chunkOverlap must be in [0, chunkSize)")
  require(separators.nonEmpty, "separators must not be empty")

  private val budget = chunkSize - chunkOverlap

  def splitText(text: String): Seq[String] =
    if (text.length <= chunkSize) Seq(text)
    else {
      val chunks = pack(atoms(text, separators))
      if (chunkOverlap == 0) chunks
      else chunks.head +: chunks.sliding(2).map {
        case Seq(prev, cur) => prev.takeRight(chunkOverlap) + cur
        case other => other.last
      }.toSeq
    }

  /** Pieces no longer than `budget`, separators kept on piece tails. */
  private def atoms(text: String, seps: Seq[String]): Seq[String] =
    if (text.length <= budget) Seq(text)
    else seps match {
      case Seq() => text.grouped(budget).toSeq
      case sep +: rest =>
        if (sep.isEmpty || !text.contains(sep)) atoms(text, rest)
        else splitKeepingSep(text, sep).flatMap(p => atoms(p, rest))
    }

  private def splitKeepingSep(text: String, sep: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var from = 0
    var at = text.indexOf(sep, from)
    while (at >= 0) {
      out += text.substring(from, at + sep.length)
      from = at + sep.length
      at = text.indexOf(sep, from)
    }
    if (from < text.length) out += text.substring(from)
    out.result()
  }

  /** Greedily merge adjacent atoms into chunks of at most `budget`. */
  private def pack(pieces: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    pieces.foreach { p =>
      if (cur.nonEmpty && cur.length + p.length > budget) {
        out += cur.result()
        cur.clear()
      }
      cur ++= p
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }
}

/** Whitespace-token chunker: windows of `chunkTokens` tokens advancing by
  * `chunkTokens - overlapTokens` — the token-count-bounded analogue for
  * models with token (not character) context limits.
  */
final case class TokenChunkSplitter(chunkTokens: Int, overlapTokens: Int = 0)
    extends TextSplitter {
  require(chunkTokens > 0, "chunkTokens must be positive")
  require(overlapTokens >= 0 && overlapTokens < chunkTokens,
    "overlapTokens must be in [0, chunkTokens)")
  def splitText(text: String): Seq[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length <= chunkTokens) Seq(text)
    else toks.sliding(chunkTokens, chunkTokens - overlapTokens)
      .map(_.mkString(" ")).toSeq
  }
}

object Llm {

  /** Chat-completion client seam for [[mapColumnWithLlm]]'s live path. */
  trait ChatClient extends Serializable {
    /** Return the raw completion text for a mapping prompt. */
    def complete(value: String, targets: Seq[String]): Option[String]
  }

  /** OpenAI-compatible chat-completions client. Configuration via env vars
    * (llm.py:239-282): `OPENAI_API_KEY`, optional `OPENAI_BASE_URL`
    * (default https://api.openai.com/v1) or Azure's
    * `AZURE_OPENAI_ENDPOINT`/`AZURE_OPENAI_API_KEY`/`AZURE_OPENAI_API_VERSION`.
    * Retries with `min(2^attempt, 60)`s backoff on failures (llm.py:351-381);
    * a temperature-rejection error retries without the parameter.
    */
  final case class OpenAiChatClient(
      model: String = "gpt-3.5-turbo",
      maxRetries: Int = 3,
      requestTimeout: Double = 30.0,
      temperature: Option[Double] = Some(0.0),
      env: Map[String, String] = sys.env) extends ChatClient {

    private def config: (String, Map[String, String]) =
      env.get("AZURE_OPENAI_ENDPOINT") match {
        case Some(endpoint) =>
          val version = env.getOrElse("AZURE_OPENAI_API_VERSION", "2024-02-01")
          val key = env.getOrElse("AZURE_OPENAI_API_KEY",
            throw new IllegalStateException("AZURE_OPENAI_API_KEY is not set"))
          (s"${endpoint.stripSuffix("/")}/openai/deployments/$model/chat/completions" +
            s"?api-version=$version", Map("api-key" -> key))
        case None =>
          val base = env.getOrElse("OPENAI_BASE_URL", "https://api.openai.com/v1")
          val key = env.getOrElse("OPENAI_API_KEY",
            throw new IllegalStateException("OPENAI_API_KEY is not set"))
          (s"${base.stripSuffix("/")}/chat/completions",
            Map("Authorization" -> s"Bearer $key"))
      }

    def complete(value: String, targets: Seq[String]): Option[String] = {
      val (url, headers) = config
      val prompt =
        s"""Map the input value to exactly one of the allowed values, or answer
           |"none" if no value fits. Answer with the value only.
           |Allowed values: ${targets.mkString(", ")}
           |Input: $value""".stripMargin
      def body(withTemperature: Boolean): String = {
        val base = mutable.LinkedHashMap[String, Any](
          "model" -> model,
          "messages" -> Seq(
            Map("role" -> "system",
              "content" -> "You normalize values to a canonical list."),
            Map("role" -> "user", "content" -> prompt)))
        if (withTemperature) temperature.foreach(t => base += "temperature" -> t)
        Json.toJson(base.toMap)
      }
      var withTemp = temperature.isDefined
      var attempt = 0
      val attempts = math.max(maxRetries, 0) + 1
      while (attempt < attempts) {
        try {
          val r = Http.requestOnce(Http.Spec("POST", url, headers,
            Some(body(withTemp)), Some("application/json"), requestTimeout))
          if (r.status >= 200 && r.status < 300) {
            val node = Json.parse(r.body)
            val content = Option(node.get("choices")).filter(_.isArray)
              .flatMap(c => Option(c.get(0)))
              .flatMap(c => Option(c.get("message")))
              .flatMap(m => Option(m.get("content")))
              .map(_.asText.trim)
            // Strip surrounding quotes, then accept only canonical targets
            // (case-insensitive) — a free-form completion is "unmapped", the
            // same as the reference's _fetch_llm_mapping (llm.py:396-413).
            val byLower = targets.map(t => t.toLowerCase -> t).toMap
            return content
              .map { c =>
                if (c.length >= 2 && c.startsWith("\"") && c.endsWith("\""))
                  c.substring(1, c.length - 1).trim
                else c
              }
              .filter(c => c.nonEmpty && c.toLowerCase != "none")
              .flatMap(c => byLower.get(c.toLowerCase))
          }
          if (r.status == 400 && withTemp &&
            r.body.toLowerCase.contains("temperature")) {
            withTemp = false // retry without the rejected parameter
          }
        } catch { case _: Exception => () }
        attempt += 1
        if (attempt < attempts)
          Thread.sleep(math.min(math.pow(2, attempt), 60.0).toLong * 1000)
      }
      None
    }
  }

  /** Add an embeddings column via a pluggable client: executor-lazy client,
    * optional chunking, fixed-size batches, mean/first chunk aggregation
    * (with_langchain_embeddings, llm.py:53-236).
    */
  def withEmbeddings(
      df: DataFrame,
      inputCol: String,
      embeddingsFactory: () => EmbeddingsClient,
      outputCol: String = "embedding",
      batchSize: Int = 16,
      textSplitter: Option[() => TextSplitter] = None,
      aggregation: String = "mean",
      dropInput: Boolean = false): DataFrame = {
    val inputIdx = df.columns.indexOf(inputCol)
    require(inputIdx >= 0, s"Column '$inputCol' not found in DataFrame")
    require(batchSize > 0, "batchSize must be a positive integer")
    val aggMode = aggregation.toLowerCase
    require(Set("mean", "first").contains(aggMode),
      "aggregation must be one of: 'mean', 'first'")
    val outSchema = StructType(
      df.schema.fields :+ StructField(outputCol, ArrayType(FloatType)))
    val factory = embeddingsFactory
    val splitterFactory = textSplitter
    val bs = batchSize
    val out = df.mapPartitions { rows =>
      lazy val embedder = factory()
      lazy val splitter = splitterFactory.map(_())
      rows.grouped(bs).flatMap { batch =>
        val texts = batch.map { r =>
          val v = r.get(inputIdx)
          if (v == null) "" else v.toString
        }
        // chunk, flat-embed in batchSize groups, re-aggregate per row
        val chunksPerRow = texts.map { t =>
          val chunks = splitter.map(_.splitText(t)).getOrElse(Seq(t))
          if (chunks.isEmpty) Seq(t) else chunks
        }
        val flat = chunksPerRow.flatten
        val vectors = flat.grouped(bs).flatMap { group =>
          val vs = embedder.embedDocuments(group)
          require(vs.length == group.length,
            s"Embeddings model returned ${vs.length} vectors for ${group.length} inputs")
          vs
        }.toIndexedSeq
        var cursor = 0
        batch.iterator.zip(chunksPerRow.iterator).map { case (r, chunks) =>
          val rowVecs = vectors.slice(cursor, cursor + chunks.length)
          cursor += chunks.length
          val agg: Seq[Float] =
            if (rowVecs.isEmpty) Seq.empty
            else if (aggMode == "first") rowVecs.head.toSeq
            else {
              val dim = rowVecs.head.length
              require(rowVecs.forall(_.length == dim),
                "Embeddings model returned vectors of differing dimensions")
              val sums = Array.fill(dim)(0.0)
              rowVecs.foreach(v => (0 until dim).foreach(i => sums(i) += v(i)))
              sums.map(s => (s / rowVecs.length).toFloat).toSeq
            }
          Row.fromSeq(r.toSeq :+ agg)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
    if (dropInput) out.drop(inputCol) else out
  }

  /** Mapping statistics surfaced after [[mapColumnWithLlm]].
    *
    * Accumulator-driven, so under task retries or speculative execution the
    * counts are upper bounds, not exact (the reference's accumulators behave
    * the same way). The result DataFrame is cached to guarantee the client
    * runs once per invocation — call [[MappedColumn.unpersist]] when done
    * with it in long-lived sessions.
    */
  final case class MappingStats(mapped: Long, unmapped: Long, apiCalls: Long)
  final case class MappedColumn(df: DataFrame, stats: MappingStats) {
    /** Release the cached result (the frame stays usable, just recomputes). */
    def unpersist(): DataFrame = df.unpersist()
  }

  /** Normalize a column's values to a canonical target list.
    *
    * Dry-run: deterministic case-insensitive lookup, no network. Live:
    * per-executor memo cache in front of the [[ChatClient]]. Accumulators
    * count mapped/unmapped/API calls; the result is cached and counted once
    * so stats are exact and the client runs once per distinct invocation
    * (map_column_with_llm, llm.py:416-561).
    */
  def mapColumnWithLlm(
      df: DataFrame,
      column: String,
      targetValues: Seq[String],
      dryRun: Boolean = false,
      chatClient: Option[ChatClient] = None,
      outputCol: Option[String] = None): MappedColumn = {
    require(df.columns.contains(column), s"Column '$column' not found in DataFrame")
    val targets = targetValues.distinct
    require(targets.nonEmpty, "targetValues must contain at least one entry")
    val lookup = targets.map(t => t.toLowerCase -> t).reverse.toMap
    val sc = df.sparkSession.sparkContext
    val callsAcc = sc.longAccumulator(s"llm_api_calls_$column")
    val mappedAcc = sc.longAccumulator(s"mapped_entries_$column")
    val unmappedAcc = sc.longAccumulator(s"unmapped_entries_$column")
    val client = chatClient.getOrElse(OpenAiChatClient())
    val newCol = outputCol.getOrElse(s"${column}_mapped")

    val inputIdx = df.columns.indexOf(column)
    val outSchema = StructType(df.schema.fields :+ StructField(newCol, StringType))
    val mapped = df.mapPartitions { rows =>
      val cache = mutable.HashMap[String, Option[String]]()
      rows.map { r =>
        val raw = r.get(inputIdx)
        val result: Option[String] =
          if (raw == null || raw.toString.trim.isEmpty) { unmappedAcc.add(1); None }
          else {
            val value = raw.toString
            val out =
              if (dryRun) lookup.get(value.toLowerCase)
              else cache.getOrElseUpdate(value, {
                callsAcc.add(1)
                // flatMap, not getOrElse: a completion outside the
                // canonical target set means UNMAPPED (null), matching the
                // reference's _fetch_llm_mapping — passing the raw model
                // text through would leak free-form sentences into a
                // column contracted to hold only targetValues
                client.complete(value, targets)
                  .flatMap(c => lookup.get(c.toLowerCase))
              })
            if (out.isDefined) mappedAcc.add(1) else unmappedAcc.add(1)
            out
          }
        Row.fromSeq(r.toSeq :+ result.orNull)
      }
    }(RowEncoder.encoderFor(outSchema)).cache()
    mapped.count() // force a single pass so accumulators are exact
    MappedColumn(mapped,
      MappingStats(mappedAcc.value, unmappedAcc.value, callsAcc.value))
  }
}
