package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the tokenizer tier's trained artifacts — the
  * "ship the tokenizer to the training job" lifecycle step: [[Bpe]]
  * merge lists, [[Unigram]] piece vocabularies, and [[WordPiece]]
  * vocabularies, each as a parquet table under one directory with a
  * KIND-TAGGED params sidecar committed last (the [[Search]] /
  * Ann-index discipline: data files first, sidecar = the commit
  * marker, so a crashed save is detectably uncommitted, never a
  * half-vocabulary that silently tokenizes differently).
  *
  * Loads are loud on BOTH failure modes: a missing sidecar (crashed or
  * foreign directory) and a KIND mismatch — decoding a Unigram piece
  * table as a WordPiece vocabulary would not crash, it would silently
  * mis-tokenize an entire training corpus, which is the worst possible
  * failure. Analyzer constants that must survive the round trip
  * (BPE's end-of-word sentinel, WordPiece's continuation prefix and
  * unk token) are validated against the library's, so an artifact from
  * an incompatible fork refuses to load.
  */
object Tokenizers {

  val ParamsFileName = "_graft_tokenizer_params.json"

  private def fsOf(spark: SparkSession, path: String) = {
    val dir = new org.apache.hadoop.fs.Path(path)
    (dir.getFileSystem(spark.sessionState.newHadoopConf()), dir)
  }

  private def commitParams(
      spark: SparkSession, path: String, fields: Map[String, Any]): Unit = {
    val (fs, dir) = fsOf(spark, path)
    graft.io.Sidecar.commit(fs, dir, ParamsFileName,
      graft.io.Json.toJson(fields), overwrite = false): Unit
  }

  private def readKind(
      spark: SparkSession, path: String, wantKind: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val (fs, dir) = fsOf(spark, path)
    val raw = graft.io.Sidecar.read(fs, dir, ParamsFileName).getOrElse(
      throw new IllegalStateException(
        s"load: no $ParamsFileName at $path — not a committed tokenizer " +
          "artifact (or a crashed save; re-save it)"))
    val node = graft.io.Json.parse(raw)
    val kind = node.get("kind").asText()
    require(kind == wantKind,
      s"load: $path holds a '$kind' tokenizer, not '$wantKind' — loading " +
        "across kinds would silently mis-tokenize")
    node
  }

  /** Persist a BPE merge list (rank order IS the algorithm). */
  def saveBpe(spark: SparkSession, merges: Seq[Bpe.Merge], path: String): Unit = {
    require(merges.nonEmpty, "saveBpe: empty merge list")
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("errorifexists").parquet(path)
    commitParams(spark, path, Map("kind" -> "bpe",
      "end_of_word" -> Bpe.EndOfWord, "n_merges" -> merges.length))
  }

  /** Load a BPE merge list in rank order; loud on kind/sentinel drift
    * and on a count mismatch (a lost data file must not silently
    * truncate the merge program).
    */
  def loadBpe(spark: SparkSession, path: String): Seq[Bpe.Merge] = {
    val node = readKind(spark, path, "bpe")
    require(node.get("end_of_word").asText() == Bpe.EndOfWord,
      s"loadBpe: artifact uses sentinel '${node.get("end_of_word").asText()}'" +
        s" but this library uses '${Bpe.EndOfWord}'")
    val merges = spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
    require(merges.length == node.get("n_merges").asInt(),
      s"loadBpe: ${merges.length} merges on disk but the sidecar committed " +
        s"${node.get("n_merges").asInt()} — torn artifact")
    merges
  }

  /** Persist a [[Unigram.train]] vocabulary `(piece, score, token_id)`. */
  def saveUnigram(vocab: DataFrame, path: String): Unit = {
    val spark = vocab.sparkSession
    val n = vocab.select("piece", "score", "token_id").count()
    require(n > 0, "saveUnigram: empty vocabulary")
    vocab.select("piece", "score", "token_id")
      .write.mode("errorifexists").parquet(path)
    commitParams(spark, path, Map("kind" -> "unigram", "n_pieces" -> n))
  }

  /** Load a Unigram vocabulary for [[Unigram.encode]]. */
  def loadUnigram(spark: SparkSession, path: String): DataFrame = {
    val node = readKind(spark, path, "unigram")
    val vocab = spark.read.parquet(path).select("piece", "score", "token_id")
    require(vocab.count() == node.get("n_pieces").asLong(),
      s"loadUnigram: piece count drifted from the committed " +
        s"${node.get("n_pieces").asLong()} — torn artifact")
    vocab
  }

  /** Persist a [[WordPiece.train]] vocabulary `(piece, token_id)`. */
  def saveWordPiece(vocab: DataFrame, path: String): Unit = {
    val spark = vocab.sparkSession
    val n = vocab.select("piece", "token_id").count()
    require(n > 0, "saveWordPiece: empty vocabulary")
    vocab.select("piece", "token_id")
      .write.mode("errorifexists").parquet(path)
    commitParams(spark, path, Map("kind" -> "wordpiece", "n_pieces" -> n,
      "continuation_prefix" -> WordPiece.ContinuationPrefix,
      "unk" -> WordPiece.UnkToken))
  }

  /** Load a WordPiece vocabulary for [[WordPiece.encode]]. */
  def loadWordPiece(spark: SparkSession, path: String): DataFrame = {
    val node = readKind(spark, path, "wordpiece")
    require(node.get("continuation_prefix").asText() == WordPiece.ContinuationPrefix
        && node.get("unk").asText() == WordPiece.UnkToken,
      "loadWordPiece: artifact's continuation/unk markers differ from " +
        "this library's — incompatible artifact")
    val vocab = spark.read.parquet(path).select("piece", "token_id")
    require(vocab.count() == node.get("n_pieces").asLong(),
      s"loadWordPiece: piece count drifted from the committed " +
        s"${node.get("n_pieces").asLong()} — torn artifact")
    vocab
  }
}
