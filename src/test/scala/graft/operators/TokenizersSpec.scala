package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TokenizersSpec extends SparkTestBase {
  import spark.implicits._

  private def scratch(name: String): String =
    Files.createTempDirectory(s"graft_tok_$name").toString + "/art"

  private val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
    Seq.fill(5)("hugs")).toDF("text")

  test("all three tokenizer artifacts round-trip and encode identically") {
    val docs = Seq((1L, "hugs pug hug")).toDF("doc_id", "text")
    // BPE
    val (merges, wt) = Bpe.learnMerges(corpus, "text", numMerges = 6)
    graft.core.Caches.releaseCheckpoint(wt)
    val bpeDir = scratch("bpe")
    Tokenizers.saveBpe(spark, merges, bpeDir)
    val merges2 = Tokenizers.loadBpe(spark, bpeDir)
    assert(merges2 == merges, "merge list must round-trip in rank order")
    assert(Bpe.encode(docs, "doc_id", "text", merges2).collect().toSeq ==
      Bpe.encode(docs, "doc_id", "text", merges).collect().toSeq)
    // Unigram
    val uv = Unigram.train(corpus, "text", vocabSize = 10, seedSize = 50,
      iterations = 2, maxPieceLen = 4)
    val uniDir = scratch("uni")
    Tokenizers.saveUnigram(uv, uniDir)
    val uv2 = Tokenizers.loadUnigram(spark, uniDir)
    assert(uv2.collect().map(_.toSeq).toSet == uv.collect().map(_.toSeq).toSet)
    assert(Unigram.encode(docs, "doc_id", "text", uv2, maxPieceLen = 4)
      .collect().toSeq ==
      Unigram.encode(docs, "doc_id", "text", uv, maxPieceLen = 4)
        .collect().toSeq)
    // WordPiece
    val wv = WordPiece.train(corpus, "text", vocabSize = 10, minPairCount = 1)
    val wpDir = scratch("wp")
    Tokenizers.saveWordPiece(wv, wpDir)
    val wv2 = Tokenizers.loadWordPiece(spark, wpDir)
    assert(wv2.collect().map(_.toSeq).toSet == wv.collect().map(_.toSeq).toSet)
    assert(WordPiece.encode(docs, "doc_id", "text", wv2).collect().toSeq ==
      WordPiece.encode(docs, "doc_id", "text", wv).collect().toSeq)
  }

  test("loads are loud: missing sidecar, cross-kind, torn artifact, double save") {
    val (merges, wt) = Bpe.learnMerges(corpus, "text", numMerges = 3)
    graft.core.Caches.releaseCheckpoint(wt)
    val bpeDir = scratch("guard")
    Tokenizers.saveBpe(spark, merges, bpeDir)
    // cross-kind: a bpe artifact refuses to load as wordpiece/unigram
    intercept[IllegalArgumentException](Tokenizers.loadWordPiece(spark, bpeDir))
    intercept[IllegalArgumentException](Tokenizers.loadUnigram(spark, bpeDir))
    // double save refuses (artifacts are immutable)
    intercept[Exception](Tokenizers.saveBpe(spark, merges, bpeDir))
    // missing sidecar = uncommitted
    val bare = scratch("bare")
    merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "left", "right")
      .write.parquet(bare)
    intercept[IllegalStateException](Tokenizers.loadBpe(spark, bare))
    // empty artifacts refuse to save
    intercept[IllegalArgumentException](
      Tokenizers.saveBpe(spark, Nil, scratch("e1")))
    intercept[IllegalArgumentException](
      Tokenizers.saveUnigram(
        Seq.empty[(String, Double, Int)].toDF("piece", "score", "token_id"),
        scratch("e2")))
  }
}
