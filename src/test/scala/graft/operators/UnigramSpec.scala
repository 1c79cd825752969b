package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    "abab abab abab cd",
    "abab cd",
    "abab abab").toDF("text")

  test("train: likelihood keeps the bound piece, drops unused substrings, chars always covered") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 10,
      seedSize = 50, iterations = 3, maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getInt(2))).toMap
    // the whole word survives as one piece (Viterbi prefers one
    // high-mass piece over products of smaller probabilities), the
    // intermediate substrings (ab, ba, aba, …) starve to zero and drop
    assert(vocab.contains("abab"), s"pieces: ${vocab.keySet}")
    assert(vocab.contains("cd"))
    assert(!vocab.contains("ba") && !vocab.contains("aba"),
      s"unused substrings must be pruned: ${vocab.keySet}")
    // every single character persists (coverage floor)
    assert(Set("a", "b", "c", "d").subsetOf(vocab.keySet))
    // the dominant piece carries the best score and the first id
    assert(vocab("abab")._2 == 0, s"ids: $vocab")
    assert(vocab("abab")._1 > vocab("cd")._1)
    // deterministic end-to-end
    val again = Unigram.train(corpus, "text", vocabSize = 10,
      seedSize = 50, iterations = 3, maxPieceLen = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    assert(again == vocab.map { case (p, (s, i)) => (p, s, i) }.toSet)
  }

  test("encode: Viterbi pieces with ids in order; unseen chars fall back to unk singles") {
    val vocab = Unigram.train(corpus, "text", vocabSize = 10,
      seedSize = 50, iterations = 3, maxPieceLen = 4)
    val docs = Seq((1L, "abab cd"), (2L, "abab zq cd")).toDF("doc_id", "text")
    val out = Unigram.encode(docs, "doc_id", "text", vocab, maxPieceLen = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"),
          r.getSeq[String](r.fieldIndex("pieces")).toList,
          r.getSeq[Int](r.fieldIndex("token_ids")).toList)).toMap
    val ids = vocab.collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(out(1L) == (2L, List("abab", "cd"),
      List(ids("abab"), ids("cd"))), s"got ${out(1L)}")
    // "zq": neither char modeled -> single-char unk fallback, UnkId ids
    assert(out(2L)._2 == List("abab", "z", "q", "cd"), s"got ${out(2L)}")
    assert(out(2L)._3 == List(ids("abab"), Unigram.UnkId, Unigram.UnkId,
      ids("cd")))
    // vocabSize caps multis but never evicts chars
    val tiny = Unigram.train(corpus, "text", vocabSize = 4,
      seedSize = 50, iterations = 2, maxPieceLen = 4)
      .select("piece").as[String].collect().toSet
    assert(Set("a", "b", "c", "d").subsetOf(tiny))
    intercept[IllegalArgumentException](
      Unigram.train(corpus, "text", vocabSize = 0))
    intercept[IllegalArgumentException](
      Unigram.train(corpus.where(lit(false)), "text", vocabSize = 4,
        seedSize = 50))
  }
}
