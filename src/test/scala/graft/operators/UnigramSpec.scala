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

  test("encode at 64k vocab: piece table stays operator-embedded, plan text bounded") {
    // a production-shaped vocabulary: 64k synthetic multi-char pieces
    // + the chars they decompose into. The pin: the piece table rides
    // INSIDE UnigramViterbi (serialized once with the plan), never as
    // a vocab-sized Literal/CreateArray — so the PLAN TEXT stays
    // kilobytes while the model is 64k entries. A literal table would
    // print every entry here (and bloat every task's codegen source).
    val n = 65536
    val pieces = (0 until n).map(i => (f"p$i%05x", -1.0 - i * 1e-6)) ++
      Seq(("p", -20.0), ("0", -20.0), ("1", -20.0), ("2", -20.0),
        ("3", -20.0), ("4", -20.0), ("5", -20.0), ("6", -20.0),
        ("7", -20.0), ("8", -20.0), ("9", -20.0), ("a", -20.0),
        ("b", -20.0), ("c", -20.0), ("d", -20.0), ("e", -20.0),
        ("f", -20.0))
    val vocab = pieces.zipWithIndex
      .map { case ((p, s), i) => (p, s, i) }
      .toDF("piece", "score", "token_id")
    val docs = Seq((1L, "p000ff p0fff0"), (2L, "pzz")).toDF("doc_id", "text")
    val out = Unigram.encode(docs, "doc_id", "text", vocab,
      maxPieceLen = 6)
    val planText = out.queryExecution.optimizedPlan.toString
    assert(planText.length < 20000,
      s"optimized plan text is ${planText.length} chars — a 64k piece " +
        "table leaked into the plan as a literal")
    // and the big-vocab encode is still CORRECT: whole-word pieces win
    // over char decompositions, unmodeled chars fall back to unk
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getSeq[String](r.fieldIndex("pieces")).toList).toMap
    assert(rows(1L) == List("p000ff", "p0fff0"), s"got ${rows(1L)}")
    assert(rows(2L) == List("p", "z", "z"), s"got ${rows(2L)}")
  }
}
