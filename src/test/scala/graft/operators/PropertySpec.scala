package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkTestBase
import graft.functions.Hashing

/** Property-based checks for the semantics-bearing primitives: the stable
  * row hash (SCD change detection depends on it bit-for-bit) and batch
  * sessionization invariants.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("rowHash == sha256(U+241F-joined, null→'') for arbitrary values") {
    val cell = Gen.oneOf(
      Gen.const(null: String),
      Gen.const(""),
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      // the delimiter itself inside a value must still hash stably
      Gen.alphaStr.map(s => s + "␟" + s))
    val rowGen = Gen.listOfN(3, cell)
    check(Prop.forAll(Gen.listOfN(8, rowGen)) { rows =>
      val df = rows.map { case List(a, b, c) => (a, b, c) }.toDF("a", "b", "c")
      val got = df.select(Hashing.rowHashOf(Seq("a", "b", "c"))).as[String].collect()
      val expected = rows.map { r =>
        sha256Hex(r.map(Option(_).getOrElse("")).mkString("␟"))
      }
      got.toSeq == expected
    }, n = 15)
  }

  test("splitByDateFormats round-trips dates through each declared format") {
    val fmts = Seq("yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy")
    val javaFmt = fmts.map(f =>
      f -> java.time.format.DateTimeFormatter.ofPattern(f)).toMap
    val dateGen = Gen.choose(0L, 25000L)
      .map(java.time.LocalDate.ofEpochDay) // 1970..2038
    val caseGen = for {
      d <- dateGen
      fmt <- Gen.oneOf(fmts)
    } yield (d, fmt)
    check(Prop.forAll(Gen.nonEmptyListOf(caseGen)) { cases =>
      val df = cases.zipWithIndex.map { case ((d, f), i) =>
        (i.toLong, d.format(javaFmt(f)))
      }.toDF("id", "d")
      val parsed = Transformations.splitByDateFormats(df, "d", fmts).df
        .select("id", "d_date").as[(Long, java.sql.Date)].collect().toMap
      cases.zipWithIndex.forall { case ((d, f), i) =>
        // first-match-wins: the parsed date must round-trip through SOME
        // declared format back to the same string (ambiguous strings like
        // 01/02/2001 may legally parse under an earlier format)
        val got = parsed(i.toLong).toLocalDate
        fmts.exists(g => javaFmt(g).format(got) == d.format(javaFmt(f)))
      }
    }, n = 10)
  }

  test("sessionizeBatch invariants: partition, gap bounds, sums") {
    val gap = 1000L
    val eventGen = for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 20000L)
      v <- Gen.choose(1, 100)
    } yield (user, ts, v.toDouble)
    check(Prop.forAll(Gen.nonEmptyListOf(eventGen)) { events =>
      val df = events.zipWithIndex
        .map { case ((u, t, v), i) => (i.toLong, t, u, v) }
        .toDF("event_id", "ts_us", "user_id", "value")
      val sessions = graft.streaming.StreamingOps
        .sessionizeBatch(df, gap = gap)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Long]("n_events")))
      val byUser = events.groupBy(_._1)
      // every event lands in exactly one session
      val totalEvents = sessions.map(_._4).sum
      val p1 = totalEvents == events.length
      // session bounds are consistent and sessions of one user don't overlap
      // and are separated by more than the gap
      val p2 = sessions.groupBy(_._1).forall { case (u, ss) =>
        val sorted = ss.sortBy(_._2)
        sorted.forall { case (_, s, e, _) => s <= e } &&
          sorted.sliding(2).forall {
            case Array((_, _, e1, _), (_, s2, _, _)) => s2 - e1 > gap
            case _ => true
          }
      }
      // per-user event timestamps inside a session step by <= gap
      val p3 = sessions.forall { case (u, s, e, _) =>
        val ts = byUser(u).map(_._2).filter(t => t >= s && t <= e).sorted
        ts.nonEmpty &&
          ts.sliding(2).forall {
            case Seq(t1, t2) => t2 - t1 <= gap
            case _ => true
          }
      }
      p1 && p2 && p3
    }, n = 15)
  }

  test("connectedComponents: every dispatch tier equals a reference closure") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 25L)
      b <- Gen.chooseNum(0L, 25L)
    } yield (a, b)
    check(Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      val pairs = edges.toDF("a", "b")
      // reference: naive closure over the undirected edge set
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val adj = edges.filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = nodes.map { n =>
        var seen = Set(n)
        var frontier = Set(n)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= frontier
        }
        n -> seen.min
      }.toMap
      Seq("local", "labelprop", "stars").forall { alg =>
        val got = Dedup.connectedComponents(pairs, "a", "b", algorithm = alg)
          .as[(Long, Long)].collect().toMap
        got == expected
      }
    }, n = 8)
  }

  test("winnowingFingerprints equals a reference sliding-window-min for arbitrary docs") {
    def hash60(s: String): Long = java.lang.Long.parseLong(
      sha256Hex(s).take(15), 16)
    def ref(text: String, n: Int, w: Int): Set[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) return Set.empty
      val sh = (0 until math.max(toks.length - (n - 1), 1))
        .map(i => toks.slice(i, i + n).mkString(" "))
      val hs = sh.map(hash60)
      (0 until math.max(hs.length - (w - 1), 1))
        .map(i => hs.slice(i, i + w).min).toSet
    }
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docGen = Gen.listOf(word).map(_.mkString(" "))
    val params = for {
      n <- Gen.choose(1, 4); w <- Gen.choose(1, 5)
    } yield (n, w)
    check(Prop.forAll(Gen.listOfN(6, docGen), params) { case (docs, (n, w)) =>
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("id", "text")
      val got = df.select(col("id"),
        TextAnalysis.winnowingFingerprints(col("text"), n, w).as("fps"))
        .as[(Long, Seq[Long])].collect().toMap
      docs.zipWithIndex.forall { case (d, i) =>
        got(i.toLong).toSet == ref(d, n, w)
      }
    }, n = 15)
  }

  test("sharedFingerprintPairs honors the MOSS guarantee on planted runs") {
    // the winnowing guarantee lifted to pair level: two docs sharing a
    // token run of length >= shingleSize + window - 1 (here 5 + 4 - 1 = 8)
    // MUST appear as a pair with minShared = 1 and no frequency cap
    val word = Gen.oneOf("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9")
    val padGen = Gen.listOfN(12, word).map(_.mkString(" "))
    val runGen = Gen.listOfN(8, word).map(_.mkString(" "))
    check(Prop.forAll(runGen, padGen, padGen) { (run, padA, padB) =>
      val df = Seq(
        (1L, s"$padA $run"),
        (2L, s"$run $padB")
      ).toDF("id", "text")
      val pairs = Dedup.sharedFingerprintPairs(df, "id", "text",
        minShared = 1, maxDocsPerFingerprint = 1000)
        .as[(Long, Long, Long)].collect()
      pairs.exists(p => p._1 == 1L && p._2 == 2L)
    }, n = 12)
  }

  test("BpeApplyMerges equals the reference fold for arbitrary merge lists") {
    // small alphabet so random merges actually apply, with composite
    // symbols so later ranks can consume earlier ranks' outputs (the
    // ordering-sensitive case) and repeated symbols so overlapping-run
    // greediness ("aaaa" + (a,a) → [aa, aa]) is exercised
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "</w>")
    val word = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, sym))
    val merge = for { l <- sym; r <- sym } yield (l, r)
    val gen = for {
      words <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word))
      merges <- Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, merge))
    } yield (words, merges)
    def refApplyOne(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (out, x) =>
        if (out.nonEmpty && out.last == l && x == r)
          out.init :+ (l + r)
        else out :+ x
      }
    check(Prop.forAll(gen) { case (words, merges) =>
      val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "syms")
      val got = df
        .select(col("i"), graft.functions.BpeApplyMerges(col("syms"), merges))
        .as[(Int, Seq[String])].collect().sortBy(_._1).map(_._2.toList).toList
      val expect = words.map(w =>
        merges.foldLeft(w) { case (s, (l, r)) => refApplyOne(s, l, r) })
      got == expect
    }, n = 40)
  }

  test("asofJoin equals a reference merge_asof in every direction, with tolerance") {
    val keyGen = Gen.oneOf("a", "b")
    val leftGen = for {
      k <- keyGen; ts <- Gen.option(Gen.chooseNum(0L, 40L))
    } yield (k, ts)
    val rightGen = for {
      k <- keyGen; ts <- Gen.chooseNum(0L, 40L); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, ts, v)
    check(Prop.forAll(
      Gen.listOfN(10, leftGen), Gen.listOfN(8, rightGen),
      Gen.oneOf("backward", "forward", "nearest"),
      Gen.option(Gen.chooseNum(0L, 10L))) { (ls0, rs0, dir, tol) =>
      val ls = ls0.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      // right side must be unique per (key, ts) — the operator's contract
      val rs = rs0.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val left = ls.toDF("id", "k", "ts")
      val right = rs.toDF("k", "ts", "v")
      val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
        direction = dir, tolerance = tol)
        .select("id", "v").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      val want = ls.map { case (id, k, tsOpt) =>
        id -> (tsOpt match {
          case None => None
          case Some(ts) =>
            val cands = rs.filter(_._1 == k)
            val back = cands.filter(_._2 <= ts).sortBy(_._2).lastOption
            val fwd = cands.filter(_._2 >= ts).sortBy(_._2).headOption
            val m = dir match {
              case "backward" => back
              case "forward" => fwd
              case "nearest" => (back, fwd) match {
                case (Some(b), Some(f)) =>
                  // strictly closer forward wins; ties go backward
                  if (math.abs(ts - f._2) < math.abs(ts - b._2)) Some(f)
                  else Some(b)
                case (b, f) => b.orElse(f)
              }
            }
            m.filter(r => tol.forall(t => math.abs(ts - r._2) <= t)).map(_._3)
        })
      }.toMap
      got == want
    }, n = 60)
  }

  test("ngramContainmentPairs equals a brute-force reference on arbitrary corpora") {
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, tokGen).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(7, docGen)) { docs0 =>
      val docs = docs0.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("id", "text").withColumn("blk", lit("x"))
      val got = Dedup.ngramContainmentPairs(df, "id", "text", Seq("blk"),
        n = 3, threshold = 0.4, minSize = 2)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Double]("containment"))).toSet
      def sh(t: String): Set[String] = {
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) Set.empty
        else if (toks.length <= 3) Set(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = sh(ta); sb = sh(tb)
        if sa.size >= 2 && sb.size >= 2
        c = (sa intersect sb).size
        cont = BigDecimal(c.toDouble / math.min(sa.size, sb.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if cont >= 0.4
      } yield (ia, ib, cont)).toSet
      got == want
    }, n = 40)
  }

  test("waterfillAllocations equals the reference waterfill for arbitrary counts") {
    import org.scalacheck.Prop.propBoolean
    val countsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
      .map(_.take(12))
    val budgetGen = Gen.chooseNum(0L, 400L)
    check(Prop.forAll(countsGen, budgetGen) { (counts, budget) =>
      val df = counts.zipWithIndex
        .map { case (c, i) => (s"g$i", c) }.toDF("grp", "n")
      val out = Sampling.waterfillAllocations(df, "grp", "n", budget)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
      // reference: scan caps upward until the budget is exceeded
      val total = counts.sum
      val refCap: Long =
        if (total <= budget) Long.MaxValue
        else (0L to counts.max).reverse
          .find(c => counts.map(math.min(_, c)).sum <= budget)
          .getOrElse(0L)
      val expect = counts.zipWithIndex
        .map { case (c, i) => s"g$i" -> math.min(c, refCap) }.toMap
      val alloc = out.values.sum
      (out == expect) :| s"alloc mismatch: $out vs $expect (cap $refCap)" &&
        (alloc <= math.max(budget, 0L) || total <= budget) :|
          s"budget exceeded: $alloc > $budget"
    }, n = 60)
  }

  test("assignShards balance invariant for arbitrary token distributions") {
    import org.scalacheck.Prop.propBoolean
    val docsGen = Gen.nonEmptyListOf(Gen.chooseNum(1L, 500L)).map(_.take(60))
    val shardsGen = Gen.chooseNum(1, 6)
    check(Prop.forAll(docsGen, shardsGen) { (toks, n) =>
      val df = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n_tok")
      val out = Packing.assignShards(df, "doc_id", "n_tok", n,
        orderBuckets = 8)
        .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_tok")))
      val totals = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val target = (toks.sum + n - 1) / n
      val maxDoc = toks.max
      val inBand = totals.forall { case (_, t) =>
        t <= target + maxDoc && t >= target - maxDoc }
      val shardsOk = out.forall { case (s, _) => s >= 0 && s < n }
      inBand :| s"totals $totals out of $target ± $maxDoc" &&
        shardsOk :| s"shard id out of range in ${totals.keySet}"
    }, n = 40)
  }

  test("tokenBudgetPerGroup equals the reference greedy fill for arbitrary groups") {
    val rowGen = for {
      grp <- Gen.oneOf("a", "b", "c")
      tok <- Gen.chooseNum(1L, 50L)
    } yield (grp, tok)
    check(Prop.forAll(
      Gen.listOfN(25, rowGen), Gen.chooseNum(10L, 120L)) { (rows0, budget) =>
      val rows = rows0.zipWithIndex.map { case ((g, t), i) => (g, i.toLong, t) }
      val df = rows.toDF("grp", "id", "n_tok")
      val got = Sampling.tokenBudgetPerGroup(df, Seq("grp"), "n_tok", budget,
        Seq(col("id"))).collect().map(_.getAs[Long]("id")).toSet
      // reference: per group in id order, keep while exclusive cumsum < budget
      val expect = rows.groupBy(_._1).values.flatMap { g =>
        g.sortBy(_._2).foldLeft((0L, List.empty[Long])) {
          case ((cum, kept), (_, id, tok)) =>
            if (cum < budget) (cum + tok, id :: kept) else (cum, kept)
        }._2
      }.toSet
      val maxTok = rows.map(_._3).max
      val groupTotals = got.nonEmpty && rows.filter(r => got(r._2))
        .groupBy(_._1).values.forall(_.map(_._3).sum < budget + maxTok)
      got == expect && groupTotals
    }, n = 40)
  }

  test("chunkTokens equals the reference sliding windows for arbitrary docs") {
    val docGen = for {
      n <- Gen.chooseNum(0, 30)
      toks <- Gen.listOfN(n, Gen.alphaStr.map(s => "t" + s.take(3)))
    } yield toks
    val params = for {
      window <- Gen.chooseNum(1, 8)
      stride <- Gen.chooseNum(1, 8) if stride <= window
    } yield (window, stride)
    check(Prop.forAll(docGen, params) { case (toks, (window, stride)) =>
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
      val got = TextAnalysis.chunkTokens(df, "id", "text", window, stride)
        .orderBy("chunk_idx")
        .collect().map(r => (r.getAs[Long]("chunk_start"),
          r.getAs[String]("chunk_text"))).toSeq
      // reference: starts 0, stride, … until a window covers the end
      val expect =
        if (toks.isEmpty) Seq.empty
        else {
          val starts = Iterator.iterate(0)(_ + stride)
            .takeWhile(s => s == 0 || s < toks.length && s - stride + window < toks.length)
            .toSeq
          starts.map(s => (s.toLong, toks.slice(s, s + window).mkString(" ")))
        }
      // invariants: every token covered by >= 1 chunk; concat of
      // stride-aligned prefixes reconstructs the doc
      val covered = got.flatMap { case (s, t) =>
        s.toInt until (s.toInt + t.split(" ").count(_.nonEmpty)) }.toSet
      (got == expect) && (toks.isEmpty || covered == toks.indices.toSet)
    }, n = 60)
  }

  test("meanPool equals the nano-exact driver reference for arbitrary groups") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-10.0, 10.0))
    val rowGen = for {
      g <- Gen.chooseNum(1, 3)
      v <- vecGen
    } yield (g.toLong, v.toArray)
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.take(12))) { rows =>
      val df = rows.toDF("gid", "vec")
      val got = graft.similarity.Pooling.meanPool(df, "gid", "vec")
        .collect().map(r => r.getAs[Long]("gid") -> r.getSeq[Double](1)).toMap
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val nanos = rs.map(_._2.map(x => math.round(x * 1e9)))
        val sums = nanos.transpose.map(_.sum)
        g -> sums.map(s => (s.toDouble / rs.size) / 1e9).toSeq
      }
      got.keySet == expect.keySet && expect.forall { case (g, v) =>
        got(g) == v // EXACT equality — the nano discipline's whole point
      }
    }, n = 40)
  }

  test("noveltyFrac equals a brute-force first-seen reference on arbitrary corpora") {
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = for {
      n <- Gen.chooseNum(0, 8)
      toks <- Gen.listOfN(n, tokGen)
    } yield toks.mkString(" ")
    check(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val got = TextAnalysis.noveltyFrac(df, "doc_id", "text",
        col("doc_id"), shingleSize = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_seen")))).toMap
      // reference: the same truncated-shingle convention, strict order
      def sh(t: String): Set[String] = {
        val toks = t.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) Set.empty
        else (0 until math.max(toks.length - 1, 1))
          .map(i => toks.slice(i, i + 2).mkString(" ")).toSet
      }
      val shingles = rows.map { case (id, t) => id -> sh(t) }.toMap
      rows.forall { case (id, _) =>
        val mine = shingles(id)
        val earlier = rows.filter(_._1 < id).flatMap(r => shingles(r._1)).toSet
        got(id) == ((mine.size.toLong, mine.count(earlier).toLong))
      }
    }, n = 40)
  }
}
