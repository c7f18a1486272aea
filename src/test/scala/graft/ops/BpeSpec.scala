package graft.ops

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.functions.BpeExprs

/** Pins the public Sennrich-et-al-2016 greedy BPE encode semantics
  * (graft.functions.BpeExprs) against values computed with an
  * independent reference implementation, plus the operator wiring into
  * the token-budget family (budgetSelect / packSequences / chunking). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def countOf(s: String, merges: Seq[(String, String)] = Bpe.demoMerges): Int =
    Seq(s).toDF("s").select(Bpe.tokenCount(spark, col("s"), merges))
      .as[Int].head()

  private def toksOf(s: String, merges: Seq[(String, String)] = Bpe.demoMerges): Seq[String] =
    Seq(s).toDF("s").select(Bpe.tokens(spark, col("s"), merges))
      .as[Seq[String]].head()

  test("token sequences match the independent reference implementation") {
    assert(toksOf("the") == Seq("the</w>"))
    assert(toksOf("the theater theme")
      == Seq("the</w>", "the", "at", "er</w>", "the", "m", "e</w>"))
    assert(toksOf("and standing under")
      == Seq("and</w>", "s", "t", "and", "ing</w>", "u", "n", "d", "er</w>"))
    assert(toksOf("ordering") == Seq("or", "d", "er", "ing</w>"))
    assert(countOf("supercalifragilistic") == 20)
  }

  test("merge PRIORITY decides, not scan order: 'ther' merges (t,h) before (e,r)") {
    // rank 0 (t,h) then rank 1 (th,e) win over rank 7 (e,r); a
    // lowest-rank-first loop yields [the, r, </w>]; a leftmost-pair or
    // wrong-priority loop would yield [th, er</w>] (2 tokens)
    assert(toksOf("ther") == Seq("the", "r", "</w>"))
    assert(countOf("ther") == 3)
  }

  test("empty merge table yields the symbol floor: code points + 1 per word") {
    assert(countOf("the", Seq.empty) == 4)
    assert(countOf("naïve café", Seq.empty) == 11) // ï/é count once each
    assert(countOf("", Seq.empty) == 0)
    assert(countOf(" \t\n ", Seq.empty) == 0)
  }

  test("counts are exactly additive across whitespace") {
    for ((a, b) <- Seq(("the", "and"), ("sort merge join", "ingrained ordering"),
        ("a  b", "the"))) {
      assert(countOf(a + " " + b) == countOf(a) + countOf(b))
      assert(countOf(a + "\n\t " + b) == countOf(a) + countOf(b))
    }
  }

  test("null text yields null count") {
    val out = Seq((1, Option.empty[String]), (2, Some("the"))).toDF("id", "s")
      .select(Bpe.tokenCount(spark, col("s"), Bpe.demoMerges).as("n"))
      .as[Option[Int]].collect().toSet
    assert(out == Set(None, Some(1)))
  }

  test("word repetition hits the per-thread cache without changing results") {
    val text = Seq.fill(5000)("the ordering and").mkString(" ")
    assert(countOf(text) == 5000 * (1 + 4 + 1))
  }

  test("chunkByTokenBudget partitions the word stream within the budget") {
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(i)("the ordering and").mkString(" "))).toDF("id", "s")
    val out = docs.select(col("id"),
        Bpe.tokenCount(spark, col("s"), Bpe.demoMerges).as("total"),
        inline_outer(Bpe.chunkByTokenBudget(spark, col("s"), Bpe.demoMerges, 16)))
      .groupBy("id").agg(
        first("total").as("total"),
        coalesce(sum("chunk_tokens"), lit(0L)).as("sum_chunks"),
        coalesce(max("chunk_tokens"), lit(0)).as("max_chunk"),
        count(col("chunk_idx")).as("n_chunks"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("sum_chunks") == r.getAs[Int]("total").toLong,
        s"chunks must partition the tokens: $r")
      assert(r.getAs[Int]("max_chunk") <= 16, s"budget exceeded: $r")
    }
    // empty text -> zero chunks, not one empty chunk
    assert(out.find(_.getAs[Long]("id") == 0L).get.getAs[Long]("n_chunks") == 0L)
  }

  test("a single word over the budget gets its own oversized chunk (no text dropped)") {
    val rows = Seq("aaaaaaaaaaaaaaaaaaaaaaaa the").toDF("s") // 24 chars + </w> = 25 > 16
      .select(inline(Bpe.chunkByTokenBudget(spark, col("s"), Bpe.demoMerges, 16)))
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("chunk_tokens") == 25)
    assert(rows(0).getAs[String]("chunk") == "aaaaaaaaaaaaaaaaaaaaaaaa")
    assert(rows(1).getAs[String]("chunk") == "the")
  }

  test("chunk text collapses whitespace runs to single spaces at word boundaries") {
    val rows = Seq("a \t b\n\nc").toDF("s")
      .select(inline(Bpe.chunkByTokenBudget(spark, col("s"), Seq.empty, 100)))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("chunk") == "a b c")
    assert(rows(0).getAs[Int]("chunk_tokens") == 6)
  }

  test("packSequences takes BPE counts as its tokens column unchanged") {
    val docs = Seq((1L, "the"), (2L, "ordering the"), (3L, "and and and"))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(docs, key = col("doc_id"),
      tokens = Bpe.tokenCount(spark, col("text"), Bpe.demoMerges).cast("long"),
      budget = 4L)
    // total tokens 1 + 5 + 3 = 9 over budget-4 sequences -> offsets stay
    // inside [0, 4) and every doc appears exactly once
    val rows = packed.select("doc_id", "seq_id", "seq_offset").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    rows.foreach(r => assert(r.getAs[Long]("seq_offset") >= 0
      && r.getAs[Long]("seq_offset") < 4))
  }

  test("analysis-time validation rejects malformed merge tables") {
    val df = Seq("x").toDF("s")
    def bad(merges: org.apache.spark.sql.Column): Unit = {
      val e = intercept[Exception] {
        df.select(BpeExprs.bpeTokenCount(spark, col("s"), merges)).collect()
      }
      assert(e.isInstanceOf[AnalysisException]
        || e.getMessage.contains("bpe_token_count"), s"got: $e")
    }
    bad(typedLit(Seq(Seq("a"))))                       // 1-symbol pair
    bad(typedLit(Seq(Seq("a", "b", "c"))))             // 3-symbol pair
    bad(typedLit(Seq(Seq("a", ""))))                   // empty symbol
    bad(typedLit(Seq(Seq("a", "b"), Seq("a", "b"))))   // duplicate rank
    bad(col("s"))                                      // non-foldable
  }

  test("fertility: empty-table audit matches hand counts per group") {
    val df = Seq(
      ("en", "the cat"), // 6 cp + 2 words = 8 sym, 2 words, 6 chars
      ("en", "a"),       // 1 + 1 = 2 sym
      ("de", "übung"))   // 5 + 1 = 6 sym
      .toDF("lang", "text")
    val got = Bpe.fertility(spark, df, "lang", Seq.empty)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 2L, 10L, 3L,
      math.rint(10.0 / 3.0 * 1e9) / 1e9, math.rint(10.0 / 7.0 * 1e9) / 1e9)))
    assert(got("de") == (("de", 1L, 6L, 1L, 6.0, 1.2)))
  }

  test("fertility: a group with no words reports null ratios, not Infinity") {
    val df = Seq(("empty", "   "), ("empty", ""), ("en", "a b"))
      .toDF("lang", "text")
    val got = Bpe.fertility(spark, df, "lang", Seq.empty)
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("empty")._5.isEmpty && got("empty")._6.isEmpty)
    assert(got("en")._5.contains(2.0)) // 2 cp + 2 words over 2 words
  }

  test("fertility under real merges is bounded by the symbol floor") {
    val df = Seq(("en", "the theater theme and standing under"),
      ("en", "ingrained ordering"), ("de", "sort merge join"))
      .toDF("lang", "text")
    val floor = Bpe.fertility(spark, df, "lang", Seq.empty)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    val real = Bpe.fertility(spark, df, "lang", Bpe.demoMerges)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(real.keySet == floor.keySet)
    // merges only ever reduce the token count, and at least one demo
    // merge fires in every group here
    real.foreach { case (g, f) => assert(f < floor(g), s"group $g") }
    real.values.foreach(f => assert(f >= 1.0)) // ≥ one token per word
  }

  test("learnMerges reproduces the hand-computed Sennrich learn sequence") {
    // the classic learn corpus: low x5, lower x2, newest x6, widest x3.
    // Hand-run of the reference algorithm with the (count desc, left
    // asc, right asc) tie rule — round 1 is a 3-way tie at 9 between
    // (e,s), (s,t), (t,</w>); the lexicographic rule picks (e,s), and
    // every later round follows deterministically. Any drift in pair
    // counting, tie-breaking, or the re-encode between rounds diverges
    // from this sequence.
    val corpus = Seq(
      (0L, Seq.fill(5)("low").mkString(" ")),
      (1L, Seq.fill(2)("lower").mkString(" ")),
      (2L, Seq.fill(6)("newest").mkString(" ")),
      (3L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val learned = Bpe.learnMerges(corpus, k = 8)
    assert(learned == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>")))
    // the learned table drives the pinned encoder directly
    assert(toksOf("newest", learned) == Seq("newest</w>")) // merge 8 closes it
    assert(toksOf("lowest", learned) == Seq("low", "est</w>"))
  }

  test("learnMerges stops at minFrequency instead of memorizing singletons") {
    val corpus = Seq((0L, "ab ab ab xy")).toDF("doc_id", "text")
    // (a,b) occurs 3x; every pair of the singleton word occurs once —
    // with the default minFrequency=2 only merges with support survive
    val learned = Bpe.learnMerges(corpus, k = 10)
    assert(learned == Seq(("a", "b"), ("ab", "</w>")))
    // k caps the table even when support remains
    assert(Bpe.learnMerges(corpus, k = 1) == Seq(("a", "b")))
    assert(Bpe.learnMerges(corpus, k = 0) == Seq.empty)
  }

  test("learnMergesLocal equals the distributed loop: planted corpus and real fixtures") {
    val corpus = Seq(
      (0L, Seq.fill(5)("low").mkString(" ")),
      (1L, Seq.fill(2)("lower").mkString(" ")),
      (2L, Seq.fill(6)("newest").mkString(" ")),
      (3L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    assert(Bpe.learnMergesLocal(corpus, k = 8)
      == Bpe.learnMerges(corpus, k = 8))
    // early stop + k cap behave identically
    val tiny = Seq((0L, "ab ab ab xy")).toDF("doc_id", "text")
    assert(Bpe.learnMergesLocal(tiny, k = 10) == Seq(("a", "b"), ("ab", "</w>")))
    assert(Bpe.learnMergesLocal(tiny, k = 1) == Seq(("a", "b")))
    // real fixture text, k past anything hand-checkable: the delta-update
    // loop and the re-encode loop must walk the same sequence
    val docs = graft.tables.Tables.load(spark, graft.TestSessions.sf0001,
      "documents").select("doc_id", "text")
    assert(Bpe.learnMergesLocal(docs, k = 24) == Bpe.learnMerges(docs, k = 24))
  }

  test("merge tables round-trip through the parquet artifact in rank order") {
    val corpus = Seq((0L, "ab ab ab xy")).toDF("doc_id", "text")
    val learned = Bpe.learnMergesLocal(corpus, k = 10)
    val dir = java.nio.file.Files.createTempDirectory("xbpe").toString
    try {
      Bpe.saveMerges(spark, learned, s"$dir/merges")
      val back = Bpe.loadMerges(spark, s"$dir/merges")
      assert(back == learned)
      // the reloaded table drives the encoder identically
      assert(toksOf("abab", back) == toksOf("abab", learned))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("x141/x142 plants: learned-table encode and real-merge chunks match hand values") {
    // the x138 corpus's 8 learned merges give hand-computable per-word
    // counts (low=2, lower=4, newest=1, widest=4, abcdefgh=9 — no
    // learned pair fires on unknown letters); the x141/x142 driver rows
    // restate these, this spec guards them inside `sbt test`
    val corpus = Seq(
      (0L, Seq.fill(5)("low").mkString(" ")),
      (1L, Seq.fill(2)("lower").mkString(" ")),
      (2L, Seq.fill(6)("newest").mkString(" ")),
      (3L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val learned = Bpe.learnMergesLocal(corpus, k = 8)
    assert(countOf("low", learned) == 2)
    assert(countOf("lower", learned) == 4)
    assert(countOf("newest", learned) == 1)
    assert(countOf("widest", learned) == 4)
    assert(countOf("abcdefgh", learned) == 9)
    val rows = Seq("newest low lower widest newest newest low").toDF("s")
      .select(inline(Bpe.chunkByTokenBudget(spark, col("s"), learned, 5)))
      .collect()
    assert(rows.map(r => (r.getAs[String]("chunk"), r.getAs[Int]("chunk_tokens")))
      .toSeq == Seq(("newest low", 3), ("lower", 4), ("widest newest", 5),
        ("newest low", 3)))
  }

  test("property: the two learn loops agree on randomized small corpora") {
    // the delta-update loop maintains segmentation SEQUENTIALLY while
    // the distributed loop re-encodes greedily by rank — equal on any
    // corpus where no symbol string re-derives across rank order. Tiny
    // alphabets + repeated words maximize pair collisions and tie
    // traffic, the regime where a divergence would surface.
    for (seed <- Seq(7, 19, 83)) {
      val rnd = new scala.util.Random(seed)
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(5))("abc" (rnd.nextInt(3))).mkString)
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w))
      val corpus = Seq((0L, text.mkString(" "))).toDF("doc_id", "text")
      val dist = Bpe.learnMerges(corpus, k = 12)
      val local = Bpe.learnMergesLocal(corpus, k = 12)
      assert(local == dist, s"seed $seed: $local vs $dist")
    }
  }

  test("learnMergesLocal maxVocab cap keeps only the top words' evidence") {
    // top-1 word by count is "ab" (3x) — with maxVocab=1 the learner
    // never sees "xy", so only ab-derived merges emerge
    val tiny = Seq((0L, "ab ab ab xy xy")).toDF("doc_id", "text")
    assert(Bpe.learnMergesLocal(tiny, k = 10, maxVocab = 1)
      == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("a learned table lowers corpus fertility vs the empty-table floor") {
    val docs = graft.tables.Tables.load(spark, graft.TestSessions.sf0001,
      "documents").select(lit("all").as("g"), col("text"))
    val learned = Bpe.learnMerges(docs, k = 24)
    assert(learned.size == 24) // a real corpus has >= 24 supported merges
    val floor = Bpe.fertility(spark, docs, "g", Seq.empty)
      .select("fertility").as[Double].head()
    val real = Bpe.fertility(spark, docs, "g", learned)
      .select("fertility").as[Double].head()
    assert(real < floor, s"learned table did not compress: $real vs $floor")
  }
}
