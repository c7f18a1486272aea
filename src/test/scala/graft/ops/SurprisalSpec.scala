package graft.ops

import org.scalatest.funsuite.AnyFunSuite
// (cross-corpus tests live at the bottom of this suite)

import graft.TestSessions

class SurprisalSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "")).toDF("doc_id", "text")

  private def r7(d: Double) =
    BigDecimal(d).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(d: Double) =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  // mirror the engine's r10 portable final rounding: floor(x·10⁶+0.5)/10⁶
  private def r6(d: Double) = math.floor(d * 1e6 + 0.5) / 1e6
  // mirror the engine: cast double -> DECIMAL(28,9) via the shortest
  // decimal representation (Spark's Decimal(double) semantics)
  private def dec9(d: Double) =
    BigDecimal(java.math.BigDecimal.valueOf(d))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("avg_nll matches the hand-derived unigram LM; empty docs drop") {
    // corpus: a:2 b:2 c:1, total 5; logs pin @7 (the r07 transcendental
    // contract), terms accumulate as DECIMAL(28,9)
    val la = r7(math.log(5.0 / 2)) // ln(5/2) for a and b
    val lc = r7(math.log(5.0))     // ln(5)   for c
    val d1 = r6((dec9(2 * la) + dec9(1 * la)).toDouble / 3)
    val d2 = r6((dec9(1 * la) + dec9(1 * lc)).toDouble / 2)
    val got = TextAnalysis.unigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 3L, d1), (2L, 2L, d2)))
  }

  test("a uniform doc over the corpus's most common tokens scores lowest") {
    val d = Seq(
      (1L, "a a a a b"), // mostly the dominant token
      (2L, "z q"),       // rare tokens -> high surprisal
      (3L, "a a a a a a a a")).toDF("doc_id", "text")
    val nll = TextAnalysis.unigramSurprisal(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(3L) < nll(1L) && nll(1L) < nll(2L))
  }

  test("bigram surprisal matches a hand-derived interpolated LM") {
    // corpus: doc1 "a b a b", doc2 "b a", doc3 "solo"
    // c1: a=3 b=3 solo=1, T=7 (doc3 contributes no bigrams but its
    // token COUNTS in the unigram interpolation mass)
    // bigram types: (a,b) n2=2, (b,a) n2=2
    // every p = 0.75*2/3 + 0.25*3/7
    val term = r7(math.log(1.0 / (0.75 * 2 / 3 + 0.25 * 3 / 7)))
    val bdocs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(bdocs)
      .as[(Long, Long, Double)].collect().toSeq
    val d1 = r6((dec9(2 * term) + dec9(term)).toDouble / 3)
    assert(got == Seq((1L, 3L, d1), (2L, 1L, r6(term))))
    // single-token doc 3 has no bigrams and drops, like empty docs in x28
  }

  test("bigram LM penalizes scrambled order that unigrams cannot see") {
    val base = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
    val scrambled = Seq((100L, "fox the jumps quick brown"))
    val d = (base ++ scrambled).toDF("doc_id", "text")
    val uni = TextAnalysis.unigramSurprisal(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = TextAnalysis.bigramSurprisal(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(100L) == uni(1L)) // same tokens: unigram LM is blind
    assert(bi(100L) > bi(1L))    // bigram LM sees the broken order
  }

  test("bigramSurprisalTokens over an independent tokenizer equals the string form") {
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "x y x z"), (2L, "z z y")).toDF("doc_id", "text")
    val toks = d.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("w"))
    val a = TextAnalysis.bigramSurprisal(d)
      .as[(Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.bigramSurprisalTokens(toks)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("bigram lambda outside (0,1) is rejected") {
    intercept[IllegalArgumentException](
      TextAnalysis.bigramSurprisal(docs, lambda = 0.0))
    intercept[IllegalArgumentException](
      TextAnalysis.bigramSurprisal(docs, lambda = 1.0))
  }

  test("crossSurprisal: hand-computed add-1 NLL over the union vocabulary") {
    // target: "a a b" -> counts a=2 b=1, T=3; raw vocab adds c -> V=3
    // p(a)=(2+1)/6, p(b)=(1+1)/6, p(c)=(0+1)/6
    val raw = Seq((1L, "a c"), (2L, "b b")).toDF("doc_id", "text")
    val target = Seq((9L, "a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.crossSurprisal(raw, target)
      .as[(Long, Long, Double)].collect().toSeq
    def pin7(x: Double) = math.rint(math.log(x) * 1e7) / 1e7
    def nll(ps: Seq[Double]) = {
      val sum = ps.map(p => math.rint(pin7(1.0 / p) * 1e9) / 1e9).sum
      math.rint(sum / ps.size * 1e6) / 1e6
    }
    assert(got == Seq(
      (1L, 2L, nll(Seq(3.0 / 6, 1.0 / 6))),
      (2L, 2L, nll(Seq(2.0 / 6, 2.0 / 6)))))
  }

  test("crossSurprisal: target-like docs score lower than disjoint docs") {
    val raw = Seq((1L, "spark shuffle join"), (2L, "zebra yak wombat"))
      .toDF("doc_id", "text")
    val target = Seq((9L, "spark shuffle join spark shuffle"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.crossSurprisal(raw, target)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) < got(2L))
  }

  test("crossSurprisal: zero-token raw docs are absent") {
    val raw = Seq((1L, "a"), (2L, "   ")).toDF("doc_id", "text")
    val target = Seq((9L, "a")).toDF("doc_id", "text")
    val ids = TextAnalysis.crossSurprisal(raw, target)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
