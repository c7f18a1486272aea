package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text, text.length.toLong)

  // every stage has a designated victim:
  //  - 2 duplicates 1 (exact dedup keeps min id 1)
  //  - 3 shares the eval trigram "alpha beta gamma" (decontaminated)
  //  - 4 is too short, 5 too long (length filter)
  //  - 1 and 6 survive to the split stage
  private val docs = Seq(
    doc(1L, "one two three four five six seven eight nine ten"),
    doc(2L, "one two three four five six seven eight nine ten"),
    doc(3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    doc(4L, "tiny"),
    doc(5L, "x " * 300 + "end"),
    doc(6L, "completely unrelated wording that overlaps nothing at all here"))
    .toDF("doc_id", "text", "n_chars")

  private val eval = Seq(doc(100L, "alpha beta gamma"))
    .toDF("doc_id", "text", "n_chars")

  private def run(min: Long = 10, max: Long = 100) =
    Curation.curate(docs, eval, min, max,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 13)

  test("each stage removes exactly its victim; survivors carry splits") {
    val got = run().select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(got.keySet == Set(1L, 6L))
    // split equals deterministicSplit's own assignment for the same key
    val expected = Sampling.deterministicSplit(
        docs.filter(col("doc_id").isin(1L, 6L)), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 13)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got == expected)
  }

  test("dedup keeps the smallest id of an identical-text pair") {
    assert(!run().select("doc_id").as[Long].collect().contains(2L))
  }

  test("minHits above the overlap count spares the contaminated doc") {
    // doc 3 shares many trigrams with the eval text; a huge minHits
    // threshold lets it through (then only the length window applies)
    val got = Curation.curate(docs, eval, 10, 100,
        Seq("a" -> 0.5, "b" -> 0.5), minHits = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 6L))
  }

  test("an empty length window is rejected") {
    intercept[IllegalArgumentException](run(min = 100, max = 10))
  }

  test("datasheet: single-pass per-group stats match SQL aggregate semantics") {
    // 6 groups (> the session's 4 shuffle slices, so the adaptive
    // percentile keeps the default one-scan mode); one null size
    val rows = (0 until 60).map { i =>
      (s"g${i % 6}",
        if (i == 0) null else java.lang.Long.valueOf(i * 7 % 100))
    }
    val df = rows.toDF("source", "n_chars")
    val got = Curation.datasheet(df, "source")
      .as[(String, Long, Option[Long], Option[Double], Option[Double])]
      .collect().toSeq
    // independent recomputation with SQL semantics (nulls excluded from
    // sum/avg/median, counted in n_docs; percentile_cont interpolation)
    def pctCont(vs: Seq[Long]): Double = {
      val s = vs.sorted.map(_.toDouble)
      val r = 0.5 * (s.size - 1)
      val (lo, hi) = (s(r.toInt), s(math.ceil(r).toInt))
      val frac = r - math.floor(r)
      lo * (1.0 - frac) + hi * frac
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val vs = rs.flatMap(r => Option(r._2).map(_.longValue()))
      def r9(d: Double) =
        BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, rs.size.toLong, Some(vs.sum), Some(r9(vs.sum.toDouble / vs.size)),
        Some(r9(pctCont(vs))))
    }
    assert(got == expected)
  }

  test("columnProfile: exact per-column stats incl. nulls and distincts") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (2L, "a"), (2L, null), (null, "a"))
      .toDF("id", "s")
    val got = Curation.columnProfile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("id", 4L, 3L, 2L, Some("1"), Some("2")),
      ("s", 4L, 3L, 2L, Some("a"), Some("b"))))
  }

  test("columnProfile rejects an empty column list") {
    intercept[IllegalArgumentException](
      Curation.columnProfile(Seq((1L, "x")).toDF("id", "s"), Nil))
  }

  test("exactNormalized merges casing/punctuation/whitespace variants") {
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "unrelated text")).toDF("doc_id", "text")
    val got = Dedup.exactNormalized(docs)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(1L -> 2L, 3L -> 1L))
  }

  test("exactNormalized preserves non-Latin scripts; contentless docs never merge") {
    val docs = Seq(
      (1L, "你好世界"), (2L, "完全不同的文本"), // distinct CJK docs
      (3L, "Привет!"), (4L, "привет"),          // Cyrillic punct variant
      (5L, "!!!"), (6L, "???"),                 // pure punctuation
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.exactNormalized(docs)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // the old [^a-z0-9\s] complement normalized EVERY row here to "":
    // one survivor, six docs silently deleted. Now: CJK docs stay
    // distinct, the Cyrillic variants merge, punctuation-only and null
    // docs each stay their own group.
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
  }

  test("datasheet: the corpus is scanned exactly once") {
    val df = (0 until 60).map(i => (s"g${i % 6}", i.toLong * 3 % 97))
      .toDF("source", "n_chars")
    val out = Curation.datasheet(df, "source")
    out.collect()
    // AQE's toString prints the final AND the initial plan — count the
    // final one only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one corpus scan, got $scans:\n$plan")
  }
}
