package graft.ops

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

/** Property tests for the duplicated-span locate→cut family: invariants
  * that must hold for ANY corpus. Small-vocabulary random docs force
  * heavy cross-doc duplication, exercising merges, multi-island docs,
  * and full-coverage cuts. Same raw-scalacheck sampling convention as
  * PipelinePropertySpec. */
class SpanPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  // 8-word vocabulary, 12 docs of 3-20 tokens: shared 3-gram runs are
  // near-certain, and some docs fall below the gram width
  private val corpusGen: Gen[List[String]] = Gen.listOfN(12,
    Gen.chooseNum(3, 20).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx",
        "gx", "hx")).map(_.mkString(" "))))

  test("property: spans are in-range, disjoint, wide enough, and gram-consistent") {
    val n = 3
    samples(corpusGen, 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tokCount = texts.zipWithIndex
        .map { case (t, i) => i.toLong -> t.split(" ").length }.toMap
      val spans = TextAnalysis.duplicatedSpans(docs, n)
        .as[(Long, Int, Int, Long)].collect().toSeq
      spans.foreach { case (id, s, e, g) =>
        assert(s >= 1 && e <= tokCount(id), s"span [$s,$e] out of range")
        assert(e - s + 1 >= n, "span narrower than one gram window")
        assert(g >= 1 && g <= e - s + 1 - (n - 1), "gram count impossible")
      }
      // islands split only when gram windows stop overlapping, so spans
      // of one doc are STRICTLY disjoint (next start > prev end)
      spans.groupBy(_._1).values.foreach { ds =>
        ds.sortBy(_._2).sliding(2).foreach {
          case Seq(a, b) => assert(b._2 > a._3, s"overlap: $a then $b")
          case _ => ()
        }
      }
    }
  }

  test("property: cutSpans removes exactly the span tokens, keeps order") {
    val n = 3
    samples(corpusGen, 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val spans = TextAnalysis.duplicatedSpans(docs, n)
      val byDoc = spans.as[(Long, Int, Int, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSeq).toMap
      val cut = TextAnalysis.cutSpans(docs, spans)
        .as[(Long, String, Long)].collect().toSeq
      assert(cut.map(_._1).toSet == texts.indices.map(_.toLong).toSet,
        "every doc must survive the cut")
      cut.foreach { case (id, clean, nCut) =>
        val toks = texts(id.toInt).split(" ").toSeq
        val covered = byDoc.getOrElse(id, Nil)
          .flatMap { case (s, e) => s to e }.toSet
        val kept = toks.zipWithIndex.collect {
          case (t, i) if !covered.contains(i + 1) => t
        }
        assert(clean == kept.mkString(" "), s"doc $id kept-token mismatch")
        assert(nCut == covered.size, s"doc $id n_cut != covered size")
      }
    }
  }
}
