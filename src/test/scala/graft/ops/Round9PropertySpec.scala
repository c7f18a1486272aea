package graft.ops

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

/** Property tests for the round-9 pipeline operators — invariants that
  * must hold for ANY input, checked against in-memory brute force on
  * deterministically sampled corpora (the PipelinePropertySpec
  * conventions: raw scalacheck Gens, few samples, many rows each). */
class Round9PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // small vocabulary + short lines force heavy cross-doc line collisions
  private val docGen: Gen[List[String]] = Gen.listOfN(25,
    Gen.listOfN(6, Gen.listOfN(2, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
      .map(_.mkString("\n")))

  test("property: lineDedup matches in-memory keep-first brute force") {
    samples(docGen, 4).foreach { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val got = Dedup.lineDedup(rows.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // brute force: first (doc_id, pos) per distinct line survives
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = rows.map { case (id, t) =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(l => seen.add(l))
        id -> ((kept.mkString("\n"), lines.length.toLong, kept.length.toLong))
      }.toMap
      assert(got == expect)
    }
  }

  test("property: lineDedupAgainst == lineDedup on the union, for batch rows") {
    val gen = Gen.zip(docGen, docGen)
    samples(gen, 4).foreach { case (corpusTexts, batchTexts) =>
      val corpus = corpusTexts.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }
      val batch = batchTexts.zipWithIndex
        .map { case (t, i) => ((i + 1001).toLong, t) }
      val ingest = Dedup.lineDedupAgainst(batch.toDF("doc_id", "text"),
          corpus.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val scratch = Dedup.lineDedup((corpus ++ batch).toDF("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      batch.map(_._1).foreach(id => assert(ingest(id) == scratch(id)))
      // and the bloom-prefiltered variant is output-identical
      val bloom = Dedup.lineDedupAgainstBloom(batch.toDF("doc_id", "text"),
          corpus.toDF("doc_id", "text"), expectedCorpusLines = 4096)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(bloom == ingest)
    }
  }

  test("property: heavyHitters == brute-force strict-threshold group-by") {
    val corpusGen = Gen.zip(
      Gen.listOfN(30, Gen.listOfN(8,
        Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.oneOf("w1", "w2", "w3"),
          2 -> Gen.chooseNum(0, 50).map(i => s"rare$i"))).map(_.mkString(" "))),
      Gen.chooseNum(2, 20))
    samples(corpusGen, 4).foreach { case (texts, k) =>
      val rows = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val got = TextAnalysis.heavyHitters(rows.toDF("doc_id", "text"), k)
        .as[(String, Long)].collect().toSeq
      val counts = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, l) => t -> l.size.toLong }
      val n = counts.values.sum
      val expect = counts.toSeq.filter { case (_, c) => c * k > n }
        .sortBy { case (t, c) => (-c, t) }
      assert(got == expect, s"k=$k n=$n")
    }
  }

  test("property: retention cutoff keeps at least the target fraction") {
    val gen = Gen.zip(
      Gen.listOfN(80, Gen.zip(Gen.oneOf("g1", "g2", "g3"),
        Gen.chooseNum(0, 40))),
      Gen.chooseNum(1, 9).map(_ / 10.0))
    samples(gen, 4).foreach { case (rows, target) =>
      val df = rows.toDF("lang", "score")
      val rep = Selection.retentionThreshold(df, "lang", "score", target)
        .as[(String, Double, Long, Long, Double)].collect()
      rep.foreach { case (g, cutoff, total, kept, obs) =>
        // ties only ever push retention ABOVE the target (cutoff is the
        // exact 1-target percentile, inclusive comparison)
        assert(kept >= math.floor(target * total).toLong - 1,
          s"group $g kept $kept of $total at target $target")
        assert(obs == math.rint(kept.toDouble / total * 1e9) / 1e9)
        // and the cutoff really separates: brute-force check
        val vs = rows.filter(_._1 == g).map(_._2)
        assert(vs.count(_ >= cutoff) == kept)
      }
    }
  }

  test("property: shard manifest reconciles and ids stay in range for any corpus") {
    val gen = Gen.zip(
      Gen.listOfN(120, Gen.chooseNum(1L, 500L)), Gen.chooseNum(100L, 20000L))
    samples(gen, 4).foreach { case (sizes, target) =>
      val df = sizes.zipWithIndex
        .map { case (b, i) => ((i + 1).toLong, b) }.toDF("doc_id", "bytes")
      val man = Curation.shardManifest(
        Curation.shardAssign(df, col("doc_id"), col("bytes"), target),
        col("bytes"), target).as[(Long, Long, Long, Long, Double)].collect()
      val n = math.max(1L, math.ceil(sizes.sum.toDouble / target).toLong)
      assert(man.forall(_._2 == n))
      assert(man.forall(r => r._1 >= 0 && r._1 < n))
      assert(man.map(_._3).sum == sizes.size.toLong)
      assert(man.map(_._4).sum == sizes.sum)
    }
  }
}
