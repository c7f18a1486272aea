package graft.ops

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

/** Property tests for the round-7 pipeline operators: invariants that
  * must hold for ANY input, sampled deterministically (raw scalacheck
  * Gens — the scalatest bridge isn't on the offline classpath). Spark
  * jobs are expensive, so the sample counts stay small and each sample
  * packs many rows. */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val valuesGen: Gen[List[Long]] =
    Gen.listOfN(60, Gen.chooseNum(-1000L, 1000L))

  test("property: histogram counts partition the input; values fall in their bin") {
    samples(Gen.zip(valuesGen, Gen.chooseNum(1, 40)), 5).foreach {
      case (vs, width) =>
        val df = vs.toDF("v")
        val hist = Selection.histogram(df, col("v"), width.toDouble)
          .as[(Long, Double, Double, Long)].collect()
        assert(hist.map(_._4).sum == vs.size)
        hist.foreach { case (bin, lo, hi, _) =>
          assert(lo == bin * width.toDouble && hi == (bin + 1) * width.toDouble)
        }
        // every value lands inside its reported bin edges
        vs.foreach { v =>
          val bin = math.floor(v.toDouble / width).toLong
          val row = hist.find(_._1 == bin)
          assert(row.isDefined && row.get._2 <= v && v < row.get._3)
        }
    }
  }

  test("property: sampleExactK returns min(k, stratum size) rows per stratum") {
    val gen = Gen.zip(
      Gen.listOfN(50, Gen.chooseNum(0, 3)), Gen.chooseNum(1, 12))
    samples(gen, 5).foreach { case (groups, k) =>
      val df = groups.zipWithIndex
        .map { case (g, i) => (i.toLong, s"g$g") }.toDF("id", "grp")
      val sizes = groups.groupBy(identity).map { case (g, l) => s"g$g" -> l.size }
      val got = Sampling.sampleExactK(df, col("grp"), col("id"), k)
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (g, n) =>
        assert(got(g) == math.min(k, n).toLong, s"stratum $g k=$k n=$n")
      }
    }
  }

  test("property: lengthBatches padding is non-negative and batches respect size") {
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.chooseNum(0L, 500L)), Gen.chooseNum(1, 10))
    samples(gen, 5).foreach { case (lens, bs) =>
      val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("id", "len")
      val got = Packing.lengthBatches(df, col("id"), col("len"), bs, nShards = 2)
        .as[(Int, Int, Int, Long, Long, Long)].collect()
      assert(got.map(_._3).sum == lens.size) // every row lands in a batch
      got.foreach { case (_, _, nDocs, maxT, sumT, pad) =>
        assert(nDocs <= bs && pad >= 0 && pad == nDocs * maxT - sumT)
      }
    }
  }

  test("property: dupRate dups+canonicals reconcile and rates stay in [0,1]") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 2)))
    samples(gen, 5).foreach { texts =>
      val df = texts.zipWithIndex
        .map { case ((t, s), i) => (i.toLong, s"text $t", s"s$s") }
        .toDF("doc_id", "text", "source")
      val got = Dedup.dupRate(df, "source")
        .as[(String, Long, Long, Double)].collect()
      assert(got.map(_._2).sum == texts.size)
      // total dups across groups = total rows minus distinct texts
      assert(got.map(_._3).sum == texts.size - texts.map(_._1).distinct.size)
      got.foreach { case (_, n, d, r) =>
        assert(d <= n && r >= 0.0 && r <= 1.0)
      }
    }
  }
}
