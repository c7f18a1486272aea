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

  // random words over a small alphabet so edits collide organically
  private val wordGen: Gen[String] =
    Gen.chooseNum(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: editDistancePairs equals brute-force Levenshtein on long-enough docs") {
    // docs of 10-16 words from a 6-word vocabulary: > 3*maxEdits word
    // trigrams, inside the operator's completeness regime, with heavy
    // organic overlap so real pairs exist
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta")
    val docGen: Gen[String] = Gen.chooseNum(10, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    samples(Gen.listOfN(12, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val maxEdits = 2
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"), maxEdits)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        d = lev(ta, tb) if d <= maxEdits
      } yield (ia, ib, d)).toSet
      assert(got == want, s"blocking lost or invented pairs:\ngot  $got\nwant $want")
    }
  }

  test("property: editDistanceJoin equals brute-force Levenshtein on short keys") {
    samples(Gen.zip(Gen.listOfN(10, wordGen), Gen.listOfN(6, wordGen)), 3)
      .foreach { case (ls, rs) =>
        val left = ls.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val right = rs.zipWithIndex.map { case (t, i) => (100L + i, t) }
        val maxEdits = 1
        val got = Dedup.editDistanceJoin(left.toDF("id", "name"),
            right.toDF("id", "name"), "id", "name", maxEdits)
          .as[(Long, Long, Int)].collect().toSet
        // brute truth, restricted to the documented regime: keys with
        // more than 3*maxEdits distinct char trigrams are guaranteed;
        // SHORTER keys may legitimately miss, so exclude them from the
        // equality (but anything reported must still be correct)
        def grams(s: String) = (1 to math.max(s.length - 2, 1))
          .map(i => s.slice(i - 1, i + 2)).toSet
        val want = (for {
          (ia, ta) <- left; (ib, tb) <- right
          d = lev(ta, tb) if d <= maxEdits
          if grams(ta).size > 3 * maxEdits && grams(tb).size > 3 * maxEdits
        } yield (ia, ib, d)).toSet
        assert(want.subsetOf(got), s"blocking LOST in-regime pairs:\ngot  $got\nwant $want")
        got.foreach { case (ia, ib, d) =>
          val t = (left.toMap.apply(ia), right.toMap.apply(ib))
          assert(lev(t._1, t._2) == d && d <= maxEdits,
            s"reported pair ($ia,$ib,$d) is wrong: $t")
        }
      }
  }
}
