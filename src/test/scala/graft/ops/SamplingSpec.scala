package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("groupSplit never lets a group straddle splits") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val df = (1 to 200).map(i => (i.toLong, "g" + (i % 13))).toDF("id", "grp")
    val out = Sampling.groupSplit(df, col("grp"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
    val pairs = out.select("grp", "split").distinct().count()
    assert(pairs == 13L) // one split per group, by construction
    // contrast (ADVICE r06): a split keyed on the ROW id CAN straddle a
    // group — that's the leakage groupSplit exists to prevent
    val viaRow = Sampling.deterministicSplit(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
    val straddled = viaRow.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddled > 0, "row-keyed split unexpectedly kept all groups whole")
  }

  test("hexThreshold maps fractions to the 32-bit hex space") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.8) == "cccccccd")
    // near-1 fractions clamp to 8 chars: "100000000" would invert the
    // lexicographic compare and keep only '0'-prefixed buckets
    assert(Sampling.hexThreshold(0.9999999999) == "ffffffff")
    intercept[IllegalArgumentException](Sampling.hexThreshold(1.0))
  }

  test("bucketHex matches a driver-side md5 (portability contract)") {
    val got = ids(3).select(col("id"), Sampling.bucketHex(col("id"), 42).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    (0L until 3L).foreach { i =>
      // non-null keys carry the out-of-band 'k' prefix (ADVICE r04)
      val hex = md.digest(s"k$i:42".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(i) == hex.take(8), s"id $i")
    }
  }

  test("deterministicSplit: total assignment, expected proportions, stability") {
    val n = 20000
    val out = Sampling.deterministicSplit(ids(n), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    assert(math.abs(counts("train") - 0.8 * n) < 0.02 * n, counts.toString)
    assert(math.abs(counts("val") - 0.1 * n) < 0.02 * n, counts.toString)
    // stability: assignment is a pure function of the key — immune to
    // repartitioning (the property sample() does NOT have)
    val a = out.orderBy("id").collect().map(_.getString(1))
    val b = Sampling.deterministicSplit(ids(n).repartition(13), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("id").collect().map(_.getString(1))
    assert(a.sameElements(b))
  }

  test("null keys hash out-of-band, not through null comparisons") {
    // r04 review: a null bucket made every condition null — all null-key
    // rows fell to the LAST split and were dropped from rate<1 strata
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val out = Sampling.deterministicSplit(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("id").isNull).select("split").collect()
    assert(out.length == 1 && out.head.getString(0) != null)
    // the assignment equals hashing the out-of-band null encoding
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val expected = if (md5hex("n:42") < Sampling.hexThreshold(0.8)) "train"
      else if (md5hex("n:42") < Sampling.hexThreshold(0.9)) "val" else "test"
    assert(out.head.getString(0) == expected)
    // no real key VALUE can share the null bucket: non-null keys are
    // 'k'-prefixed (ADVICE r04: the in-band "__graft_null__" sentinel
    // collided with a key equal to that string)
    val tricky = Seq(Some("n"), Some("__graft_null__"), None).toDF("id")
    val hexes = tricky.select(Sampling.bucketHex(col("id"), 42)).collect()
      .map(_.getString(0))
    assert(hexes(0) == md5hex("kn:42"))
    assert(hexes(1) == md5hex("k__graft_null__:42"))
    assert(hexes(2) == md5hex("n:42"))
    assert(hexes.distinct.length == 3)
    // interior cumulative weights that round to 1.0 no longer crash
    Sampling.deterministicSplit(ids(10), col("id"),
      Seq("a" -> 0.5, "b" -> (0.5 - 1e-12), "c" -> 1e-12)).collect()
  }

  test("shard: total cover, near-uniform sizes, stability, no shuffle") {
    val n = 16
    val out = Sampling.shard(ids(16000), col("id"), n, seed = 3)
    val counts = out.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until n).toSet) // every shard populated
    assert(counts.values.sum == 16000)
    assert(counts.values.forall(c => math.abs(c - 1000) < 150), counts.toString)
    // stable under repartitioning (pure function of the key)
    val a = out.orderBy("id").collect().map(_.getInt(1))
    val b = Sampling.shard(ids(16000).repartition(7), col("id"), n, seed = 3)
      .orderBy("id").collect().map(_.getInt(1))
    assert(a.sameElements(b))
    val plan = Sampling.shard(ids(100), col("id"), n).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shuffleKey: deterministic permutation, different per seed") {
    val k1 = ids(500).select(Sampling.shuffleKey(col("id"), 1).as("k")).collect().map(_.getString(0))
    val k1b = ids(500).select(Sampling.shuffleKey(col("id"), 1).as("k")).collect().map(_.getString(0))
    val k2 = ids(500).select(Sampling.shuffleKey(col("id"), 2).as("k")).collect().map(_.getString(0))
    assert(k1.sameElements(k1b))
    assert(!k1.sameElements(k2))
  }

  test("deterministicSplit rejects bad weights") {
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(ids(10), col("id"), Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.deterministicSplit(ids(10), col("id"), Seq("all" -> 1.0)))
  }

  test("temperatureMixture: rates match the share formula, alpha flattens") {
    // three domains with strongly skewed weight totals
    val df = ((0L until 900L).map(i => (i, "big", 10L)) ++
      (900L until 1000L).map(i => (i, "mid", 10L)) ++
      (1000L until 1010L).map(i => (i, "small", 10L)))
      .toDF("id", "src", "w")
    def rates(alpha: Double): Map[String, Double] =
      Sampling.temperatureMixture(df, col("src"), col("w"),
          alpha = alpha, budget = 2000.0, key = col("id"), seed = 3)
        .select("src", "keep_rate").distinct().as[(String, Double)]
        .collect().toMap
    val totals = Map("big" -> 9000.0, "mid" -> 1000.0, "small" -> 100.0)
    def expected(alpha: Double): Map[String, Double] = {
      val z = totals.values.map(math.pow(_, alpha)).sum
      totals.map { case (d, t) =>
        d -> BigDecimal(math.min(1.0, math.pow(t, alpha) / z * 2000.0 / t))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble }
    }
    val r1 = rates(1.0)
    assert(r1 == expected(1.0))
    // alpha = 1 is proportional: every domain keeps the same rate
    assert(r1.values.toSet.size == 1)
    val r05 = rates(0.5)
    assert(r05 == expected(0.5))
    // alpha < 1 up-weights small domains relative to big ones
    assert(r05("small") > r05("big"))
  }

  test("temperatureMixture: rate clamps at 1.0 and keeps every row; null domains drop") {
    val df = ((0L until 500L).map(i => (i, "big": String, 10L)) ++
      (500L until 505L).map(i => (i, "tiny": String, 1L)) ++
      Seq((990L, null: String, 5L)))
      .toDF("id", "src", "w")
    val kept = Sampling.temperatureMixture(df, col("src"), col("w"),
      alpha = 0.3, budget = 2500.0, key = col("id"), seed = 3)
    val bySrc = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("tiny") == 5) // clamped to 1.0 -> all rows kept
    assert(kept.filter(col("src") === "tiny")
      .select("keep_rate").distinct().as[Double].collect().toSeq == Seq(1.0))
    assert(!bySrc.contains(null)) // mixture contract: null domains drop
  }

  test("decaySample: halflife semantics, clamp at ref, null-ts drop") {
    val ref = java.sql.Timestamp.valueOf("2024-06-10 00:00:00")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, t("2024-06-10 00:00:00")), // age 0 -> rate 1 (clamp branch)
      (2L, t("2024-06-09 00:00:00")), // one halflife -> 0.5
      (3L, t("2024-06-08 00:00:00")), // two -> 0.25
      (4L, t("2024-06-11 00:00:00")), // FUTURE of ref -> clamp to 1
      (5L, null.asInstanceOf[java.sql.Timestamp])) // unknown age -> drop
      .toDF("id", "ts")
    val got = Sampling.decaySample(df, col("ts"), lit(ref),
        halflifeSeconds = 86400.0, key = col("id"), seed = 3)
      .select("id", "keep_rate").as[(Long, Double)].collect().toMap
    assert(got.get(1L).contains(1.0) && got.get(4L).contains(1.0))
    assert(!got.contains(5L))
    // rows 2/3 carry the exact decayed rate whenever their bucket kept them
    got.get(2L).foreach(r => assert(r == 0.5))
    got.get(3L).foreach(r => assert(r == 0.25))
    // over a large population the kept fraction tracks the rate
    val big = (0L until 4000L).map((_, t("2024-06-09 00:00:00")))
      .toDF("id", "ts")
    val kept = Sampling.decaySample(big, col("ts"), lit(ref),
      86400.0, col("id"), seed = 3).count()
    assert(math.abs(kept - 2000L) < 200, s"kept $kept of 4000 at rate 0.5")
  }

  test("temperatureMixture: a zero-weight domain drops via null rate, not NaN->1.0") {
    // ADVICE r10: pow(0, a)=0 makes a zero-weight domain's rate 0/0 =
    // NaN; Spark's NaN-is-largest ordering turned least(1.0, NaN) into a
    // silent keep-everything at rate 1.0. The nullif guard (mirroring
    // mixturePlan) surfaces the degenerate domain as a null rate, which
    // the isNotNull filter drops — the documented honest-null posture.
    val df = ((0L until 100L).map(i => (i, "real", 10L)) ++
      (100L until 110L).map(i => (i, "empty", 0L)))
      .toDF("id", "src", "w")
    val kept = Sampling.temperatureMixture(df, col("src"), col("w"),
      alpha = 0.5, budget = 2000.0, key = col("id"), seed = 3)
    val bySrc = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("empty"), s"zero-weight domain kept rows: $bySrc")
    assert(bySrc("real") == 100) // rate 2000/1000 = 2 -> clamp 1.0, all kept
    // all-zero corpus: every domain degenerate -> empty result, no NaN
    val allZero = (0L until 10L).map(i => (i, "z", 0L)).toDF("id", "src", "w")
    assert(Sampling.temperatureMixture(allZero, col("src"), col("w"),
      alpha = 0.5, budget = 5.0, key = col("id"), seed = 3).count() == 0)
  }

  test("temperatureMixture rejects bad alpha and budget") {
    intercept[IllegalArgumentException](Sampling.temperatureMixture(
      ids(3), col("id"), lit(1), alpha = 0.0, budget = 1.0, key = col("id")))
    intercept[IllegalArgumentException](Sampling.temperatureMixture(
      ids(3), col("id"), lit(1), alpha = 1.5, budget = 1.0, key = col("id")))
    intercept[IllegalArgumentException](Sampling.temperatureMixture(
      ids(3), col("id"), lit(1), alpha = 0.5, budget = 0.0, key = col("id")))
  }

  test("stratifiedSample: per-stratum rates incl. rate>=1 and default 0") {
    val df = (0L until 9000L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3)))
      .toDF("id", "src")
    val kept = Sampling.stratifiedSample(df, col("src"),
      Map("a" -> 0.2, "b" -> 1.0), key = col("id"), seed = 1)
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("b") == 3000)                     // rate 1.0 keeps all
    assert(!counts.contains("c"))                   // defaultRate 0 drops stratum
    assert(math.abs(counts("a") - 600) < 120, counts.toString)
    // plan is a pure filter — no shuffle/exchange introduced
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
