package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("target == raw makes every weight exactly zero") {
    // ct == cr bucket-for-bucket and T == R, so each bucket's ratio is
    // ln(1) = 0 and the decimal accumulation preserves the exact zero
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta delta"),
      (3L, "gamma alpha alpha")).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(docs, docs, buckets = 64)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    got.foreach { case (_, _, w) => assert(w == 0.0) }
  }

  test("n_grams counts unigrams plus bigrams; empty docs are absent") {
    val raw = Seq((1L, "a b c"), (2L, "solo"), (3L, "   "))
      .toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val got = Dsir.importanceWeights(raw, target, buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 5L, 2L -> 1L)) // 3 uni + 2 bi; 1 uni; absent
  }

  test("target-like documents outscore target-unlike ones") {
    val raw = Seq(
      (1L, "spark shuffle join window"), // pure target vocabulary
      (2L, "zebra yak xylophone wombat"), // disjoint from target
      (3L, "spark shuffle yak wombat")) // mixed
      .toDF("doc_id", "text")
    val target = Seq((10L, "spark shuffle join window spark shuffle"),
      (11L, "join window spark")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, buckets = 1024)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L), s"weights: $w")
    assert(w(1L) > 0.0 && w(2L) < 0.0)
  }

  test("select returns the top-k by weight with doc_id tiebreak") {
    val raw = (1L to 20L).map(i =>
      (i, if (i <= 5) "spark shuffle join" else "zebra yak wombat"))
      .toDF("doc_id", "text")
    val target = Seq((0L, "spark shuffle join spark")).toDF("doc_id", "text")
    val picked = Dsir.select(raw, target, k = 5, buckets = 256)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == (1L to 5L).toSet)
  }

  test("pre-computed-features overload matches the end-to-end path") {
    val raw = Seq((1L, "spark shuffle join"), (2L, "zebra yak"),
      (3L, "spark zebra")).toDF("doc_id", "text")
    val target = Seq((9L, "spark shuffle")).toDF("doc_id", "text")
    val direct = Dsir.importanceWeights(raw, target, buckets = 128)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val viaFeatures = Dsir.importanceWeightsFeatures(
        Dsir.docFeatures(raw, 128), Dsir.docFeatures(target, 128), 128)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(direct == viaFeatures)
  }

  test("bucketing is portable md5: stable across runs and bucket-bounded") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val a = Dsir.docFeatures(docs, 16).as[(Long, Long, Long)].collect()
      .sortBy(_._2).toSeq
    val b = Dsir.docFeatures(docs, 16).as[(Long, Long, Long)].collect()
      .sortBy(_._2).toSeq
    assert(a == b)
    assert(a.forall { case (_, bucket, _) => bucket >= 0 && bucket < 16 })
    assert(a.map(_._3).sum == 7L) // 4 unigrams + 3 bigrams
  }
}
