package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("overlapHits counts distinct shared trigrams; disjoint docs drop out") {
    val eval = docs(900L -> "the quick brown fox jumps over the lazy dog")
    val train = docs(
      // shares 'the quick brown', 'quick brown fox' (2 hits)
      1L -> "see the quick brown fox run",
      // exact copy: every eval trigram hits (7 distinct trigrams)
      2L -> "the quick brown fox jumps over the lazy dog",
      // disjoint vocabulary: no hits, absent from output
      3L -> "alpha beta gamma delta epsilon")
    val got = Decontamination.overlapHits(train, eval, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 7L))
  }

  test("minHits filters below-threshold documents") {
    val eval = docs(900L -> "a b c d e")
    val train = docs(1L -> "x y a b c", 2L -> "a b c d q")
    val got = Decontamination.overlapHits(train, eval, col("doc_id"), col("text"),
      minHits = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares only 'a b c' (1 hit) -> filtered; doc 2 shares 'a b c',
    // 'b c d' (2 hits) -> kept
    assert(got == Map(2L -> 2L))
  }

  test("short documents (<3 tokens) match via the whole-text shingle") {
    val eval = docs(900L -> "hi there")
    val train = docs(1L -> "hi there", 2L -> "hi")
    val got = Decontamination.overlapHits(train, eval, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("overlapHitsBloom equals overlapHits on every minHits/verify mode") {
    val eval = docs(
      900L -> "the quick brown fox jumps over the lazy dog",
      901L -> "pack my box with five dozen liquor jugs")
    val train = docs(
      1L -> "see the quick brown fox run past the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "alpha beta gamma delta epsilon",
      4L -> "pack my box with five dozen liquor jugs and more")
    for (minHits <- Seq(1, 2, 4); bcast <- Seq(true, false)) {
      val exact = Decontamination.overlapHits(train, eval,
        col("doc_id"), col("text"), minHits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bloom = Decontamination.overlapHitsBloom(train, eval,
        col("doc_id"), col("text"), minHits, broadcastVerify = bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bloom == exact, s"minHits=$minHits broadcastVerify=$bcast")
    }
  }

  test("overlapHitsBloom: empty eval set yields an empty, well-typed frame") {
    val eval = docs().filter(lit(false))
    val train = docs(1L -> "anything at all here")
    val out = Decontamination.overlapHitsBloom(train, eval,
      col("doc_id"), col("text"))
    assert(out.columns.toSeq == Seq("doc_id", "n_hit"))
    assert(out.count() == 0)
  }

  test("overlapHitsBloom plan: bloom probe filters the corpus grams before the join") {
    val eval = docs(900L -> "the quick brown fox jumps over it")
    val train = docs(1L -> "the quick brown fox runs", 2L -> "unrelated words only")
    val df = Decontamination.overlapHitsBloom(train, eval,
      col("doc_id"), col("text"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the bloom probe in the corpus-side filter:\n$plan")
  }

  test("plan: eval side broadcasts; no sort-merge join of the corpus") {
    val eval = docs(900L -> "the quick brown fox jumps over it")
    val train = docs(1L -> "the quick brown fox runs")
    val df = Decontamination.overlapHits(train, eval, col("doc_id"), col("text"))
    df.collect() // let AQE finalize the join strategy
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not sort-merge against the eval set:\n$plan")
  }

  test("contaminatedSpans finds the embedded passage and merges overlapping windows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // benchmark passage = "the quick brown fox jumps" (trigram starts
    // cover tokens 4..8 of the train doc below: grams at 4,5,6 merge)
    val eval = Seq((100L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val train = Seq(
      // passage embedded at tokens 4..8 -> one span [4, 8], 3 grams
      (1L, "alpha beta gamma the quick brown fox jumps delta epsilon"),
      // two DISJOINT hits: "the quick brown" at 1..3 and again at 7..9
      // -> spans [1,3] and [7,9]
      (2L, "the quick brown zig zag zog the quick brown"),
      (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Decontamination
      .contaminatedSpans(train, eval, col("doc_id"), col("text"))
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == Set((1L, 4, 8, 3L), (2L, 1, 3, 1L), (2L, 7, 9, 1L)),
      s"got $got")
  }
}
