package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ids(n: Int) = spark.range(n).toDF("id")
    .withColumn("toks", (col("id") * 37 % 90 + 1).cast("long"))

  test("distributed prefix sum equals the single-window reference layout") {
    val out = Packing.packSequences(ids(5000), col("id"), col("toks"), budget = 512)
    // reference: one global-order window (fine at test scale)
    val w = Window.orderBy(col("pack_key"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = ids(5000)
      .withColumn("pack_key", Sampling.shuffleKey(col("id"), 42))
      .withColumn("s", coalesce(sum("toks").over(w) - col("toks"), lit(0L)))
      .select(col("id"), expr("s div 512").as("seq_id"), (col("s") % 512).as("seq_offset"))
    val got = out.select("id", "seq_id", "seq_offset").orderBy("id").collect()
    assert(got.sameElements(ref.orderBy("id").collect()))
    // every sequence except the last starts at offset 0 somewhere and
    // the ids partition the corpus
    assert(out.count() == 5000)
  }

  test("stable under repartitioning; straddle and degenerate-token semantics") {
    val a = Packing.packSequences(ids(2000), col("id"), col("toks"), budget = 256)
      .select("id", "seq_id", "seq_offset", "straddles").orderBy("id").collect()
    val b = Packing.packSequences(ids(2000).repartition(13), col("id"), col("toks"),
        budget = 256)
      .select("id", "seq_id", "seq_offset", "straddles").orderBy("id").collect()
    assert(a.sameElements(b))
    // a document longer than the budget always straddles; null tokens
    // pack as zero-width (never straddle, never advance the offset)
    val df = Seq((1L, Some(500L)), (2L, Option.empty[Long]), (3L, Some(10L)))
      .toDF("id", "toks")
    val rows = Packing.packSequences(df, col("id"), col("toks"), budget = 256)
      .select("id", "straddles").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L)) // 500 > 256
    assert(!rows(2L))
    // offsets stay inside [0, budget)
    val off = Packing.packSequences(ids(1000), col("id"), col("toks"), budget = 128)
      .agg(min("seq_offset"), max("seq_offset")).head()
    assert(off.getLong(0) >= 0 && off.getLong(1) < 128)
  }

  test("tied pack keys still partition the token space (ROWS frame, r05 review)") {
    // identical keys hash to identical pack_keys; the RANGE-frame cut
    // pooled their cumulative sums into overlapping sequence ranges
    val df = Seq((7L, 5L), (7L, 5L), (7L, 5L)).toDF("id", "toks")
    val starts = Packing.packSequences(df, col("id"), col("toks"), budget = 7)
      .select(col("seq_id") * 7 + col("seq_offset")).as[Long].collect().sorted
    assert(starts.sameElements(Array(0L, 5L, 10L)), starts.mkString(","))
  }

  test("the corpus window is bucket-partitioned, not a global single partition") {
    val p = Packing.packSequences(ids(1000), col("id"), col("toks"), budget = 512)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__pack_b"), s"plan:\n$p")
  }
}
