package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DedupAgainstSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // long texts so trigram shingles are meaningful; 101 is a light edit of
  // corpus doc 1 (near-dup), 102 an exact copy of corpus doc 2, 103 unique
  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river " +
    "bank while the sun sets slowly behind the old stone bridge tonight"
  private val other =
    "an entirely different document about distributed query engines and " +
    "columnar storage formats with vectorized execution and late binding"
  private val corpus = Seq(
    (1L, base),
    (2L, other),
    (3L, "short unrelated corpus text about gardening tips and tools"))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (101L, base + " again"), // near-dup of 1 (J = 22/23, bands catch it)
    (102L, other),                            // exact dup of 2
    (103L, "completely novel batch document describing sailing routes " +
      "across the northern archipelago under midnight sun conditions"))
    .toDF("doc_id", "text")

  test("exact and near duplicates of the corpus are dropped; novel docs survive") {
    val got = Dedup.dedupAgainst(batch, corpus).as[Long].collect().toSeq
    assert(got == Seq(103L))
  }

  test("an empty batch survives vacuously; a disjoint batch survives whole") {
    assert(Dedup.dedupAgainst(batch.filter(lit(false)), corpus).count() == 0)
    val disjoint = batch.filter(col("doc_id") === 103L)
    assert(Dedup.dedupAgainst(disjoint, corpus).as[Long].collect().toSeq == Seq(103L))
  }

  test("result is deterministic across invocations and repartitionings") {
    val a = Dedup.dedupAgainst(batch.repartition(7), corpus.repartition(3))
      .as[Long].collect().toSeq
    val b = Dedup.dedupAgainst(batch, corpus).as[Long].collect().toSeq
    assert(a == b)
  }

  test("corpus signature index persists to checkpointDir and is reused") {
    val dir = java.nio.file.Files.createTempDirectory("xdedup").toString
    try {
      // corpus must be file-backed for the artifact fingerprint
      val cPath = s"$dir/corpus.parquet"
      corpus.write.mode("overwrite").parquet(cPath)
      val c = spark.read.parquet(cPath)
      val first = Dedup.dedupAgainst(batch, c, checkpointDir = Some(s"$dir/idx"))
        .as[Long].collect().toSeq
      assert(first == Seq(103L))
      assert(new java.io.File(s"$dir/idx/sig").exists)
      // second batch against the same corpus reuses the artifact
      val second = Dedup.dedupAgainst(batch, c, checkpointDir = Some(s"$dir/idx"))
        .as[Long].collect().toSeq
      assert(second == Seq(103L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
