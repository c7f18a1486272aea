package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RecallAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val emb = graft.tables.Tables
    .load(spark, graft.TestSessions.sf001, "embeddings")

  private lazy val audit = Similarity.recallAudit(
      emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
      k = 5, nlist = 8, nprobe = 4, iters = 2)
    .as[(String, Long, Long, Double)].collect()
    .map(r => r._1 -> r).toMap

  test("brute force audits itself at exactly 1.0") {
    val (_, hits, total, recall) = audit("brute")
    assert(hits == total && total == 50L && recall == 1.0) // 10 queries x k
  }

  test("approximate recalls are valid fractions with sane fixture floors") {
    Seq("ivf", "lsh").foreach { m =>
      val (_, hits, total, recall) = audit(m)
      assert(total == 50L)
      assert(hits >= 0L && hits <= total)
      assert(recall == BigDecimal(hits.toDouble / total)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // at nprobe/nlist = 1/2 and 8 tables the fixture recalls are well
    // above chance — a regression to near-zero recall must fail loudly
    assert(audit("ivf")._4 >= 0.4, audit("ivf").toString)
    assert(audit("lsh")._4 >= 0.4, audit("lsh").toString)
  }

  test("recall matches an independent set computation (ivf)") {
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10), 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(
        emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10), 5,
        nlist = 8, nprobe = 4, iters = 2)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val expected = BigDecimal(brute.intersect(ivf).size.toDouble / brute.size)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(audit("ivf")._4 == expected)
  }
}
