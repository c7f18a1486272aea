package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.functions.TextHashExprs
import graft.tables.Tables

/** VERDICT r06 next #4: every corpus-stats operator has a pre-tokenized
  * overload so a caller who persists tokens once pays the tokenize once.
  * The token frames here are built with an INDEPENDENTLY-written
  * tokenization expression (not `Text.tokens`), so each equality row
  * genuinely tests the documented input contract ("any frame of shape
  * (doc_id, w: array<string>) with [[Text.tokens]] semantics"), not the
  * delegation plumbing against itself. */
class TokenizedOverloadsSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark

  private lazy val docs = Tables.load(spark, TestSessions.sf001, "documents")

  // deliberately NOT Text.tokens: same semantics, different expression tree
  private def independentTokens: org.apache.spark.sql.Column =
    array_remove(split(lower(col("text")), "[^a-z0-9_]+"), "")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("bm25Tokens over a caller-tokenized frame equals the string form") {
    val terms = Seq("data", "model", "the")
    val toks = docs.select(col("doc_id"), independentTokens.as("w"))
    assert(rows(Relevance.bm25Tokens(toks, terms, k = 20)) ==
      rows(Relevance.bm25(docs, terms, k = 20)))
  }

  test("unigramSurprisalTokens over a caller-tokenized frame equals the string form") {
    val toks = docs.select(col("doc_id"), independentTokens.as("w"))
    assert(rows(TextAnalysis.unigramSurprisalTokens(toks)) ==
      rows(TextAnalysis.unigramSurprisal(docs)))
  }

  test("collocationsTokens over a caller-tokenized frame equals the string form") {
    val toks = docs.select(independentTokens.as("w"))
    assert(rows(TextAnalysis.collocationsTokens(toks, minCount = 5, k = 50)) ==
      rows(TextAnalysis.collocations(docs, minCount = 5, k = 50)))
  }

  test("duplicatedNgramsGrams over a persisted gram frame equals the string form") {
    val grams = docs.select(col("doc_id"),
        explode(TextHashExprs.tokenTrigramHashes(spark, col("text"))).as("gh"))
      .persist()
    try {
      grams.count()
      assert(rows(TextAnalysis.duplicatedNgramsGrams(grams)) ==
        rows(TextAnalysis.duplicatedNgrams(docs)))
    } finally { grams.unpersist(blocking = false); () }
  }

  test("a persisted token frame is scanned, not re-tokenized, on every branch") {
    // The whole point of the overloads: with tokens persisted upstream,
    // no branch of any stats operator re-runs the tokenize. The walk is
    // over the physical OPERATOR tree — InMemoryTableScanExec is a leaf,
    // so the cached relation's BUILD plan (which legitimately contains
    // the one tokenize that populated the cache) is not visited.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def physical(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    def tokenizeNodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case n if n.expressions.exists(_.toString.contains("split(")) => n
    }
    def cacheScans(p: SparkPlan): Int =
      p.collect { case s: InMemoryTableScanExec => s }.size

    val toks = docs.select(col("doc_id"),
      graft.ops.Text.tokens(col("text")).as("w")).persist()
    try {
      toks.count()
      val bmPlan = physical(Relevance.bm25Tokens(toks, Seq("data", "model"), k = 10))
      assert(tokenizeNodes(bmPlan).isEmpty,
        s"tokenize leaked into plan:\n$bmPlan")
      assert(cacheScans(bmPlan) >= 2,
        s"expected both branches on the cache, got ${cacheScans(bmPlan)}:\n$bmPlan")

      val sPlan = physical(TextAnalysis.unigramSurprisalTokens(toks))
      assert(tokenizeNodes(sPlan).isEmpty,
        s"tokenize leaked into plan:\n$sPlan")
    } finally { toks.unpersist(blocking = false); () }
  }
}
