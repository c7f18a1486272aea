package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ScriptProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("counts and dominant script per row; null text drops") {
    val df = Seq(
      (1L, "Hello world 42"),
      (2L, "你好世界 ok"),     // CJK dominant over 2 latin
      (3L, "Привет"), // Cyrillic only
      (4L, "12345 !!!"),
      (5L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(df)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(7))))
      .toMap
    assert(got(1L) == ((10L, 0L, 0L, 2L, "latin")))
    assert(got(2L) == ((2L, 4L, 0L, 0L, "cjk")))
    assert(got(3L) == ((0L, 0L, 6L, 0L, "cyrillic")))
    assert(got(4L) == ((0L, 0L, 0L, 5L, "other")))
    assert(!got.contains(5L))
  }

  test("ties resolve cjk > latin > cyrillic, and zero counts never win") {
    val df = Seq(
      (1L, "ab一二"),          // 2 latin, 2 cjk -> cjk
      (2L, "abаб"))          // 2 latin, 2 cyrillic -> latin
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(df)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(got == Map(1L -> "cjk", 2L -> "latin"))
  }
}
