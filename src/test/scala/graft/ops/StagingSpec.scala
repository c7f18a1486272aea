package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.tables.Tables

/** The streaming rows' staged-replay-input contract: the directory is
  * written once per (staging plan, input files), reused untouched while
  * the fingerprint holds, and rebuilt the moment the staging
  * transformation or the fixture changes. */
class StagingSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark

  test("writeParquetOnce writes once, reuses on re-call, rebuilds on plan change") {
    val dir = java.nio.file.Files.createTempDirectory("staging_spec")
      .resolve("staged").toString
    val ev = Tables.load(spark, TestSessions.sf0001, "events")
    def stamps() = new java.io.File(dir).listFiles()
      .map(f => f.getName -> f.lastModified).toMap

    Staging.writeParquetOnce(ev.coalesce(2), dir, "spec")
    val s1 = stamps()
    assert(s1.keys.exists(_ == "_graft_fingerprint"))
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == ev.count())

    // identical staging plan: directory untouched (the bench-closure win)
    Staging.writeParquetOnce(ev.coalesce(2), dir, "spec")
    assert(stamps() == s1, "second call rewrote an up-to-date staged dir")

    // changed staging plan (filter differs) -> fingerprint miss -> rebuild
    Staging.writeParquetOnce(
      ev.filter(col("event_id") % 2 === 0).coalesce(2), dir, "spec")
    assert(stamps() != s1, "changed staging plan did not rebuild")
    assert(spark.read.parquet(dir).count() ==
      ev.filter(col("event_id") % 2 === 0).count())

    // different params salt alone also rebuilds (two tags never share)
    val s2 = stamps()
    Staging.writeParquetOnce(
      ev.filter(col("event_id") % 2 === 0).coalesce(2), dir, "other-tag")
    assert(stamps() != s2, "changed params salt did not rebuild")
  }
}
