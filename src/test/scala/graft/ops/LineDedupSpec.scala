package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    Dedup.lineDedup(rows.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("first occurrence survives, every later occurrence is cut") {
    val got = run(Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),
      (3L, "gamma\nalpha\nepsilon")))
    assert(got(1L) == (("alpha\nbeta\ngamma", 3L, 3L)))
    assert(got(2L) == (("delta", 2L, 1L))) // beta lost to doc 1
    assert(got(3L) == (("epsilon", 3L, 1L))) // gamma + alpha lost to doc 1
  }

  test("within-document repeats keep only the earliest position") {
    val got = run(Seq((7L, "x\ny\nx\nx")))
    assert(got(7L) == (("x\ny", 4L, 2L)))
  }

  test("a document losing every line re-assembles to the empty string") {
    val got = run(Seq((1L, "a\nb"), (2L, "a\nb"), (3L, "b\na")))
    assert(got(1L) == (("a\nb", 2L, 2L)))
    assert(got(2L) == (("", 2L, 0L)))
    assert(got(3L) == (("", 2L, 0L)))
  }

  test("keep-first order is (doc_id, pos), not input order") {
    // "z" appears at pos 1 of doc 5 and pos 0 of doc 9: doc 5 wins
    val got = run(Seq((9L, "z\nq"), (5L, "w\nz")))
    assert(got(5L) == (("w\nz", 2L, 2L)))
    assert(got(9L) == (("q", 2L, 1L)))
  }

  test("single-line docs degrade to exact line dedup; counts reconcile") {
    val rows = (1L to 40L).map(i => (i, s"line${i % 10}"))
    val got = run(rows)
    assert(got.size == 40)
    // exactly the first ten docs keep their (unique-so-far) line
    assert(got.count { case (_, (_, _, kept)) => kept == 1L } == 10)
    assert(got.values.map(_._2).sum == 40L) // n_lines totals the corpus
  }

  test("duplicatedLines: exact doc/occurrence counts, singletons excluded, k-capped") {
    val rows = Seq((1L, "a\nb\na"), (2L, "a\nc"), (3L, "b\nunique"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedLines(rows, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 3L), ("b", 2L, 2L))) // c/unique: singletons
    val capped = Dedup.duplicatedLines(rows, k = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(capped == Seq(("a", 2L, 3L)))
  }

  private def runAgainst(batch: Seq[(Long, String)],
      corpus: Seq[(Long, String)]): Map[Long, (String, Long, Long)] =
    Dedup.lineDedupAgainst(batch.toDF("doc_id", "text"),
        corpus.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("ingest: corpus lines are cut, novel lines survive, batch-internal dups once") {
    val corpus = Seq((1L, "old1\nold2"), (2L, "old3"))
    val got = runAgainst(Seq(
      (10L, "old2\nnew1\nnew2"),
      (11L, "new1\nold3\nnew3")), corpus)
    assert(got(10L) == (("new1\nnew2", 3L, 2L)))
    assert(got(11L) == (("new3", 3L, 1L))) // new1 lost to doc 10, old3 to corpus
  }

  test("ingest: re-ingesting the corpus itself cuts everything") {
    val corpus = Seq((1L, "a\nb\nc"), (2L, "d\ne"))
    val got = runAgainst(corpus.map { case (id, t) => (id + 100, t) }, corpus)
    got.values.foreach { case (text, _, kept) =>
      assert(text == "" && kept == 0L)
    }
  }

  test("bloom ingest variant returns identical output, incl. empty corpus") {
    val corpus = Seq((1L, "old1\nold2"), (2L, "old3"))
    val batch = Seq((10L, "old2\nnew1\nnew2"), (11L, "new1\nold3\nnew3"))
    val exact = runAgainst(batch, corpus)
    val bloom = Dedup.lineDedupAgainstBloom(batch.toDF("doc_id", "text"),
        corpus.toDF("doc_id", "text"), expectedCorpusLines = 1024)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(bloom == exact)
    val emptyCorpus = Dedup.lineDedupAgainstBloom(
        batch.toDF("doc_id", "text"),
        corpus.toDF("doc_id", "text").filter(col("doc_id") < 0))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // no corpus → plain within-batch line dedup
    assert(emptyCorpus == run(batch))
  }

  test("ingest agrees with from-scratch lineDedup on the union (novel rows)") {
    val corpus = Seq((1L, "p\nq"), (2L, "r"))
    val batch = Seq((50L, "q\ns\nt"), (51L, "s\nu"))
    val viaIngest = runAgainst(batch, corpus)
    val scratch = run(corpus ++ batch)
    batch.map(_._1).foreach { id =>
      assert(viaIngest(id) == scratch(id), s"doc $id")
    }
  }

  test("NULL text reads as '' — the doc survives with one empty line (ADVICE r09)") {
    // split(NULL) generates no rows, so without the coalesce doc 2 would
    // VANISH from the per-document output — the family's "one row per
    // input document" contract demands it survive as the empty line.
    val got = run(Seq((1L, "a\nb"), (2L, null), (3L, null)))
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == (("a\nb", 2L, 2L)))
    assert(got(2L) == (("", 1L, 1L))) // first '' occurrence: kept
    assert(got(3L) == (("", 1L, 0L))) // second: cut (same line corpus-wide)
    // ingest side: a corpus NULL doc contributes the '' line to the index
    val viaIngest = runAgainst(Seq((10L, null), (11L, "x")), Seq((1L, null)))
    assert(viaIngest(10L) == (("", 1L, 0L))) // '' is a corpus member
    assert(viaIngest(11L) == (("x", 1L, 1L)))
  }

  test("line-hash index persists to checkpointDir; second run reads the artifact") {
    val dir = java.nio.file.Files.createTempDirectory("xlinededup").toString
    try {
      val cPath = s"$dir/corpus.parquet"
      Seq((1L, "c1\nc2")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(cPath)
      val c = spark.read.parquet(cPath)
      val batch = Seq((10L, "new1\nnew2")).toDF("doc_id", "text")
      val ckpt = Some(s"$dir/idx")
      val first = Dedup.lineDedupAgainst(batch, c, checkpointDir = ckpt)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(first == Seq((10L, "new1\nnew2", 2L, 2L)))
      val fp = Artifacts.fingerprint(c, "linehash-v1")
      assert(Artifacts.isValid(spark, s"$dir/idx/line_hash_index", fp),
        "marker absent or mismatched after the build")
      // Poison the artifact (keep the marker): add new2's hash to the
      // stored index. If the second run recomputed from the corpus the
      // output would be unchanged; reading the artifact, new2 is cut —
      // proving the read path, not just the marker's existence.
      import org.apache.spark.sql.functions.{explode, split}
      val poisoned = c
        .select(explode(split(col("text"), "\n")).as("line"))
        .select(org.apache.spark.sql.functions.xxhash64(col("line")).as("__lh"))
        .union(batch.select(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.lit("new2")).as("__lh")))
        .distinct()
      poisoned.write.mode("overwrite").parquet(s"$dir/idx/line_hash_index")
      val p = new org.apache.hadoop.fs.Path(s"$dir/idx/line_hash_index/_graft_fingerprint")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val second = Dedup.lineDedupAgainst(batch, c, checkpointDir = ckpt)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(second == Seq((10L, "new1", 2L, 1L)),
        "second run did not read the (poisoned) artifact — it recomputed")
      // bloom variant shares the artifact read path
      val bloomed = Dedup.lineDedupAgainstBloom(batch, c,
          expectedCorpusLines = 1024, checkpointDir = ckpt)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(bloomed == second)
      // the filter BYTES are a durable artifact too (r11): the build is
      // an index-wide aggregate, so a steady-state ingest must pay it
      // once — marker valid, part files untouched by a second call
      val fpB = Artifacts.fingerprint(c, "linebloom-v1|n=1024")
      assert(Artifacts.isValid(spark, s"$dir/idx/line_hash_bloom", fpB),
        "bloom artifact marker absent or mismatched after the build")
      def bStamps() = new java.io.File(s"$dir/idx/line_hash_bloom")
        .listFiles().map(f => f.getName -> f.lastModified).toMap
      val bs1 = bStamps()
      val bloomed2 = Dedup.lineDedupAgainstBloom(batch, c,
          expectedCorpusLines = 1024, checkpointDir = ckpt)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(bloomed2 == second)
      assert(bStamps() == bs1, "bloom artifact rebuilt on an unchanged corpus")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("bloom transport ceiling: oversize expectedCorpusLines is refused") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.lineDedupAgainstBloom(df, df, expectedCorpusLines = (1L << 26) + 1)
    }
    assert(e.getMessage.contains("lineDedupAgainst"),
      "the refusal must route callers to the exact-index fallback")
  }
}
