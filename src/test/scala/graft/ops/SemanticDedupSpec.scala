package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val emb = graft.tables.Tables
    .load(spark, graft.TestSessions.sf001, "embeddings")
    .select("vec_id", "embedding")

  /** Exact all-pairs cosine >= t on a SMALL frame (test oracle only). */
  private def brutePairs(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val a = df.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = df.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("ea"), col("eb")), 9).as("sim"))
      .filter(col("sim") >= t)
  }

  /** The fixture's embeddings carry no natural cosine-0.9 pairs (they are
    * i.i.d.-ish) — every test plants exact twins, the x16-spec pattern. */
  private def withTwins(df: org.apache.spark.sql.DataFrame, mod: Long) =
    df.unionByName(df.filter(col("vec_id") % mod === 0)
      .withColumn("vec_id", col("vec_id") + lit(100000L)))

  test("nlist = 1 degenerates to the exact pairwise threshold-join") {
    val sub = withTwins(emb.filter(col("vec_id") < 80), 10)
    val brute = brutePairs(sub, 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val sem = Similarity.semanticDedupPairs(sub, minCosine = 0.9,
        nlist = 1, iters = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(sem == brute)
    assert(brute.nonEmpty) // the planted twins must appear; guard vacuity
  }

  test("cell-bucketed pairs are a subset of the exact pairs, sims identical") {
    val sub = withTwins(emb.filter(col("vec_id") < 120), 10)
    val brute = brutePairs(sub, 0.9).as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val sem = Similarity.semanticDedupPairs(sub, minCosine = 0.9,
        nlist = 8, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(sem.nonEmpty)
    sem.foreach { case (a, b, s) =>
      assert(brute.get((a, b)).contains(s), s"pair ($a,$b) not an exact pair")
    }
  }

  test("planted identical twins always pair at cosine 1.0, any nlist") {
    val planted = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + lit(100000L))
    val twins = Similarity.semanticDedupPairs(
        emb.unionByName(planted), minCosine = 0.95, nlist = 16, iters = 2)
      .filter(col("vec_b") === col("vec_a") + 100000L &&
        col("vec_a") < 5)
      .as[(Long, Long, Double)].collect()
    assert(twins.length == 5)
    twins.foreach { case (a, b, s) =>
      assert(b == a + 100000L && s == 1.0, s"twin ($a,$b) sim $s")
    }
  }

  test("survivors = corpus minus non-representative component members") {
    val sub = withTwins(emb.filter(col("vec_id") < 150), 25)
    val pairs = Similarity.semanticDedupPairs(sub, minCosine = 0.9,
        nlist = 8, iters = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    // independent union-find over the same pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap { case (a, b) => Seq(a, b) }.toSet
    val dropped = members.filter(m => find(m) != m)
    val all = sub.select("vec_id").as[Long].collect().toSet
    val expected = all -- dropped
    val got = Similarity.semanticDedup(sub, minCosine = 0.9,
        nlist = 8, iters = 2).as[Long].collect().toSet
    assert(got == expected)
    assert(dropped.nonEmpty) // the fixture's planted dups must collapse
  }

  test("semanticDecontaminate drops twins of eval vectors, keeps the rest") {
    val eval = emb.filter(col("vec_id") < 5)
    val corpus = emb.filter(col("vec_id") >= 5 && col("vec_id") < 100)
      .unionByName(eval.withColumn("vec_id", col("vec_id") + lit(100000L)))
    val kept = Similarity.semanticDecontaminate(corpus, eval, 0.95)
      .as[Long].collect().toSet
    assert(kept == (5L until 100L).toSet) // twins gone, naturals intact
  }

  test("semanticDecontaminate: the corpus side never shuffles") {
    val eval = emb.filter(col("vec_id") < 5)
    val corpus = emb.filter(col("vec_id") >= 5)
    val plan = Similarity.semanticDecontaminate(corpus, eval, 0.95)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the similarity join broadcasts eval and the anti-join broadcasts
    // the flagged set, so exactly ONE hash exchange remains: the
    // distinct over flagged ids — contamination-bounded, never the
    // corpus (whose scans sit directly under broadcast joins)
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"$hashExchanges hash exchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
  }

  test("dedupCorpusBy keeps the best-scored member; ties break to min id") {
    import graft.tables.Tables
    val docs = Tables.load(spark, graft.TestSessions.sf001, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .filter(col("doc_id") < 200)
    val planted = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        (col("n_chars") + 1000000L).as("n_chars"))
    val all = docs.unionByName(planted)
    val kept = Dedup.dedupCorpusBy(all, "n_chars", minJaccard = 0.9)
      .as[Long].collect().toSet
    // independent recomputation: engine pair set -> union-find -> argmax
    val pairs = Dedup.minhashLsh(all, minJaccard = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val score = all.select("doc_id", "n_chars")
      .as[(Long, Long)].collect().toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val best = members.groupBy(find).values
      .map(cl => cl.maxBy(id => (score(id), -id))).toSet
    val expected = score.keySet -- members ++ best
    assert(kept == expected)
    assert(members.nonEmpty) // twins must have clustered
    // no planted original may survive: its twin always outranks it
    assert(!kept.exists(id => id < 100000L && id % 25 == 0 &&
      members.contains(id + 100000L)))
  }

  test("connectedComponents labels every member with its component minimum") {
    val pairs = Seq((2L, 5L), (5L, 9L), (30L, 31L), (7L, 2L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 7L -> 2L,
      30L -> 30L, 31L -> 30L))
  }
}
