package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Quiet-window wait (VERDICT r02-r05: four rounds of recorded benches
    // were contaminated by a concurrent JVM live for the WHOLE window —
    // min-of-two sampling cannot discard that). Before any timing starts,
    // poll the load average and wait, bounded, for the host to go quiet;
    // a contending JVM that drains within the budget no longer pollutes
    // the recorded numbers. `waited_s` lands in the JSON so a run that
    // timed out waiting is self-evident.
    val procs = Runtime.getRuntime.availableProcessors
    // VERDICT r06 #2: the r06 recording started at load 3.52 — below the
    // old bar (procs/8 = 4.0 at 32 procs) yet with a competing JVM live,
    // polluting q68/q69/q71 by 3.7-4.5x. procs/16 (= 2.0 here) actually
    // trips on that shape.
    val quietBar = math.max(1.0, procs / 16.0)
    val waitBudgetS = sys.env.getOrElse("SPARK_GRAFT_QUIET_WAIT_S", "180").toInt
    var waitedS = 0
    while (loadAvg > quietBar && waitedS < waitBudgetS) {
      Thread.sleep(5000); waitedS += 5
    }
    val loadStart = loadAvg
    // untimed warmup: JIT + codegen + parquet footer caches
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q01_agg_pushdown").foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }

    // Executing the FULL plan matters: a count() lets Catalyst drop unused
    // projections/sorts/windows (r01: a 6-window query "ran" in 0.17 s), so
    // every query is written to the `noop` sink — all columns computed, all
    // rows materialized, nothing hits disk. Each query runs three times:
    // the first is warmup (JIT, codegen, artifact builds), and the MIN of
    // the two steady-state runs is reported — a transiently contaminated
    // host window (a concurrent JVM mid-bench) inflates one run, and the
    // min discards it (three rounds of single-sample BENCH_r*.json were
    // polluted that way, VERDICT r02 #1 / r03 #8 / r04).
    def once(fn: (SparkSession, String) => Unit): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    }
    // Per-query sampling state (VERDICT r07 #2: BENCH_r07's x60-x74 band
    // recorded 1.5-21x the judge's isolated values; the history gate below
    // is blind to FIRST-ROUND queries, exactly the rows most likely to be
    // misjudged). Two additions close the hole:
    //  (a) the load average is recorded around each query's own window and
    //      any query whose window exceeded the quiet bar is retried, and
    //  (b) a query whose two smallest steady-state samples STILL disagree
    //      by >1.5x after all retries is flagged "suspect" in the output
    //      JSON so the judge/driver can discount the row — the min-of-N's
    //      own spread is the contamination signal history can't provide.
    final class Rec(val name: String,
        val run: (SparkSession, String) => Unit) {
      val samples = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var windowLoad = 0.0
      // A throw only marks the query failed while NO valid sample exists
      // (ADVICE r08: retries fire under contention, exactly when a
      // transient failure is most likely — a measured query must not
      // silently become a reported -1.0 because a load-gate or
      // history-gate RESAMPLE threw; the old history-gate retry kept the
      // original sec the same way).
      def sample(): Unit =
        if (!failed) try samples += once(run)
        catch { case _: Throwable => if (samples.isEmpty) failed = true }
      // ratio of the two smallest samples: ~1.0 when the min is reproduced
      def spread: Double = {
        val s = samples.sorted.take(2)
        if (s.length < 2 || s.head <= 0.05) 1.0 else s(1) / s.head
      }
      def sec: Double = if (failed || samples.isEmpty) -1.0 else samples.min
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val rec = new Rec(name, (s: SparkSession, dir: String) =>
        fn(s, dir).write.format("noop").mode("overwrite").save())
      val loadBefore = loadAvg
      // min of two steady-state runs; when the two disagree by >1.5x a
      // transient was likely mid-flight, so spend ONE more sample — the
      // min over three discards a single contaminated run entirely.
      try once(rec.run) catch { case _: Throwable => rec.failed = true } // warmup
      rec.sample(); rec.sample()
      if (rec.spread > 1.5) rec.sample()
      rec.windowLoad = math.max(loadBefore, loadAvg)
      rec
    }
    // Load gate (fix (a)): a query timed while the host load exceeded the
    // quiet bar gets one clean-window sample appended — min-of-N absorbs it.
    // The bar is lifted above the post-quiet-wait BASELINE load when that
    // baseline is already near the absolute bar (ADVICE r08: the bench's
    // own steady-state 1-min load ran 1.79 vs quietBar 2.0 in r08 — near
    // zero headroom, so a heavier query mix would trip the gate on SELF
    // load and pay the 30 s sleep + resample with no foreign contamination
    // present; gating on the delta above loadStart distinguishes the two).
    // The lift applies ONLY when the quiet wait actually reached the bar
    // (ADVICE r09): if the wait timed out with genuine foreign load still
    // running, loadStart IS that foreign load — folding it into the gate
    // would stop the clean-window resample from ever firing for equally
    // contaminated query windows, re-admitting the r02-r06 class of
    // inflated timings. On a timed-out wait the absolute bar stands.
    val gateBar =
      if (waitedS < waitBudgetS) math.max(quietBar, loadStart + 0.75)
      else quietBar
    results.foreach { rec =>
      if (!rec.failed && rec.sec > 0.05 && rec.windowLoad > gateBar) {
        var w = 0
        while (loadAvg > gateBar && w < 30) { Thread.sleep(5000); w += 5 }
        rec.sample()
        rec.windowLoad = math.min(rec.windowLoad, loadAvg)
      }
    }
    // Self-gate against history (VERDICT r06 #2): a query that recorded
    // >3x its own best-ever value for the same scale factor almost
    // certainly hit a contaminated window the quiet-wait and min-of-N
    // sampling both missed. Re-run it once more and keep the min — a
    // genuinely-slowed query keeps its slow number; a polluted sample is
    // replaced by a clean one. History = the per-round BENCH_r*.json lines
    // the driver leaves in the repo root.
    // The driver's BENCH_r*.json wraps this program's one-line JSON as a
    // TRUNCATED stdout tail under "tail" with a numeric "sf", so history
    // is recovered by regex over that fragment rather than a structural
    // parse; a leading partial pair self-excludes (no opening quote).
    // History deliberately reads ALL BENCH_r*.json rounds, including the
    // ones with known-contaminated values (r02-r06): contamination only
    // ever INFLATES a timing, and this map keeps per-query MINIMA — a
    // polluted round can never lower a query's best-ever value, so
    // filtering those rounds out would change nothing (VERDICT r08 nit).
    val histDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_HISTORY_DIR", "/root/repo"))
    // "sf0.1" -> "0.1"; matches both our own "sf":"/root/testdata/sf0.1"
    // and the driver's "sf":0.1 after basename/number normalization.
    val sfNum = new java.io.File(sfDir).getName.stripPrefix("sf")
    val qPair = """"((?:q|x)\d[A-Za-z0-9_]*)":(\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r
    val histMins: Map[String, Double] = {
      val files = Option(histDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("BENCH_r") && f.getName.endsWith(".json"))
      val entries = files.toSeq.flatMap { f =>
        try {
          val raw = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          import org.json4s._
          val json = org.json4s.jackson.JsonMethods.parse(raw)
          val sfOk = (json \ "sf") match {
            case JDouble(v)  => v.toString == sfNum
            case JInt(v)     => v.toString == sfNum
            case JDecimal(v) => v.toString == sfNum
            case JString(v)  => new java.io.File(v).getName == "sf" + sfNum
            case _           => false
          }
          // driver format: timings live inside the (unescaped) "tail"
          // string; self format: inside "queries" — regexing the
          // flattened text covers both.
          val text = (json \ "tail") match {
            case JString(t) => t
            case _          => raw
          }
          if (sfOk)
            qPair.findAllMatchIn(text)
              .map(m => m.group(1) -> m.group(2).toDouble)
              .filter(_._2 > 0).toSeq
          else Nil
        } catch { case _: Throwable => Nil }
      }
      entries.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    }
    results.foreach { rec =>
      val hist = histMins.getOrElse(rec.name, Double.MaxValue)
      if (rec.sec > 0.05 && hist != Double.MaxValue && rec.sec > 3.0 * hist)
        rec.sample()
    }
    // Fix (b): after every retry avenue is exhausted, a min that was never
    // reproduced within 1.5x is suspect — true for history-less first-round
    // queries and historied ones alike. The driver format keeps "queries"
    // as plain numbers (the history regex above depends on it); suspects
    // ride in a separate array.
    val suspects = results.collect {
      case r if !r.failed && r.sec > 0.05 && r.spread > 1.5 => r.name
    }
    val qs = results.map { r => s"\"" + r.name + "\":" + r.sec }
      .mkString("{", ",", "}")
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case r if r.sec >= 0 => r.sec }.sum
    // host-contamination telemetry (VERDICT r02 #1/#5): a concurrent
    // local[32] JVM inflates late-alphabet x-queries 4-30x; publishing
    // cores + load average makes a polluted run self-evident.
    val load = loadAvg
    // "procs" is the local[N] actually used — the env-derived core count
    // the whole session runs under. VERDICT r11 #2: it used to print
    // availableProcessors, so the driver's local[8] scaling run carried
    // "procs":32 and read as if $SPARK_GRAFT_CPUS were ignored. The host
    // core count stays available under "host_procs".
    // numeric even if someone exports SPARK_GRAFT_CPUS=* (local[*] is a
    // valid master but would break the JSON line)
    val usedProcs = scala.util.Try(cpus.trim.toInt).getOrElse(procs)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","procs":$usedProcs,"host_procs":$procs,"load_avg":$load,"load_avg_start":$loadStart,"waited_s":$waitedS,"suspect":$suspectJson}"""
    println(line)
    // VERDICT r11 #1: the driver stores only a TRUNCATED stdout tail, so
    // in 11 rounds it never recovered the one-line JSON ("parsed": null
    // in every BENCH_r*.json; PERF per_query/scaling empty). Defensively
    // ALSO land the exact same line as a file in the history dir (repo
    // root by default), overwritten per run — machine-recoverable without
    // touching the stdout contract. Best-effort: a read-only checkout
    // must not fail the bench.
    try java.nio.file.Files.write(
      histDir.toPath.resolve("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
