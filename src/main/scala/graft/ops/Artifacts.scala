package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Durable parquet artifacts for expensive derived tables (MinHash
 * signature tables, LSH pair sets, IVF inverted indexes): the persist()
 * alternative a resumable 100 TB pipeline needs — a re-run (or a second
 * query batch over the same corpus) reads the artifact instead of
 * recomputing it (VERDICT r02 #8/#10).
 *
 * Validity is decided by a METADATA-ONLY fingerprint: params + the input
 * DataFrame's file paths, sizes and mtimes — no data scan. The marker is
 * stamped AFTER the data lands, so a crash mid-write leaves an invalid
 * artifact the next run rebuilds.
 */
private[ops] object Artifacts {

  /** Fingerprint of (params, canonicalized input plan, input
    * files+sizes+mtimes). The canonicalized plan distinguishes two
    * frames derived from the same files by different transformations
    * (e.g. `vec_id >= 5` vs the full table) — files alone would collide.
    * Requires a file-backed input — an in-memory frame has no identity a
    * marker could pin. */
  def fingerprint(df: DataFrame, params: String): String = {
    val files = df.inputFiles.sorted
    require(files.nonEmpty,
      "checkpointDir requires a file-backed input DataFrame (the artifact " +
      "marker pins the input's file paths/sizes/mtimes)")
    val hc = df.sparkSession.sparkContext.hadoopConfiguration
    val entries = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hc).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    // full-width treeString: the default toString truncates wide node
    // lists at maxToStringFields, which would let plans differing only
    // in late projection columns collide (r03 review)
    val plan = df.queryExecution.logical.canonicalized
      .treeString(verbose = true, addSuffix = false, maxFields = Int.MaxValue,
        printOperatorId = false)
    val bytes = (params +: plan +: entries).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5").digest(bytes))
  }

  /** Read-through parquet materialization: reuse `path` when its marker
    * matches `fp`, else build and publish.
    *
    * Publication is staged (ADVICE r10): the rebuild lands in a sibling
    * `<path>.__build` dir, the marker is stamped INSIDE it while it is
    * still private, and one delete+rename swaps it into place — so no
    * reader can ever observe a half-written parquet dir carrying a valid
    * marker (the old overwrite-then-stamp exposed seconds of that). The
    * remaining window is the millisecond delete+rename itself: a
    * concurrent same-path JVM mid-scan of the OLD artifact can still
    * lose files under itself, so same-artifact concurrent harness runs
    * stay out of contract (the ckptDir SF-keying handles the cross-SF
    * case; the bench runs alone by contract). */
  def parquetCheckpoint(spark: SparkSession, path: String, fp: String)(
      build: => DataFrame): DataFrame = {
    if (!isValid(spark, path, fp)) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, p.getName + ".__build")
      fs.delete(tmp, true)
      build.write.mode("overwrite").parquet(tmp.toString)
      stamp(spark, tmp.toString, fp)
      fs.delete(p, true)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(
          s"failed to publish artifact $tmp -> $p (concurrent writer?)")
    }
    spark.read.parquet(path)
  }

  /** Stamp `path`'s validity marker AFTER its data landed — the
    * underscore prefix keeps the marker invisible to Spark's file index
    * (the `_SUCCESS` convention), so it can live inside parquet dirs and
    * managed-table locations alike. */
  def stamp(spark: SparkSession, path: String, fp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, "_graft_fingerprint"), true)
    try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Spread a (possibly single-file) input across the session's cores
    * before compute-heavy per-row work — ONLY when the source really is
    * under-split. Metadata-only: `inputFiles` reads the analyzed plan's
    * FileIndex (`df.rdd` would force a second full physical planning and
    * defeat AQE coalescing — VERDICT r02 #4), and the SPLIT estimate
    * accounts for `maxPartitionBytes`: a few large parquet files already
    * scan as many partitions, and a blanket repartition of them would be
    * a gratuitous full shuffle (r03 review). File-status calls only
    * happen in the few-files case, so no RPC storm at 100 TB. Non-file
    * sources (in-memory test frames) report 0 files and get spread —
    * the desired small-input behavior. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= target) return df // enough files: no status calls
    val hc = spark.sparkContext.hadoopConfiguration
    val sizes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      f -> scala.util.Try(p.getFileSystem(hc).getFileStatus(p).getLen).getOrElse(0L)
    }
    // Spark's own split sizing (FilePartition.maxSplitBytes): the
    // dynamic bytesPerCore term means mid-size inputs already scan as
    // ~defaultParallelism partitions — estimating from
    // maxPartitionBytes alone would re-shuffle exactly those (r03
    // review). Codec-compressed text (.gz/.zip/.deflate) is NOT
    // byte-range splittable: one partition per file no matter the size.
    val conf = spark.sessionState.conf
    val openCost = math.max(1L, conf.filesOpenCostInBytes)
    val totalBytes = sizes.map(_._2 + openCost).sum
    val bytesPerCore = totalBytes / math.max(1, target)
    val maxSplit = math.max(1L, math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, bytesPerCore)))
    val splits = sizes.map { case (f, len) =>
      val splittable =
        !f.endsWith(".gz") && !f.endsWith(".zip") && !f.endsWith(".deflate")
      if (splittable) math.max(1L, (len + maxSplit - 1) / maxSplit) else 1L
    }.sum
    if (splits < target) df.repartition(target) else df
  }

  /** Whether the artifact at `path` matches fingerprint `fp` — callers
    * use this to skip an entire build stage, not just one table. */
  def isValid(spark: SparkSession, path: String, fp: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, "_graft_fingerprint")
    fs.exists(marker) && {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim == fp
      finally in.close()
    }
  }
}
