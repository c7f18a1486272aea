package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The engine façade — a Spark-native replica of the reference's complete
 * public API, `DataFusionContext` with its five methods (reference:
 * `src/core.rs:34-99`):
 *
 * | reference                  | here               |
 * |----------------------------|--------------------|
 * | `greet()`                  | `SqlEngine.greet`  |
 * | `DataFusionContext::new()` | `SqlEngine(spark)` |
 * | `execute_sql(sql)`         | `executeSql(sql)`  |
 * | `set_s3_config(...)`       | `setS3Config(...)` |
 * | `set_result_format(fmt)`   | `setResultFormat`  |
 *
 * `executeSql` accepts multi-statement SQL, plans/executes each statement
 * through Catalyst (the reference's parse → plan → optimize → execute
 * pipeline, `src/core.rs:102-128`, with Spark as the engine instead of
 * DataFusion), formats each result, and joins them with `\n`.
 *
 * Deliberate deviations, documented per SURVEY.md:
 *  - `setResultFormat(Json)` is honored. The reference stores the format
 *    but `execute_inner` hard-codes the table path (`src/core.rs:120-122`)
 *    — Json is dead code there (SURVEY §3.4); we treat that as a bug.
 *  - No `target_partitions=1`: that is a WASM single-thread constraint,
 *    not a semantic (SURVEY §3.1). Execution parallelism follows the
 *    SparkSession.
 *  - Spill stays enabled (reference disables its disk manager,
 *    `src/core.rs:55`, because WASM has no disk) — a strict superset.
 */
class SqlEngine(val spark: SparkSession) {

  graft.functions.GapFillers.register(spark)

  // http(s) parquet/CSV/JSON scans — reference resolves these URL schemes
  // in its object store (src/object_store.rs:57-71)
  locally {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setIfUnset("fs.http.impl", classOf[graft.sources.HttpFileSystem].getName)
    hc.setIfUnset("fs.https.impl", classOf[graft.sources.HttpsFileSystem].getName)
  }

  private var resultFormat: ResultFormat = ResultFormat.Table

  def setResultFormat(fmt: ResultFormat): Unit = { resultFormat = fmt }

  /**
   * Map the reference's S3 credential surface (`src/core.rs:78-94` →
   * `src/object_store.rs:38-56`) onto Hadoop s3a configuration. The
   * reference hard-codes the AWS endpoint and stores (root, bucket,
   * region, keys); s3a scopes credentials per-bucket so concurrent
   * buckets work (superset).
   *
   * DOCUMENTED DEVIATION (ADVICE r04): the root prefix binds at
   * `CREATE EXTERNAL TABLE` translation time — the table's resolved
   * LOCATION embeds the prefix — while the reference's opendal operator
   * re-reads its root on every object access (`src/object_store.rs:49`).
   * Calling `setS3Config` with a different root therefore affects only
   * tables created AFTER the call here; already-registered tables keep
   * the location they were created with (re-issue the DDL to rebind).
   * Spark's catalog has no per-read path indirection that could match
   * the reference's late binding without a custom FileSystem shim; the
   * create-time contract is deterministic and documented instead.
   */
  def setS3Config(root: String, bucket: String, region: String,
      accessKeyId: String, secretAccessKey: String): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(s"fs.s3a.bucket.$bucket.access.key", accessKeyId)
    hc.set(s"fs.s3a.bucket.$bucket.secret.key", secretAccessKey)
    hc.set(s"fs.s3a.bucket.$bucket.endpoint.region", region)
    // the reference's opendal operator resolves every object path UNDER
    // `root` (`src/object_store.rs:49` `.root(&state.s3_config.root)`),
    // so s3://bucket/file with root 'data' reads bucket/data/file —
    // dropping root silently read a DIFFERENT object (r04 review).
    val r = root.stripPrefix("/").stripSuffix("/")
    if (r.nonEmpty) s3Roots(bucket) = r else s3Roots.remove(bucket)
  }

  private val s3Roots = scala.collection.mutable.Map[String, String]()

  /** s3/s3a URL with the bucket's configured root prefix spliced in
    * (reference parity); other URLs go through the default rewrite. */
  private[engine] def rewriteS3Url(url: String): String =
    if (url.startsWith("s3://") || url.startsWith("s3a://")) {
      val rest = url.stripPrefix("s3://").stripPrefix("s3a://")
      val (bucket, slashPath) = rest.span(_ != '/')
      val path = slashPath.stripPrefix("/")
      s3Roots.get(bucket) match {
        case Some(r) => s"s3a://$bucket/$r/$path"
        case None => s"s3a://$bucket/$path"
      }
    } else DdlTranslator.rewriteUrl(url)

  /** Execute one-or-many `;`-separated statements; returns the formatted
    * results joined by `\n` (reference: `src/core.rs:104,124,127`). */
  def executeSql(sql: String): String =
    StatementSplitter.split(sql)
      .map(stmt => Formatter.format(executeStatement(stmt), resultFormat))
      .mkString("\n")

  /** Execute a single statement to a DataFrame (no formatting). */
  def executeStatement(stmt: String): DataFrame = {
    // documented gaps (SURVEY §7.5): fail with a clear message instead of
    // a downstream parse error
    val masked = Dialect.maskLiterals(stmt)
    if ("""(?i)\bcurrent_time\s*\(""".r.findFirstIn(masked).isDefined)
      throw new UnsupportedOperationException(
        "current_time()/TIME type is not supported (Spark has no TIME type; see README non-goals)")
    // GROUPS frames: dense_rank-keyed RANGE restructure for the common
    // shape; unsupported shapes raise the documented clean error inside
    // the rewrite. Runs first — the other rewrites then see the
    // restructured text.
    // alias + info-schema rewrites apply only outside string literals;
    // SIMILAR TO locates the keyword on a same-length literal mask (its
    // pattern IS a literal, but the keyword must sit outside one)
    // the resolver lets the GROUPS rewrite PROVE an expression subquery
    // uncorrelated (r06): a body that fully analyzes standalone (catalog
    // + temp views, no outer scope) cannot reference an outer row, so
    // lifting it into a CTE is sound. spark.sql on SELECT text analyzes
    // lazily-created plans without executing anything.
    val groupsRewritten = Dialect.withResolver(
      s => scala.util.Try(spark.sql(s)).isSuccess)(
      Dialect.rewriteGroupsFrames(stmt))
    val aliased = Dialect.rewriteAggFirstLast(
      Dialect.rewriteGenerateSeries(Dialect.rewriteSimilarTo(
        Dialect.outsideLiterals(groupsRewritten)(
          graft.functions.GapFillers.rewriteAliases))))
    val translated = DdlTranslator.translate(aliased, rewriteS3Url)
    val rewritten =
      if (InfoSchema.mentionsInfoSchema(Dialect.maskLiterals(translated))) {
        InfoSchema.refresh(spark)
        Dialect.outsideLiterals(translated)(InfoSchema.rewrite)
      } else translated
    // MEDIAN/PERCENTILE_CONT anywhere in a query: rewrite the analyzed
    // plan's Aggregates onto the sort-based rank selection
    // (graft.ops.Percentiles) instead of Spark's
    // per-group-value-buffering aggregates — bit-identical results,
    // bounded memory at any group size (VERDICT r03 #1; plan-level
    // since r05, so joins/CTEs/HAVING/mixed lists qualify too). Runs on
    // the fully-translated text so dialect constructs (SIMILAR TO,
    // GROUPS, generate_series) compose with the bounded plan;
    // non-matching shapes fall through to the normal path, never an
    // error.
    // SURFACE CONTRACT (ADVICE r05): planning a matching percentile
    // statement may run a small Spark job HERE, at executeStatement
    // time, before the returned DataFrame is ever acted on — the
    // adaptive mode probe collects group cardinality + range boundaries
    // (grouping/value columns only, memoized per plan shape, and
    // skipped entirely when catalog/CBO statistics answer the
    // cardinality question and pick the default mode, r06).
    val df = PercentilePlanner.tryPlan(spark, rewritten)
      .getOrElse(spark.sql(rewritten))
    // hive-style partition discovery parity: the reference's listing
    // tables see partition dirs immediately; Spark catalog tables must
    // register them (scans of a pre-partitioned LOCATION are empty
    // otherwise)
    DdlTranslator.externalTableName(aliased).foreach { name =>
      val plain = name.replace("`", "").replace("\"", "")
      if (scala.util.Try(spark.catalog.listColumns(plain).collect()
            .exists(_.isPartition)).getOrElse(false)) {
        spark.sql(s"MSCK REPAIR TABLE $name")
      }
    }
    // header parity: Spark names an unaliased COUNT(*) column "count(1)";
    // the reference engine prints "count(*)" (SURVEY §7.5 watch item)
    if ("""(?i)count\s*\(\s*\*\s*\)""".r.findFirstIn(masked).isDefined &&
        df.columns.contains("count(1)")) {
      df.toDF(df.columns.map(c => if (c == "count(1)") "count(*)" else c).toIndexedSeq: _*)
    } else df
  }
}

object SqlEngine {
  /** Reference parity: `DataFusionContext.greet()` (`src/core.rs:43-45`)
    * is a wiring smoke test; ours identifies this engine. */
  def greet(): String = "hello from graft-spark"

  /** Session factory mirroring `DataFusionContext::new()` defaults the
    * engine relies on (UTC session, ANSI on, AQE on). */
  def newSession(master: String = "local[*]"): SqlEngine = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-sql-engine")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    new SqlEngine(spark)
  }
}
