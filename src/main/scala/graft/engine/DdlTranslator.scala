package graft.engine

/**
 * Pre-parse rewriting of DataFusion-dialect DDL into Spark DDL.
 *
 * The reference registers file-backed listing tables via
 * `CREATE [UNBOUNDED] EXTERNAL TABLE name [(cols)] STORED AS
 * PARQUET|CSV|JSON [WITH HEADER ROW] [DELIMITER 'c'] LOCATION 'url'`
 * (DataFusion dialect, parsed by `DFParser` — reference:
 * `src/core.rs:103`; URL schemes resolved by the object-store registry,
 * `src/object_store.rs:44-73`). Spark expresses the same table as
 * `CREATE TABLE name [(cols)] USING format OPTIONS (path 'url', ...)`.
 *
 * `s3://` URLs are rewritten to `s3a://` (the Hadoop S3 connector —
 * a superset of the reference's opendal S3 path: range reads and
 * multipart work here, reference `src/unsafe_opendal_store.rs:100-107`
 * lacks them).
 */
object DdlTranslator {

  private val External =
    // column list allows one level of nested parens (DECIMAL(10,2), VARCHAR(n), ...)
    ("""(?is)^\s*CREATE\s+(?:UNBOUNDED\s+)?EXTERNAL\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?((?:"[^"]*"|`[^`]*`|[\w.])+)\s*""" +
      """(\((?:[^()]|\([^()]*\))*\))?\s*STORED\s+AS\s+(\w+)\s*(.*?)\s*LOCATION\s+'([^']+)'\s*;?\s*$""").r

  /** DataFusion double-quoted identifiers → Spark backticks (`"n"` is a
    * STRING literal to Spark's parser, r04 review). */
  private def quoteName(name: String): String =
    """"([^"]*)"""".r.replaceAllIn(name, m =>
      java.util.regex.Matcher.quoteReplacement(
        "`" + m.group(1).replace("`", "``") + "`"))

  /** Rewrite one statement; non-DDL statements pass through unchanged.
    * `urlRewrite` lets the engine splice per-bucket root prefixes in
    * (reference `set_s3_config` root semantics) — defaults to the plain
    * s3→s3a scheme rewrite. */
  def translate(stmt: String, urlRewrite: String => String = rewriteUrl): String = stmt match {
    case External(ifNotExists, name, cols, fmt, opts, location) =>
      val sparkFmt = fmt.toLowerCase match {
        case "parquet" => "parquet"
        case "csv" => "csv"
        case "json" | "ndjson" => "json"
        case other => other
      }
      val extraOpts = new StringBuilder
      val o = if (opts == null) "" else opts
      // consume the recognized clauses; anything left over must raise,
      // not vanish — a silently-dropped OPTIONS/COMPRESSION clause means
      // the table "works" but parses every file wrong (r04 review)
      var rest = o
      if ("""(?i)WITH\s+HEADER\s+ROW""".r.findFirstIn(rest).isDefined) {
        extraOpts ++= ", header 'true'"
        rest = """(?i)WITH\s+HEADER\s+ROW""".r.replaceFirstIn(rest, " ")
      }
      """(?i)DELIMITER\s+'([^']+)'""".r.findFirstMatchIn(rest).foreach { m =>
        extraOpts ++= s", sep '${m.group(1)}'"
      }
      rest = """(?i)DELIMITER\s+'([^']+)'""".r.replaceFirstIn(rest, " ")
      if (rest.trim.nonEmpty)
        throw new UnsupportedOperationException(
          s"CREATE EXTERNAL TABLE: unsupported clause '${rest.trim}' between " +
            "STORED AS and LOCATION (supported: WITH HEADER ROW, DELIMITER '<c>')")
      val ine = if (ifNotExists != null) "IF NOT EXISTS " else ""
      val colsPart = if (cols != null) s" $cols" else ""
      s"CREATE TABLE $ine${quoteName(name)}$colsPart USING $sparkFmt " +
        s"OPTIONS (path '${urlRewrite(location)}'${extraOpts.toString})"
    case other => other
  }

  /** The table name of a CREATE EXTERNAL TABLE statement, if this is one —
    * the engine runs partition recovery on it post-create (the reference's
    * listing tables discover hive-style partitions automatically; Spark
    * catalog tables need MSCK to register pre-existing partition dirs). */
  def externalTableName(stmt: String): Option[String] = stmt match {
    case External(_, name, _, _, _, _) => Some(quoteName(name))
    case _ => None
  }

  /** s3:// → s3a:// so the Hadoop connector resolves the bucket. */
  def rewriteUrl(url: String): String =
    if (url.startsWith("s3://")) "s3a://" + url.stripPrefix("s3://") else url
}
