package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop spot bench: time the named queries (min of two steady-state
  * noop-sink runs after one warmup) at `SPARK_GRAFT_SF_DIR` — the
  * per-query half of `Bench` without the full-suite sweep. Usage:
  * `sbt "runMain graft.MiniBench x97_embedding_covariance ..."`. */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "pass query names (keys of SparkEntry.queries)")
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"$n%-28s ${math.min(once(), once())}%.2f s")
    }
    spark.stop()
  }
}
