package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time each SparkEntry query individually (count only). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.all.foreach { q =>
      if (only.isEmpty || only(q.name)) {
        val t0 = System.nanoTime()
        try {
          val n = q.run(spark, sfDir).count()
          println(f"TIMING ${q.name}%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
        } catch {
          case e: Throwable =>
            println(f"TIMING ${q.name}%-28s FAILED ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
        }
      }
    }
    spark.stop()
  }
}
