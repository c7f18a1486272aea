package graft.tools

import graft.engine.{ResultFormat, SqlEngine}

/** End-to-end demo of the engine façade: the reference's five-method API
  * driven exactly the way the npm package drives `DataFusionContext`
  * (reference: `README.md` usage + `src/core.rs:34-99`). */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    println(SqlEngine.greet())
    val engine = SqlEngine.newSession("local[4]")
    engine.spark.sparkContext.setLogLevel("WARN")

    println(engine.executeSql(
      s"""CREATE EXTERNAL TABLE lineitem STORED AS PARQUET LOCATION '$dir/lineitem.parquet';
         |SELECT l_returnflag, l_linestatus,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus;
         |SELECT table_name, table_type FROM information_schema.tables""".stripMargin))

    engine.setResultFormat(ResultFormat.Json)
    println(engine.executeSql("SELECT 1 AS id, 'Alice' AS name"))
    engine.spark.stop()
  }
}
