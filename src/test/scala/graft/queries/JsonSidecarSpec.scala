package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

/** Pins the x86 sidecar-extraction contract: PERMISSIVE from_json turns
  * malformed / null / wrong-shape sidecars into NULL fields (never an
  * error), so the downstream filter sees one uniform miss shape. */
class JsonSidecarSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("malformed, null and wrong-shape sidecars extract as NULL; valid ones type") {
    val rows = Seq(
      (1L, """{"k": 42}"""),       // valid
      (2L, "not json at all"),     // malformed -> null struct
      (3L, null: String),          // null sidecar
      (4L, """{"other": 1}"""),    // valid JSON, missing field
      (5L, """{"k": "zzz"}"""))    // field present, untypeable -> null
      .toDF("id", "props")
    val got = rows.select(col("id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .as[(Long, Option[Int])].collect().toMap
    assert(got == Map(1L -> Some(42), 2L -> None, 3L -> None,
      4L -> None, 5L -> None))
  }
}
