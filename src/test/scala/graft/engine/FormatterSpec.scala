package graft.engine

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

/** Golden tests replicating the reference's formatter unit expectations
  * (reference: `src/result_format.rs:75-97` — id/name fixture) plus the
  * arrow rendering rules SURVEY §7.5 pins (nulls empty, RFC3339-ish
  * timestamps, Rust-style floats). */
class FormatterSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private lazy val fixture = Seq((1, "Alice"), (2, "Bob"), (3, "Charlie")).toDF("id", "name")

  test("table format: reference fixture renders headers, values, borders") {
    val s = Formatter.table(fixture)
    assert(s.contains("id") && s.contains("name"))
    assert(s.contains("Alice") && s.contains("Bob") && s.contains("Charlie"))
    assert(s.startsWith("+") && s.endsWith("+"))
    val expected =
      """+----+---------+
        || id | name    |
        |+----+---------+
        || 1  | Alice   |
        || 2  | Bob     |
        || 3  | Charlie |
        |+----+---------+""".stripMargin
    assert(s == expected)
  }

  test("json format: reference fixture is an array of objects") {
    val s = Formatter.json(fixture)
    assert(s.contains("\"id\":") && s.contains("\"name\":"))
    assert(s.contains("Alice") && s.contains("Bob") && s.contains("Charlie"))
    assert(s == """[{"id":1,"name":"Alice"},{"id":2,"name":"Bob"},{"id":3,"name":"Charlie"}]""")
  }

  test("nulls render empty in tables and are omitted in json") {
    val df = Seq((1, Some("x")), (2, None)).toDF("id", "v")
    val t = Formatter.table(df)
    assert(t.contains("| 2  |   |"))
    assert(Formatter.json(df) == """[{"id":1,"v":"x"},{"id":2}]""")
  }

  test("floats render Rust-Display style (integral without .0)") {
    val df = Seq((1.0, 2.5)).toDF("a", "b")
    val t = Formatter.table(df)
    assert(t.contains("| 1 | 2.5 |"))
  }

  test("floats never render scientific notation (Rust Display parity)") {
    // r04 review: Java Double.toString switches to 1.0E15 / 1.23E-7
    // outside [1e-3, 1e7); Rust Display never does
    val df = Seq((1e15, 1.5e16, 0.000000123, -2.5e-5)).toDF("a", "b", "c", "d")
    val t = Formatter.table(df)
    assert(!t.contains("E"), t)
    assert(t.contains("1000000000000000"), t)
    assert(t.contains("15000000000000000"), t)
    assert(t.contains("0.000000123"), t)
    assert(t.contains("-0.000025"), t)
  }

  test("timestamps render RFC3339-like without zone") {
    val df = Seq(
      Tuple1(Timestamp.valueOf("2024-01-05 07:08:09")),
      Tuple1(Timestamp.valueOf("2024-01-05 07:08:09.25"))).toDF("ts")
    val t = Formatter.table(df)
    assert(t.contains("2024-01-05T07:08:09 "))
    assert(t.contains("2024-01-05T07:08:09.250"))
  }

  test("structs and arrays render arrow-style") {
    val df = spark.sql("SELECT named_struct('a', 1, 'b', 'x') AS s, array(1, 2) AS arr")
    val t = Formatter.table(df)
    assert(t.contains("{a: 1, b: x}"))
    assert(t.contains("[1, 2]"))
  }

  test("empty result still prints the header block") {
    val df = fixture.filter("id > 99")
    val t = Formatter.table(df)
    assert(t.contains("| id | name |"))
  }
}
