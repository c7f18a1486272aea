package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class StatementSplitterSpec extends AnyFunSuite {

  test("splits plain statements and drops empties") {
    assert(StatementSplitter.split("SELECT 1; SELECT 2 ;; SELECT 3") ==
      Seq("SELECT 1", "SELECT 2", "SELECT 3"))
  }

  test("semicolons inside single-quoted strings are kept") {
    assert(StatementSplitter.split("SELECT 'a;b'; SELECT 2") ==
      Seq("SELECT 'a;b'", "SELECT 2"))
  }

  test("escaped quotes ('' and \"\") do not terminate the literal") {
    assert(StatementSplitter.split("SELECT 'it''s; fine'; SELECT \"we\"\";rd\"") ==
      Seq("SELECT 'it''s; fine'", "SELECT \"we\"\";rd\""))
  }

  test("line comments swallow semicolons until newline") {
    assert(StatementSplitter.split("SELECT 1 -- no; split here\n; SELECT 2") ==
      Seq("SELECT 1 -- no; split here", "SELECT 2"))
  }

  test("nested block comments") {
    assert(StatementSplitter.split("SELECT 1 /* a /* b; */ c; */; SELECT 2") ==
      Seq("SELECT 1 /* a /* b; */ c; */", "SELECT 2"))
  }

  test("backtick identifiers") {
    assert(StatementSplitter.split("SELECT `a;b` FROM t; SELECT 2") ==
      Seq("SELECT `a;b` FROM t", "SELECT 2"))
  }

  test("trailing statement without semicolon") {
    assert(StatementSplitter.split("SELECT 1") == Seq("SELECT 1"))
  }
}
