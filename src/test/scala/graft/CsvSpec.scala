package graft

import graft.sinks.Csv
import org.scalatest.funsuite.AnyFunSuite

/** Go encoding/csv writer parity (reference sink csv/csv.go:8-16). */
class CsvSpec extends AnyFunSuite {

  test("plain fields are unquoted; records end with \\n") {
    assert(Csv.fromTable(Seq(Seq("a", "b"), Seq("c", "d"))) == "a,b\nc,d\n")
  }

  test("empty fields and empty table") {
    assert(Csv.fromTable(Seq(Seq("", ""))) == ",\n")
    assert(Csv.fromTable(Nil) == "")
  }

  test("comma, quote, newline force quoting; quotes double") {
    assert(Csv.encodeField("a,b") == "\"a,b\"")
    assert(Csv.encodeField("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(Csv.encodeField("two\nlines") == "\"two\nlines\"")
    assert(Csv.encodeField("cr\rhere") == "\"cr\rhere\"")
  }

  test("leading space quotes; trailing space does not (Go rule)") {
    assert(Csv.encodeField(" lead") == "\" lead\"")
    assert(Csv.encodeField("\tlead") == "\"\tlead\"")
    assert(Csv.encodeField("trail ") == "trail ")
    assert(Csv.encodeField("mid dle") == "mid dle")
  }

  test("the Postgres escape literal is quoted") {
    assert(Csv.encodeField("\\.") == "\"\\.\"")
    assert(Csv.encodeField("\\x") == "\\x")
  }
}
