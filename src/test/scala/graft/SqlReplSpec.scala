package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlReplSpec extends AnyFunSuite {
  test("highlight colors keywords, strings and numbers, preserves text") {
    val in = "SELECT time, 'x' FROM w WHERE lat >= 7.5"
    val out = graft.cli.SqlRepl.highlight(in)
    assert(out.replaceAll("\u001b\\[\\d+m", "") == in) // lossless modulo ANSI
    assert(out.contains("\u001b[36mSELECT\u001b[0m"))
    assert(out.contains("\u001b[32m'x'\u001b[0m"))
    assert(out.contains("\u001b[33m7.5\u001b[0m"))
  }
}
