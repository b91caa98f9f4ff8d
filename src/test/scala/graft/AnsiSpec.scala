package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ansi

/** Goldens ported from the reference's strip tables
  * (scanner_test.go:92-135, parser_test.go:78-116) plus byte-exact edge
  * cases for the lenient branch's 10-byte lookahead (scanner.go:112-136).
  */
class AnsiSpec extends AnyFunSuite {

  val goldens: Seq[(String, String)] = Seq(
    // lenient (ESC-less) sequences — parser_test.go:86-105
    ("[90m$[0m /buildkite/agent/hooks/environment",
      "$ /buildkite/agent/hooks/environment"),
    ("plain text", "plain text"),
    ("[38;5;48m2025-04-22 11:43:30 INFO[0m [0mFound 2 files[0m",
      "2025-04-22 11:43:30 INFO Found 2 files"),
    ("remote: Counting objects: 100% (54/54)[K",
      "remote: Counting objects: 100% (54/54)"),
    // ESC'd sequences — scanner_test.go:110-124
    ("[38;5;48m2025-04-22 11:43:30 INFO[0m [0mFound 2 files[0m",
      "2025-04-22 11:43:30 INFO Found 2 files"),
    ("[31mError:[0m [1mBold text[0m",
      "Error: Bold text"),
  )

  test("reference strip goldens") {
    goldens.foreach { case (in, want) =>
      assert(Ansi.strip(in) == want, s"input=${in}")
    }
  }

  test("ESC[ skips arbitrary bytes up to the first letter") {
    assert(Ansi.strip("[?25h") == "")
    assert(Ansi.strip("a[12;34Hb") == "ab")
  }

  test("trailing lone ESC or [ is kept") {
    assert(Ansi.strip("abc") == "abc")
    assert(Ansi.strip("abc[") == "abc[")
    // ESC not followed by [ passes through
    assert(Ansi.strip("_bk") == "_bk")
  }

  test("lenient branch 10-byte lookahead window boundary") {
    // 8 digits + letter: within window -> stripped
    assert(Ansi.strip("[12345678m") == "")
    // 9 digits + letter: letter sits exactly at i+10 -> NOT stripped
    assert(Ansi.strip("[123456789m") == "[123456789m")
    // bare [ then immediate letter is a valid (zero-digit) sequence
    assert(Ansi.strip("[km") == "m")
  }

  test("lenient branch keeps [ when run is not letter-terminated") {
    assert(Ansi.strip("a[[12") == "a[[12")
    assert(Ansi.strip("x[1;2 y") == "x[1;2 y")
  }

  test("not idempotent by design (matches reference byte machine)") {
    // first pass keeps the first '[', strips "[0m"; second pass would strip
    // the reassembled "[0m" — the reference behaves identically.
    assert(Ansi.strip("[[0m0m") == "[0m")
  }

  test("properties: plain text unchanged, output never longer (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val plain = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      assert(Ansi.strip(plain) == plain)
      val anyAscii = Array.fill(rnd.nextInt(60))((1 + rnd.nextInt(127)).toChar).mkString
      assert(Ansi.strip(anyAscii).length <= anyAscii.length)
    }
  }

  test("multibyte UTF-8 content passes through untouched") {
    assert(Ansi.strip("héllo wörld — 日本語") == "héllo wörld — 日本語")
    assert(Ansi.strip("[31m日本語[0m") == "日本語")
  }
}
