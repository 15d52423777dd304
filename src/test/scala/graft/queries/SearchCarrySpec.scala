package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pin the literal-mode search_content lastIndex carry-over
  * (reference /root/reference/src/server.ts:1890-1911): one global 'gi'
  * RegExp exec'd across lines; a match `break`s WITHOUT resetting
  * lastIndex, so the next line scans from the previous match-end; a miss
  * resets to 0. Cases hand-derived by running the JS loop semantics. */
class SearchCarrySpec extends AnyFunSuite {

  private def scan(lines: String*): Seq[(Int, Int, String)] =
    StreamQueries.literalScanCarry(lines.toArray, "spark")

  test("adjacent matching lines: second line scans from the carried offset") {
    // line 1 matches at 0 -> lastIndex 5; line 2's match at 0 is SKIPPED
    // (scan starts at 5), the one at 10 is found instead
    assert(scan("spark today", "spark puts spark") == Seq((1, 0, "spark"), (2, 11, "spark")))
  }

  test("carried offset past the only match loses it entirely") {
    // line 2's sole match sits at 0 < carry 5 -> missed, carry resets;
    // line 3 (same text) then matches at 0 again
    assert(scan("spark here", "spark", "spark") == Seq((1, 0, "spark"), (3, 0, "spark")))
  }

  test("a miss resets the carry to 0 for the following line") {
    assert(scan("spark lead", "nothing here", "spark back") ==
      Seq((1, 0, "spark"), (3, 0, "spark")))
  }

  test("carry beyond a short line's length is a miss (exec returns null)") {
    // line 1 match ends at 11; line 2 is 3 chars long -> null + reset
    assert(scan("smash spark", "abc", "spark") == Seq((1, 6, "spark"), (3, 0, "spark")))
  }

  test("case-insensitive match preserves the line's original casing") {
    assert(scan("run SPARK fast") == Seq((1, 4, "SPARK")))
    assert(scan("SpArKle") == Seq((1, 0, "SpArK")))
  }

  test("no carry without a preceding match: every line scans from 0") {
    assert(scan("x", "y spark") == Seq((2, 2, "spark")))
  }

  test("degenerate inputs: no lines / empty lines") {
    assert(scan() == Seq())
    assert(scan("", "", "spark") == Seq((3, 0, "spark")))
    // empty line after a match: lastIndex (5) > length (0) -> null + reset
    assert(scan("spark", "", "spark") == Seq((1, 0, "spark"), (3, 0, "spark")))
  }
}
