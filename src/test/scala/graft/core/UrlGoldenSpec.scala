package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for link resolution: `UrlNorm.resolve(href, base)`
  * must equal our canonical key of node's WHATWG `new URL(href, base)`
  * result (golden_urls.tsv from scripts/gen_url_goldens.mjs) on every
  * corpus case. The resolution ALGORITHM (dot segments, relative forms,
  * protocol-relative, query/fragment handling) is thereby pinned to the
  * reference's exact resolver; the canonical key form itself (fragment
  * drop, default-port strip, percent-case) is UrlNormSpec's contract.
  */
class UrlGoldenSpec extends AnyFunSuite {

  test("all url corpus resolutions match WHATWG new URL(href, base)") {
    val in = getClass.getResourceAsStream("/golden_urls.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size == UrlFuzz.cases.size)
    var mismatches = List.empty[String]
    lines.foreach { line =>
      val Array(base, href, golden) = line.split("\t", -1)
      val ours = UrlNorm.resolve(href, base)
      val expected = if (golden == "ERR") None else UrlNorm.canonicalize(golden)
      if (ours != expected)
        mismatches ::= s"base=$base href='$href'\n  whatwg=$golden -> key=$expected\n  ours  =$ours"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} mismatches:\n${mismatches.take(10).mkString("\n")}")
  }
}
