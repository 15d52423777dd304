package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity regression goldens (FIXTURES.md §2 golden_text /
  * golden_markdown): SHA-256 of the extracted text AND markdown per url,
  * pinned in src/test/resources. Any change to the parser / extraction /
  * markdown kernels that shifts a single output byte fails here — the
  * cross-round guard for the north rule's per-row invariant.
  *
  * Regenerate deliberately with `Test/runMain graft.engine.GenGoldens`
  * after an intentional semantic change.
  */
class GoldenSpec extends AnyFunSuite {

  private val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)

  private def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("extracted text and markdown match pinned golden hashes byte-for-byte") {
    val lines = scala.io.Source.fromResource("golden_extract_hashes.tsv")
      .getLines().toSeq
    assert(lines.size > 40)
    lines.foreach { line =>
      val Array(u, textHash, mdHash) = line.split("\t")
      val fr = SyntheticWeb.fetch(web, u)
      val text = graft.core.Extract.extract(fr.html, u, 0L,
        graft.core.Extract.Options(format = "text")).content
      val md = graft.core.Extract.extract(fr.html, u, 0L,
        graft.core.Extract.Options(format = "markdown")).content
      assert(sha(text) == textHash, s"text drift for $u")
      assert(sha(md) == mdHash, s"markdown drift for $u")
    }
  }

  test("full golden files match byte-for-byte") {
    val u = SyntheticWeb.pageUrl(1, 3)
    val fr = SyntheticWeb.fetch(web, u)
    val md = graft.core.Extract.extract(fr.html, u, 0L,
      graft.core.Extract.Options(format = "markdown")).content
    val text = graft.core.Extract.extract(fr.html, u, 0L,
      graft.core.Extract.Options(format = "text")).content
    assert(md == scala.io.Source.fromResource("golden_page_1_3.md").mkString)
    assert(text == scala.io.Source.fromResource("golden_page_1_3.txt").mkString)
  }
}
