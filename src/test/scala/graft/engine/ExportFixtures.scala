package graft.engine

/** Dumps the synthetic-web fixture HTML to /tmp/graft_fixtures so the
  * REFERENCE extractor (node + /root/reference/dist/extract.js, i.e. the
  * actual cheerio+turndown pipeline) can be run over the same corpus to
  * produce reference-true goldens. See scripts/gen_reference_goldens.mjs.
  */
object ExportFixtures {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/graft_fixtures")
    java.nio.file.Files.createDirectories(outDir)
    val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)
    val manifest = new StringBuilder
    var n = 0
    for (h <- 0 until 8; p <- 0 until 8) {
      val u = SyntheticWeb.pageUrl(h, p)
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty) {
        val name = s"page_${h}_$p.html"
        java.nio.file.Files.writeString(outDir.resolve(name), fr.html)
        manifest.append(s"$name\t$u\n")
        n += 1
      }
    }
    java.nio.file.Files.writeString(outDir.resolve("manifest.tsv"), manifest.toString)
    println(s"$n fixtures -> $outDir")
  }
}
