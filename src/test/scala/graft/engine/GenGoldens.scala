package graft.engine
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val web = SyntheticWeb.Config(nHosts = 8, pagesPerHost = 32, megaFactor = 4)
    val sb = new StringBuilder
    for (h <- 0 until 8; p <- 0 until 8) {
      val u = SyntheticWeb.pageUrl(h, p)
      val fr = SyntheticWeb.fetch(web, u)
      if (fr.status == 200 && fr.contentType.contains("text/html") && fr.html.nonEmpty) {
        val text = graft.core.Extract.extract(fr.html, u, 0L, graft.core.Extract.Options(format = "text")).content
        val md = graft.core.Extract.extract(fr.html, u, 0L, graft.core.Extract.Options(format = "markdown")).content
        def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        sb.append(s"$u\t${sha(text)}\t${sha(md)}\n")
      }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/src/test/resources/golden_extract_hashes.tsv"),
      sb.toString)
    // two full goldens for human inspection
    val u0 = SyntheticWeb.pageUrl(1, 3)
    val fr0 = SyntheticWeb.fetch(web, u0)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/src/test/resources/golden_page_1_3.md"),
      graft.core.Extract.extract(fr0.html, u0, 0L, graft.core.Extract.Options(format = "markdown")).content)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/src/test/resources/golden_page_1_3.txt"),
      graft.core.Extract.extract(fr0.html, u0, 0L, graft.core.Extract.Options(format = "text")).content)
    println("goldens written")
  }
}
