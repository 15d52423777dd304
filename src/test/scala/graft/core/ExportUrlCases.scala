package graft.core

/** Writes the UrlFuzz case corpus for scripts/gen_url_goldens.mjs. */
object ExportUrlCases {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    UrlFuzz.cases.foreach { case (b, h) => sb.append(s"$b\t$h\n") }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_url_cases.tsv"), sb.toString)
    println(s"${UrlFuzz.cases.size} cases")
  }
}
