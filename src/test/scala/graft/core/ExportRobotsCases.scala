package graft.core

/** Writes the RobotsFuzz case corpus for scripts/gen_robots_goldens.mjs. */
object ExportRobotsCases {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    RobotsFuzz.cases.foreach { case (idx, path, ua) =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        RobotsFuzz.RobotsTxts(idx).getBytes("UTF-8"))
      sb.append(s"$idx\t$b64\t${RobotsFuzz.urlFor(path)}\t$ua\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_robots_cases.tsv"), sb.toString)
    println(s"${RobotsFuzz.cases.size} cases")
  }
}
