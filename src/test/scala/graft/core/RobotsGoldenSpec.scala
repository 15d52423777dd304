package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate: our Robots evaluator must agree with the reference's
  * actual robots-parser library on every corpus verdict (golden_robots.tsv
  * from scripts/gen_robots_goldens.mjs over RobotsFuzz's grammar corpus). */
class RobotsGoldenSpec extends AnyFunSuite {

  test("all robots corpus verdicts match the reference robots-parser") {
    val in = getClass.getResourceAsStream("/golden_robots.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size == RobotsFuzz.cases.size)
    val parsed = RobotsFuzz.RobotsTxts.map(Robots.parse)
    var mismatches = List.empty[String]
    lines.foreach { line =>
      val Array(idx, url, ua, expected) = line.split("\t", -1)
      val ours = Robots.isAllowed(parsed(idx.toInt), url, ua)
      if (ours.toString != expected)
        mismatches ::= s"robots#$idx url=$url ua=$ua ref=$expected ours=$ours"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} mismatches:\n${mismatches.take(15).mkString("\n")}")
  }
}
