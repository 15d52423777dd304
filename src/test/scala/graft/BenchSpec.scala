package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bench harness internals that must not lie: a throwing pack query has to
  * surface as an error marker, never as a normal-looking wall time
  * (r6 verdict: the old `catch { _ => -1L }` swallowed the failure). */
class BenchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("bench-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("timeQueries: ok query gets a time, throwing query gets -1 + its error class") {
    val qs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q_ok" -> ((s: SparkSession, _: String) => s.range(10).toDF()),
      "q_boom" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("deliberately broken")))
    val res = Bench.timeQueries(spark, "/nonexistent", qs)
    val ok = res.find(_._1 == "q_ok").get
    assert(ok._2 > 0.0 && ok._3.isEmpty)
    val boom = res.find(_._1 == "q_boom").get
    assert(boom._2 == -1.0, "a throwing query must not record a wall time")
    assert(boom._3.contains("IllegalStateException"))
  }

  test("timeQueries: a query failing at ACTION time (not build time) is flagged too") {
    val qs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q_lazy_boom" -> ((s: SparkSession, _: String) =>
        s.read.parquet("/nonexistent/definitely_missing.parquet")))
    val res = Bench.timeQueries(spark, "/nonexistent", qs)
    assert(res.head._2 == -1.0 && res.head._3.nonEmpty)
  }

  test("annClusteredBench: IVF on a clustered corpus prunes AND recalls at low nprobe") {
    // 2000 vecs / 100 true clusters (20 members each): a query's true
    // top-10 are its 19 cluster-mates' nearest, and a 32-cell quantizer
    // must keep whole clusters inside cells. The assertions pin the block's
    // CLAIM, not a lucky number: at nprobe=4 (1/8 of cells) recall must be
    // high while candidates stay a small fraction of brute force.
    val json = Bench.annClusteredBench(spark, nVecs = 2000L)
    def field(obj: String, k: String): Double = {
      val m = (s""""$k":(-?[0-9.]+)""").r.findFirstMatchIn(obj)
      assert(m.nonEmpty, s"missing $k in $obj"); m.get.group(1).toDouble
    }
    val points = ("""\{"nprobe":[^}]*\}""").r.findAllIn(json).toVector
    assert(points.size == 3, s"expected 3 nprobe points in $json")
    val byProbe = points.map(p => field(p, "nprobe").toInt -> p).toMap
    assert(field(byProbe(4), "recall_at_10") >= 0.8,
      "clustered corpus: nprobe=4/32 must recover >=0.8 recall")
    assert(field(byProbe(4), "candidate_frac") <= 0.35,
      "clustered corpus: nprobe=4/32 must prune, not scan the table")
    // monotone in nprobe: more probes never lose recall or candidates
    assert(field(byProbe(1), "recall_at_10") <= field(byProbe(2), "recall_at_10") + 1e-9)
    assert(field(byProbe(2), "recall_at_10") <= field(byProbe(4), "recall_at_10") + 1e-9)
    assert(field(byProbe(1), "candidates") < field(byProbe(4), "candidates"))
  }

  test("annClusteredBench: disabled by nVecs=0") {
    assert(Bench.annClusteredBench(spark, nVecs = 0L) == "null")
  }
}
