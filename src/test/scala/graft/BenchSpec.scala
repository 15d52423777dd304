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
}
