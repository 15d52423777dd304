package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** k-means|| init: determinism, bounded driver state, and that it actually
  * separates planted clusters (the property the IVF recall gate relies on).
  * End-to-end IVF recall stays gated by AnnRecallSpec. */
class KMeansParSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("kmeanspar-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 4 well-separated planted clusters in 8 dims, 200 points each. */
  private def planted(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until 800).map { i =>
      val c = i % 4
      val v = Array.tabulate(8) { j =>
        val base = if (j == 2 * c) 10f else 0f
        // deterministic sub-unit jitter
        base + ((graft.core.UrlNorm.xxh64(
          java.nio.ByteBuffer.allocate(8).putInt(i).putInt(j).array(), 5L)
          % 1000L) / 10000f)
      }.toSeq
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("deterministic: same table + seed gives identical centers") {
    val df = planted()
    val a = KMeansPar.init(spark, df, "vec_id", "embedding", k = 4)
    val b = KMeansPar.init(spark, df.repartition(7), "vec_id", "embedding", k = 4)
    assert(a.length == 4 && b.length == 4)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("recovers planted clusters: each center sits on one cluster axis, all four covered") {
    val centers = KMeansPar.init(spark, planted(), "vec_id", "embedding", k = 4)
    val axes = centers.map(c => c.indices.maxBy(j => c(j)))
    assert(axes.toSet == Set(0, 2, 4, 6), s"center axes ${axes.toSeq}")
    centers.foreach(c => assert(c.max > 8.0, s"center not on a cluster: ${c.toSeq}"))
  }

  test("lloydWeighted: weights dominate the init pick and the means") {
    val cand = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(10.4, 0.0))
    val w = Array(100L, 50L, 50L)
    val centers = KMeansPar.lloydWeighted(cand, w, k = 2)
    assert(centers.length == 2)
    val sorted = centers.sortBy(_.head)
    assert(math.abs(sorted(0)(0)) < 1e-9)
    assert(math.abs(sorted(1)(0) - 10.2) < 1e-9) // weighted mean of 10.0, 10.4
  }

  test("degenerate tiny input returns at most the candidate count, no crash") {
    import spark.implicits._
    val tiny = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val centers = KMeansPar.init(spark, tiny, "vec_id", "embedding", k = 8)
    assert(centers.nonEmpty && centers.length <= 8)
  }
}
