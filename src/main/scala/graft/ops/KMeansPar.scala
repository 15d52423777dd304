package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Distributed k-means|| initialization (Bahmani et al., "Scalable
  * k-means++", VLDB 2012) — the 100 TB replacement for "collect a sample
  * and seed locally": every O(table) step is a distributed pass, and the
  * only driver-side state is the candidate set, whose size is bounded by
  * construction (expected ≤ oversample·k per round, hard-capped below).
  *
  * Determinism: the paper's uniform draws are replaced by per-id xxh64
  * hashes (u01(h(id, seed+round)) < ℓ·d²/φ), so the same table + seed
  * always yields the same centers — required for the driver's
  * hash-compare oracle and for resumable pipelines.
  *
  * Passes per round: one aggregate for φ = Σ d²(x, C), one filter for the
  * sampling (both full scans, no shuffle beyond the scalar aggregates);
  * then one assignment pass for candidate weights, and a local weighted
  * Lloyd over the ≤ few-hundred candidates.
  */
object KMeansPar {

  private def u01(h: Long): Double = {
    // top 53 bits → [0, 1) exactly as a double mantissa
    (h >>> 11).toDouble / (1L << 53).toDouble
  }

  private def idHash(id: Long, seed: Long): Long =
    graft.core.UrlNorm.xxh64(
      java.nio.ByteBuffer.allocate(8).putLong(id).array(), seed)

  private def sqDist(v: Array[Float], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
    d
  }

  private def minSqDist(v: Array[Float], cs: Array[Array[Double]]): Double = {
    var best = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val d = sqDist(v, cs(c))
      if (d < best) best = d
      c += 1
    }
    best
  }

  private def nearestIdx(v: Array[Float], cs: Array[Array[Double]]): Int = {
    var best = Double.MaxValue
    var bi = 0
    var c = 0
    while (c < cs.length) {
      val d = sqDist(v, cs(c))
      if (d < best) { best = d; bi = c }
      c += 1
    }
    bi
  }

  /** k centers over `emb(idCol: long, vecCol: array<float>)`. `rounds`
    * sampling rounds with `oversample`·k expected candidates each
    * (paper default ℓ = 2k, r ≈ 5; r = 3 suffices at the cell counts an
    * IVF coarse quantizer uses). */
  def init(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int = 3, oversample: Int = 2, seed: Long = 42L)
      : Array[Array[Double]] = {
    import spark.implicits._
    val pts = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v.toArray) }
      // reused rounds+2 times — recomputing the scan per pass would make
      // the init O(rounds · scan); one cache, released on exit
      .persist()
    try {
      val sc = spark.sparkContext
      // first center: the row with the smallest id-hash — a deterministic
      // uniform draw, found with a shuffle-free reduce
      var centers = scala.collection.mutable.ArrayBuffer(
        pts.map { case (id, v) => (idHash(id, seed), v) }
          .reduce((a, b) => if (a._1 <= b._1) a else b)._2.map(_.toDouble))
      val ell = oversample.toDouble * k
      // a pathological distribution (φ concentrated on few points, whose
      // min(1, ·) probabilities saturate) can overshoot the expected ℓ —
      // hard-cap by hash order so driver memory stays bounded regardless
      val capPerRound = math.max(16, 8 * oversample * k)
      (0 until rounds).foreach { r =>
        val bc = sc.broadcast(centers.toArray)
        val phi = pts.map { case (_, v) => minSqDist(v, bc.value) }
          .reduce(_ + _)
        if (phi > 0) {
          val sampled = pts.filter { case (id, v) =>
            u01(idHash(id, seed + 1 + r)) < ell * minSqDist(v, bc.value) / phi
          }.map { case (id, v) => (idHash(id, seed + 101 + r), v) }
            // takeOrdered, not collect-then-take: the executors keep only
            // capPerRound rows each and the driver merges capped heaps, so
            // the cap bounds DRIVER MEMORY structurally, not just the list
            .rdd.takeOrdered(capPerRound)(Ordering.by(_._1))
          centers ++= sampled.map(_._2.map(_.toDouble))
        }
        bc.destroy()
      }
      // candidate weights: one distributed assignment pass; the rollup is
      // O(candidates), tiny
      val bcAll = sc.broadcast(centers.toArray)
      val weights = new Array[Long](centers.length)
      pts.map { case (_, v) => nearestIdx(v, bcAll.value) }
        .groupBy(col("value")).count().collect()
        .foreach(row => weights(row.getInt(0)) = row.getLong(1))
      bcAll.destroy()
      lloydWeighted(centers.toArray, weights, k)
    } finally { pts.unpersist(); () }
  }

  /** Local weighted Lloyd over the candidate set (driver-side,
    * O(candidates · k · dims · iters) — bounded by the caps above).
    * Init = the k heaviest candidates (deterministic). */
  private[ops] def lloydWeighted(cand: Array[Array[Double]],
      weights: Array[Long], k: Int, iters: Int = 5): Array[Array[Double]] = {
    require(cand.nonEmpty, "k-means|| produced no candidates")
    val dims = cand(0).length
    val order = cand.indices.sortBy(i => (-weights(i), i))
    var centers = order.take(k).map(i => cand(i).clone()).toArray
    if (centers.length < k) return centers // degenerate tiny input
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k, dims)(0.0)
      val counts = new Array[Double](k)
      cand.indices.foreach { i =>
        val w = weights(i).toDouble
        if (w > 0) {
          var best = Double.MaxValue; var bi = 0
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < dims) { val t = cand(i)(j) - centers(c)(j); d += t * t; j += 1 }
            if (d < best) { best = d; bi = c }
            c += 1
          }
          var j = 0
          while (j < dims) { sums(bi)(j) += w * cand(i)(j); j += 1 }
          counts(bi) += w
        }
      }
      centers = Array.tabulate(k, dims) { (c, j) =>
        if (counts(c) > 0) sums(c)(j) / counts(c) else centers(c)(j)
      }
    }
    centers
  }
}
