package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search query pack over the `embeddings` table
  * (vec_id: long, embedding: array<float>, label: int).
  *
  * Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
  * variant is the 100 TB scale path (random-hyperplane signatures computed
  * per-row, candidates joined within buckets only, exact rerank inside the
  * candidate set).
  */
object SimilarityQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** dot(a,b) folded left in index order — deterministic accumulation so
    * the DuckDB oracle (same order) produces bit-identical doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Single-pass cosine UDF — the hot-path form. Catalyst HOFs
    * (aggregate∘zip_with) are interpreted per element (~10-20x slower,
    * BASELINE.md); this walks each vector pair once in index order, so the
    * accumulation order still matches the DuckDB oracle's list_sum. */
  val cosineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Float], b: Seq[Float]) =>
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }

  /** Sign-bit signature from `planes` pseudo-random hyperplanes. Plane p's
    * component i is a deterministic hash-derived value in [-1,1); the sign
    * of the dot product is one signature bit. Single-pass UDF per row
    * (nested Catalyst HOFs are interpreted per element — the column-algebra
    * form was measured ~10x slower); zero shuffle. */
  private val MaxDims = 1024

  def rhpSignature(v: Column, planes: Int): Column = {
    // plane matrix precomputed once (hash-derived, deterministic) and
    // captured by the closure — per row only the dot products remain
    val planeMatrix: Array[Array[Double]] = Array.tabulate(planes, MaxDims) { (p, i) =>
      val h = graft.core.UrlNorm.xxh64(
        java.nio.ByteBuffer.allocate(8).putInt(i).putInt(p).array(), 0L)
      h.toDouble / Long.MaxValue.toDouble
    }
    val u = udf { (vec: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes) {
        val plane = planeMatrix(p)
        var proj = 0.0
        var i = 0
        val n = math.min(vec.length, MaxDims)
        while (i < n) { proj += vec(i) * plane(i); i += 1 }
        if (proj > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
    u(v)
  }

  val specs: Seq[QuerySpec] = Seq(
    // --- brute-force cosine top-k (exact ANN baseline; SQL oracle) --------
    QuerySpec(
      "q24_knn_brute",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        val scored = broadcast(q).crossJoin(c)
          .filter(col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", cosine(col("qv"), col("cv")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
             |           FROM embeddings WHERE vec_id < 5),
             |     scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |         list_sum(list_transform(generate_series(1, len(qv)),
             |                  i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             |         / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
             |                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
             |          * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
             |                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
             |         AS sim
             |  FROM q, embeddings e WHERE e.vec_id <> q.query_id)
             |SELECT query_id, rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |         row_number() OVER (PARTITION BY query_id
             |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
             |  FROM scored)
             |WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // --- LSH-bucketed ANN: the 100 TB scale path (no SQL oracle;
    //     recall vs q24 asserted in ScalaTest) -----------------------------
    QuerySpec(
      "q25_knn_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .withColumn("sig", rhpSignature(col("embedding"), 16))
        // band the 16-bit signature into 4 × 4-bit buckets; a pair collides
        // if any band matches — cheap candidate generation, then exact
        // cosine rerank within candidates only.
        val banded = e.select(col("vec_id"), col("embedding"), col("sig"),
          posexplode(array((0 until 4).map(bnd =>
            shiftrightunsigned(col("sig"), bnd * 4).bitwiseAND(0xFL)): _*)))
          .withColumnRenamed("pos", "band_id")
          .withColumnRenamed("col", "bucket")
        val q = banded.filter(col("vec_id") < 5)
          .select(col("band_id"), col("bucket"),
            col("vec_id").as("query_id"), col("embedding").as("qv"))
        val c = banded.select(col("band_id"), col("bucket"),
          col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        val cand = q.join(c, Seq("band_id", "bucket"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .dropDuplicates("query_id", "neighbor_id")
        val scored = OracleMat(s, "q25_scored")(
          cand.withColumn("sim", cosineUdf(col("qv"), col("cv")))
            .select(col("query_id"), col("neighbor_id"), col("sim")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      // oracle re-runs the top-k window over the materialized candidate
      // scores (identical doubles → identical ordering); signature recall
      // vs brute force is AnnRecallSpec's gate
      Some(s"""SELECT query_id, rank, neighbor_id FROM (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
              |  FROM ${OracleMat.src("q25_scored")})
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- IVF ANN: coarse quantization to hash-seeded centroids, probe the
    //     nearest nprobe cells, exact rerank within them — the classic
    //     inverted-file index as a Spark pipeline (centroids broadcast;
    //     only same-cell pairs join) -----------------------------------------
    QuerySpec(
      "q76_knn_ivf",
      (s, dir) => {
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val nCells = 16
        val nProbe = 6
        // centroid training: DISTRIBUTED k-means|| init (Bahmani et al.,
        // VLDB 2012 — [[graft.ops.KMeansPar]]): every O(table) step is a
        // distributed pass; driver state is only the candidate set,
        // bounded by construction. This is the 100 TB path directly — no
        // bounded-sample collect remains in the training.
        val centroids = graft.ops.KMeansPar.init(s, e, "vec_id", "embedding",
          k = nCells, rounds = 3, oversample = 2, seed = 42L)
        val bc = s.sparkContext.broadcast(centroids)
        // coarse quantization by MIN EUCLIDEAN distance — the same metric
        // the centroids were trained under (FAISS IVF-Flat shape: an L2
        // coarse quantizer, exact-cosine rerank within probed cells)
        def cellsOf(k: Int) = udf { (vec: Seq[Float]) =>
          val cs = bc.value
          val scored = cs.indices.map { c =>
            var d = 0.0
            var i = 0
            while (i < cs(c).length) {
              val t = vec(i) - cs(c)(i); d += t * t; i += 1
            }
            (c, d)
          }.sortBy(_._2).take(k).map(_._1)
          scored
        }
        // data side: each vector in its single best cell; query side probes
        // nProbe cells — exact cosine rerank only within probed cells
        val data = e.withColumn("cell",
          explode(cellsOf(1)(col("embedding"))))
          .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
        val queries = e.filter(col("vec_id") < 5)
          .withColumn("cell", explode(cellsOf(nProbe)(col("embedding"))))
          .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
        val cand = queries.join(data, Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .dropDuplicates("query_id", "neighbor_id")
        val scored = OracleMat(s, "q76_scored")(
          cand.withColumn("sim", cosineUdf(col("qv"), col("cv")))
            .select(col("query_id"), col("neighbor_id"), col("sim")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      // oracle re-runs the top-k window over the materialized probed-cell
      // candidate scores; IVF recall vs brute force is AnnRecallSpec's gate
      Some(s"""SELECT query_id, rank, neighbor_id FROM (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
              |  FROM ${OracleMat.src("q76_scored")})
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // --- per-label centroid stats (embedding clustering summary) ----------
    QuerySpec(
      "q26_label_stats",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        e.withColumn("n2", dot(col("embedding"), col("embedding")))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("n2")) * 1000).cast("long").as("avg_sqnorm_x1000"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, count(*) AS n,
             |       CAST(round(avg(n2) * 1000) AS BIGINT) AS avg_sqnorm_x1000
             |FROM (SELECT label,
             |        list_sum(list_transform(generate_series(1, len(embedding)),
             |          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS n2
             |      FROM embeddings)
             |GROUP BY label
             |ORDER BY label""".stripMargin))
  )
}
