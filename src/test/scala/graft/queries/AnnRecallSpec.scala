package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality gates: the scale-path indexes (RHP-LSH q25, IVF q76) must
  * recover a reasonable fraction of the exact top-5 (q24) — on this corpus
  * the vectors are weakly clustered (max pairwise cosine ~0.44), which is
  * the hard case for ANN, so the bars are conservative. */
class AnnRecallSpec extends AnyFunSuite {

  // tests run queries at sf0.001 — never clobber the Verify main's
  // /tmp/graft_kernel dump that the driver's DuckDB oracle reads
  System.setProperty("graft.kernel.root", "/tmp/graft_kernel_test")

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ann-recall")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF recall@5 vs brute force >= 0.4") {
    val brute = pairs("q24_knn_brute")
    val ivf = pairs("q76_knn_ivf")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall")
  }

  test("LSH ANN recall@5 vs brute force >= 0.2") {
    val brute = pairs("q24_knn_brute")
    val lsh = pairs("q25_knn_lsh")
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall $recall")
  }

  test("embedding near-dup recovers EVERY planted clone pair (recall = 1.0)") {
    // q23 plants one clone per vector at cosine ~1-1e-8; the 32-plane /
    // 4x8-bit-band LSH must find every (vec_id, vec_id+10^6) pair — miss
    // probability per pair is ~1e-14, and the pipeline is deterministic,
    // so anything short of total recall is a banding regression
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val found = graft.SparkEntry.queries("q23_embedding_dup")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until n).map(i => (i, i + 1000000L)).toSet
    assert(planted.subsetOf(found),
      s"missed ${(planted -- found).take(5)} of ${planted.size} planted pairs")
    // and nothing else crosses the 0.999 threshold on this corpus
    assert(found == planted, s"unexpected extra pairs: ${(found -- planted).take(5)}")
  }
}
