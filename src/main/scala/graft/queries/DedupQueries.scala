package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication query pack over the `documents` table — the training-data
  * pipeline operators a 100 TB corpus needs. The reference computes Jaccard
  * text similarity over word sets (src/server.ts:24-39) pairwise; at corpus
  * scale that becomes MinHash+LSH / SimHash banding so the all-pairs
  * comparison never materializes.
  *
  * Scale notes (100 TB):
  *  - MinHash signatures are computed per-row (narrow, no shuffle); only
  *    the (band_hash → doc_id) explode shuffles, and it's k·rows small.
  *  - Candidate verification joins only within identical band buckets —
  *    skewed mega-buckets are bounded because band hashes are 64-bit.
  *  - SimHash is a per-row 64-bit fingerprint; hamming-≤k search joins on
  *    16-bit chunks (pigeonhole), never all-pairs.
  */
object DedupQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Word w-shingles as strings ("w1 w2 ... ww"). */
  def shingles(toks: Column, w: Int): Column = {
    val n = size(toks)
    when(n < w, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  /** k MinHash values: min over shingles of murmur3(shingle, seed=i). */
  def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => hash(s, i))))

  val MinhashK = 64
  val Bands = 16 // 16 bands × 4 rows

  val specs: Seq[QuerySpec] = Seq(
    // --- MinHash + LSH near-dup pairs (no SQL oracle: verified by the
    //     exact-Jaccard cross-check inside the query itself + ScalaTest) ---
    QuerySpec(
      "q20_minhash_lsh",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("sh", shingles(col("toks"), 3))
        val sig = d.withColumn("sig", minhashSig(col("sh"), MinhashK))
        val r = MinhashK / Bands
        // explode into (band_id, band_hash, doc_id)
        val bands = sig.select(
          col("doc_id"), col("toks"),
          posexplode(transform(sequence(lit(0), lit(Bands - 1)),
            b => hash(slice(col("sig"), b * r + 1, lit(r)), b))))
          .withColumnRenamed("pos", "band_id")
          .withColumnRenamed("col", "band_hash")
        val a = bands.select(col("band_id"), col("band_hash"),
          col("doc_id").as("doc_a"), col("toks").as("toks_a"))
        val b = bands.select(col("band_id"), col("band_hash"),
          col("doc_id").as("doc_b"), col("toks").as("toks_b"))
        val cand = a.join(b, Seq("band_id", "band_hash"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("toks_a"), col("toks_b"))
          .dropDuplicates("doc_a", "doc_b")
        // exact Jaccard confirmation over word sets (src/server.ts:24-39)
        val sa = array_distinct(col("toks_a"))
        val sb = array_distinct(col("toks_b"))
        cand
          .withColumn("inter", size(array_intersect(sa, sb)))
          .withColumn("union_", size(sa) + size(sb) - col("inter"))
          .filter(col("inter") * 10 >= col("union_") * 8) // jaccard >= 0.8
          .select(col("doc_a"), col("doc_b"), col("inter"), col("union_"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None),

    // --- SimHash fingerprints + hamming-≤3 near-dup pairs -----------------
    QuerySpec(
      "q21_simhash",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        // 64-bit simhash from per-token xxhash64: bit j of the fingerprint is
        // the sign of sum over tokens of (bit j ? +1 : -1). Expressed as
        // column algebra so it stays codegen'd and narrow (no shuffle).
        val th = transform(col("toks"), w => xxhash64(w))
        val fp = (0 until 64).map { j =>
          val votes = aggregate(th, lit(0),
            (acc, h) => acc + shiftright(h, j).bitwiseAND(1).cast("int") * 2 - 1)
          when(votes > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce((x: Column, y: Column) => x.bitwiseOR(y))
        val f = d.withColumn("fp", fp).select(col("doc_id"), col("fp"))
        // pigeonhole: hamming<=3 over 4 chunks of 16 bits ⇒ at least one
        // chunk identical; join per chunk, verify exact hamming.
        val chunks = f.select(col("doc_id"), col("fp"),
          posexplode(array((0 until 4).map(c =>
            shiftrightunsigned(col("fp"), c * 16).bitwiseAND(0xFFFFL)): _*)))
          .withColumnRenamed("pos", "chunk_id")
          .withColumnRenamed("col", "chunk")
        val a = chunks.select(col("chunk_id"), col("chunk"),
          col("doc_id").as("doc_a"), col("fp").as("fp_a"))
        val b = chunks.select(col("chunk_id"), col("chunk"),
          col("doc_id").as("doc_b"), col("fp").as("fp_b"))
        a.join(b, Seq("chunk_id", "chunk"))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
          .filter(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .dropDuplicates("doc_a", "doc_b")
          .orderBy(col("doc_a"), col("doc_b"))
      },
      None),

    // --- exact n-gram Jaccard on a deterministic subset (SQL oracle) ------
    QuerySpec(
      "q22_ngram_jaccard",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"),
            array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
        val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("union_",
            size(col("sh_a")) + size(col("sh_b")) - col("inter"))
          .filter(col("inter") > 0)
          .select(col("doc_a"), col("doc_b"), col("inter"), col("union_"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH sub AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(
             |           generate_series(1, len(toks) - 2),
             |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
             |        FROM documents WHERE doc_id % 50 = 0))
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       len(list_intersect(a.sh, b.sh)) AS inter,
             |       len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS union_
             |FROM sub a, sub b
             |WHERE a.doc_id < b.doc_id
             |  AND len(list_intersect(a.sh, b.sh)) > 0
             |ORDER BY doc_a, doc_b""".stripMargin))
  )
}
