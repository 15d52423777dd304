package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.streaming.Streams

/** Structured Streaming + multimodal + remaining text-op queries. */
object StreamQueries {

  /** Streaming file source needs a directory; stage the single parquet
    * file into a temp dir (per-run unique memory-sink names keep reruns
    * from colliding). */
  private def stage(sfDir: String, table: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"stream-$table")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/$table.parquet"),
      dir.resolve(s"$table.parquet"))
    dir.toString
  }

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Literal-mode search_content scan over one document's lines with the
    * reference's global-RegExp lastIndex carry-over (server.ts:1890-1911):
    * the same `new RegExp(escaped, 'gi')` object is exec'd against every
    * line; a match advances lastIndex to match-end and `break`s WITHOUT
    * resetting it, so the next line's exec starts at that offset; a
    * failing exec (no occurrence at >= lastIndex, or lastIndex beyond the
    * line's end) resets lastIndex to 0 — and that line emits nothing.
    * Returns (1-based line_no, 0-based pos, matched text as in the line).
    * `termLower` must be lowercase; ASCII 'i'-flag matching ≡ comparing
    * lowercased forms. */
  private[queries] def literalScanCarry(lines: Array[String],
      termLower: String): Seq[(Int, Int, String)] = {
    val L = termLower.length
    val out = Seq.newBuilder[(Int, Int, String)]
    var lastIndex = 0
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      val idx =
        if (lastIndex > line.length) -1
        // Locale.ROOT: default-locale lowercasing is not the documented
        // ASCII case fold (Turkish 'I' → dotless 'ı' would miss 'i' terms)
        else line.toLowerCase(java.util.Locale.ROOT).indexOf(termLower, lastIndex)
      if (idx >= 0) {
        out += ((li + 1, idx, line.substring(idx, idx + L)))
        lastIndex = idx + L // successful exec advances; break skips reset
      } else lastIndex = 0 // failed exec resets the shared pattern
      li += 1
    }
    out.result()
  }

  val specs: Seq[QuerySpec] = Seq(
    // windowed event-time aggregation with watermark (monitor_uptime's
    // hourly stats, server.ts:6058-6075, as a continuous query). STRONG
    // oracle: the streaming complete-mode result over the static parquet
    // must equal DuckDB's batch GROUP BY over epoch-aligned 6 h buckets.
    QuerySpec("q61_stream_windows", (s, dir) => {
      val q = s"win${counter.incrementAndGet()}"
      Streams.windowedStats(s, stage(dir, "events"), q)
    }, Some("""SELECT strftime(to_timestamp(floor(epoch(ts) / 21600) * 21600),
              |                '%Y-%m-%d %H:%M:%S') AS win_start,
              |       event_type, count(*) AS n,
              |       CAST(round(min(value) * 100) AS BIGINT) AS min_cents,
              |       CAST(round(max(value) * 100) AS BIGINT) AS max_cents
              |FROM events
              |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // stateful sessionization via flatMapGroupsWithState. STRONG oracle:
    // DuckDB rebuilds the same gap-based sessions with the classic
    // lag+cumulative-sum islands pattern; the engine emits only CLOSED
    // sessions (the last session per user stays in state), so the oracle
    // drops each user's final island. All output columns are time-zone
    // invariant (counts and differences of epoch millis).
    QuerySpec("q62_stream_sessions", (s, dir) => {
      val q = s"sess${counter.incrementAndGet()}"
      Streams.sessionize(s, stage(dir, "events"), q)
    }, Some("""WITH e AS (
              |  SELECT user_id, event_id, epoch_ms(ts) AS t FROM events),
              |marked AS (
              |  SELECT user_id, t,
              |         CASE WHEN t - lag(t) OVER w > 1800000
              |              OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS brk
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
              |sess AS (
              |  SELECT user_id, t,
              |         sum(brk) OVER (PARTITION BY user_id ORDER BY t
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |  FROM marked),
              |agg AS (
              |  SELECT user_id, sid, min(t) AS start_ms, max(t) AS end_ms,
              |         count(*) AS n_events
              |  FROM sess GROUP BY 1, 2),
              |closed AS (
              |  SELECT * FROM agg a
              |  WHERE sid < (SELECT max(sid) FROM agg b WHERE b.user_id = a.user_id))
              |SELECT user_id, count(*) AS n_sessions,
              |       CAST(sum(n_events) AS BIGINT) AS events_in_closed_sessions,
              |       max(end_ms - start_ms) AS longest_ms
              |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // streaming exact dedup: stateful dropDuplicates over the document
    // stream (keep-first ingest dedup). STRONG oracle: the emitted distinct
    // hash set must equal DuckDB's batch SELECT DISTINCT md5(text),
    // independent of file/batch arrival order.
    QuerySpec("q87_stream_dedup", (s, dir) => {
      val q = s"dedup${counter.incrementAndGet()}"
      Streams.streamDedup(s, stage(dir, "documents"), q)
    }, Some("""SELECT DISTINCT md5(text) AS content_hash
              |FROM documents ORDER BY content_hash""".stripMargin)),

    // watermark-BOUNDED streaming dedup (dropDuplicatesWithinWatermark) —
    // the 100 TB form: state is O(hashes within the delay window). The
    // hash-derived ingest time makes the output equal the batch DISTINCT
    // exactly; StreamsSpec separately proves state eviction across batches.
    QuerySpec("q91_stream_dedup_bounded", (s, dir) => {
      val q = s"dedupb${counter.incrementAndGet()}"
      Streams.streamDedupBounded(s, stage(dir, "documents"), q)
    }, Some("""SELECT DISTINCT md5(text) AS content_hash
              |FROM documents ORDER BY content_hash""".stripMargin)),

    // multimodal: binary media column → batched REAL decode (JDK ImageIO
    // for png/jpeg/bmp/gif, javax.sound for wav) + features; per-format
    // rollup recomputed by the oracle from the materialized per-row decode
    // output (incl. an xor fold of the decoded-content pixel hashes)
    QuerySpec("q63_multimodal", (s, _) => {
      val media = Multimodal.mediaTable(s, 2000)
      val kernel = Multimodal.decodeAndFeaturize(s, media)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("size_bytes"), col("n_frames"),
          col("pixel_hash"), col("n_sampled_frames"),
          round(element_at(col("channel_means"), 1) * 100).cast("long").as("mean_c0_x100"))
      OracleMat(s, "q63")(kernel)
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          sum(col("size_bytes")).cast("long").as("total_bytes"),
          sum(col("n_frames")).cast("long").as("total_frames"),
          // r7: the generator emits multi-frame GIFs — the gif row must
          // carry n_animated > 0 (real reader-side frame counts, not 1s)
          sum(when(col("n_frames") > 1, 1).otherwise(0)).cast("long").as("n_animated"),
          sum(col("n_sampled_frames")).cast("long").as("total_sampled"),
          sum(col("mean_c0_x100")).cast("long").as("sum_mean_c0_x100"),
          expr("bit_xor(pixel_hash)").as("xor_pixel_hash"),
          max(col("width") * col("height")).as("max_pixels"))
        .orderBy(col("format"))
    }, Some(s"""SELECT format, count(*) AS n,
               |       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
               |       CAST(sum(n_frames) AS BIGINT) AS total_frames,
               |       CAST(sum(CASE WHEN n_frames > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_animated,
               |       CAST(sum(n_sampled_frames) AS BIGINT) AS total_sampled,
               |       CAST(sum(mean_c0_x100) AS BIGINT) AS sum_mean_c0_x100,
               |       bit_xor(pixel_hash) AS xor_pixel_hash,
               |       max(width * height) AS max_pixels
               |FROM ${OracleMat.src("q63")}
               |GROUP BY format ORDER BY format""".stripMargin)),

    // SIMPLIFIED SMOKE VARIANT of search_content — first literal match
    // per DOCUMENT, a deliberately reduced shape kept as a fast fully-
    // declarative cross-engine probe. The reference-true form (per-line
    // scan, regex + literal modes, positions, cap, and the literal-mode
    // lastIndex carry-over) is q89; this one intentionally implements a
    // semantics the reference does not have.
    QuerySpec("q19_search_smoke", (s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val term = "spark"
      d.withColumn("pos", locate(term, col("text")))
        .filter(col("pos") > 0)
        .select(col("doc_id"),
          col("pos"),
          substring_index( // context window: 50 chars either side
            expr(s"substring(text, greatest(1, pos - 50), ${50 * 2} + length('$term'))"),
            "\n", 1).as("context"))
        .orderBy(col("doc_id"))
    }, Some("""SELECT doc_id, pos,
              |       CASE WHEN strpos(context0, chr(10)) > 0
              |            THEN substr(context0, 1, strpos(context0, chr(10)) - 1)
              |            ELSE context0 END AS context
              |FROM (
              |  SELECT doc_id, strpos(text, 'spark') AS pos,
              |         substr(text, greatest(1, strpos(text, 'spark') - 50),
              |                100 + length('spark')) AS context0
              |  FROM documents WHERE strpos(text, 'spark') > 0)
              |ORDER BY doc_id""".stripMargin)),

    // search_content, FULL reference semantics (server.ts:1852-1936):
    // per-LINE scan, literal AND regex modes, the case-sensitivity flag,
    // first-match-per-line for literals vs ALL matches per line for
    // regexes (the exec loop), 0-based JS match positions, the ±50-char
    // context window, and the maxResults=10 cap applied in scan order
    // (line, then position) across the whole document — INCLUDING the
    // reference's global-RegExp lastIndex carry-over: one 'g' pattern is
    // reused across lines, and in literal mode the `break` after a match
    // (:1910) leaves lastIndex at match-end, so the NEXT line's scan
    // starts at that offset (a miss resets it to 0; a failing exec in
    // regex mode also resets, so regex lines always scan from 0). The
    // corpus is single-line, so both engines first derive the same line
    // structure (a newline after every 8 tokens). FULL cross-engine
    // oracle: DuckDB recomputes every column from raw text — the literal
    // carry recurrence is rebuilt with a recursive CTE stepping line-by-
    // line, and regex-match positions from the split-segments/matches
    // interleaving, the same decomposition Spark uses.
    QuerySpec("q89_search_content_full", (s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val term = "SPARK" // literal mode: caseSensitive=false (the default)
      val rxPat = "s\\w+" // regex mode: caseSensitive=true, all matches
      val lines = d
        .select(col("doc_id"),
          regexp_replace(col("text"), "((?:\\S+ ){7}\\S+) ", "$1\n").as("wt"))
        .select(col("doc_id"),
          posexplode(split(col("wt"), "\n", -1)).as(Seq("p", "line")))
        .select(col("doc_id"), (col("p") + 1).as("line_no"), col("line"))
      // literal: first match per line (the !useRegex break, :1910) WITH
      // the carried lastIndex — a sequential per-document recurrence, so
      // it runs as a per-row scalar kernel (embarrassingly parallel
      // across documents; the narrow 100 TB shape)
      import s.implicits._
      val litRows = d
        .select(col("doc_id"),
          regexp_replace(col("text"), "((?:\\S+ ){7}\\S+) ", "$1\n").as("wt"))
        .as[(Long, String)]
        .flatMap { case (id, wt) =>
          val ls = wt.split("\n", -1)
          literalScanCarry(ls, term.toLowerCase(java.util.Locale.ROOT)).map { case (ln, p0, m) =>
            (id, "literal", ln, p0, m, ls(ln - 1))
          }
        }
        .toDF("doc_id", "mode", "line_no", "pos0", "match_text", "line")
      // regex: every match per line; position k = len(segs[0..k]) +
      // len(matches[0..k-1]) from the non-overlapping interleaving
      val rxRows = lines
        .select(col("doc_id"), col("line_no"), col("line"),
          regexp_extract_all(col("line"), lit(rxPat), lit(0)).as("ms"),
          split(col("line"), rxPat, -1).as("segs"))
        .select(col("doc_id"), col("line_no"), col("line"), col("segs"), col("ms"),
          posexplode(col("ms")).as(Seq("k0", "match_text")))
        .withColumn("pos0",
          aggregate(slice(col("segs"), lit(1), col("k0") + 1), lit(0),
            (a, x) => a + length(x)) +
          aggregate(slice(col("ms"), lit(1), col("k0")), lit(0),
            (a, x) => a + length(x)))
        .select(col("doc_id"), lit("regex").as("mode"), col("line_no"),
          col("pos0"), col("match_text"), col("line"))
      val both = litRows.unionByName(rxRows)
        .withColumn("cs", greatest(lit(0), col("pos0") - 50))
        .withColumn("ce", least(length(col("line")),
          col("pos0") + length(col("match_text")) + 50))
        .withColumn("context",
          expr("substr(line, cs + 1, ce - cs)"))
      val wScan = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"), col("mode"))
        .orderBy(col("line_no"), col("pos0"))
      val wCount = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"), col("mode"))
      both.withColumn("rn", row_number().over(wScan))
        .filter(col("rn") <= 10) // maxResults default (:1857)
        .withColumn("n_results", count(lit(1)).over(wCount))
        .select(col("doc_id"), col("mode"), col("line_no"), col("pos0"),
          col("match_text"), col("context"), col("n_results"))
        .orderBy(col("doc_id"), col("mode"), col("line_no"), col("pos0"))
    }, Some("""WITH RECURSIVE lines0 AS (
              |  SELECT doc_id,
              |    regexp_split_to_array(
              |      regexp_replace(text, '((?:\S+ ){7}\S+) ', '\1' || chr(10), 'g'),
              |      chr(10)) AS ls
              |  FROM documents),
              |lines AS (
              |  SELECT doc_id, unnest(ls) AS line,
              |         unnest(generate_series(1, len(ls))) AS line_no
              |  FROM lines0),
              |scan AS (
              |  -- the literal-mode lastIndex recurrence, stepped line by
              |  -- line per document: hit at >= carry advances the carry
              |  -- to match-end; a miss resets it to 0 and emits nothing
              |  SELECT doc_id, CAST(0 AS BIGINT) AS line_no, 0 AS carry,
              |         CAST(NULL AS INTEGER) AS pos0, '' AS line
              |  FROM (SELECT DISTINCT doc_id FROM lines)
              |  UNION ALL
              |  SELECT l.doc_id, l.line_no,
              |    CASE WHEN strpos(substr(lower(l.line), s.carry + 1), 'spark') > 0
              |         THEN s.carry + strpos(substr(lower(l.line), s.carry + 1), 'spark') - 1 + 5
              |         ELSE 0 END AS carry,
              |    CASE WHEN strpos(substr(lower(l.line), s.carry + 1), 'spark') > 0
              |         THEN s.carry + strpos(substr(lower(l.line), s.carry + 1), 'spark') - 1
              |         ELSE NULL END AS pos0,
              |    l.line
              |  FROM scan s
              |  JOIN lines l ON l.doc_id = s.doc_id AND l.line_no = s.line_no + 1),
              |lit AS (
              |  SELECT doc_id, 'literal' AS mode, line_no, pos0,
              |         substr(line, pos0 + 1, 5) AS match_text, line
              |  FROM scan WHERE pos0 IS NOT NULL),
              |rxl AS (
              |  SELECT doc_id, line_no, line,
              |    regexp_extract_all(line, 's\w+') AS ms,
              |    regexp_split_to_array(line, 's\w+') AS segs
              |  FROM lines),
              |rxk AS (
              |  SELECT doc_id, line_no, line, ms, segs,
              |    unnest(ms) AS match_text,
              |    unnest(generate_series(1, len(ms))) AS k
              |  FROM rxl),
              |rx AS (
              |  SELECT doc_id, 'regex' AS mode, line_no,
              |    length(coalesce(array_to_string(segs[1:k], ''), '')) +
              |    length(coalesce(array_to_string(ms[1:k-1], ''), '')) AS pos0,
              |    match_text, line
              |  FROM rxk),
              |allm AS (
              |  SELECT * FROM lit UNION ALL SELECT * FROM rx),
              |ctx AS (
              |  SELECT doc_id, mode, line_no, pos0, match_text,
              |    substr(line, greatest(0, pos0 - 50) + 1,
              |      least(length(line), pos0 + length(match_text) + 50)
              |        - greatest(0, pos0 - 50)) AS context
              |  FROM allm),
              |capped AS (
              |  SELECT *, row_number() OVER (
              |      PARTITION BY doc_id, mode ORDER BY line_no, pos0) AS rn
              |  FROM ctx)
              |SELECT doc_id, mode, line_no, pos0, match_text, context,
              |  count(*) OVER (PARTITION BY doc_id, mode) AS n_results
              |FROM capped WHERE rn <= 10
              |ORDER BY doc_id, mode, line_no, pos0""".stripMargin)),

    // summarize_content (extract.ts:294-340) over documents; length/format
    // derivations recomputed by the oracle from the materialized output
    QuerySpec("q64_summarize", (s, dir) => {
      import s.implicits._
      val kernel = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.core.Extract.summarize(text, maxLength = 120),
            graft.core.Extract.summarize(text, maxLength = 120, bullets = true))
        }.toDF("doc_id", "summary", "bullets")
      OracleMat(s, "q64")(kernel)
        .withColumn("summary_len", length(col("summary")))
        .withColumn("is_bulleted", col("bullets").startsWith("• "))
        .orderBy("doc_id")
    }, Some(s"""SELECT doc_id, summary, bullets,
               |       length(summary) AS summary_len,
               |       starts_with(bullets, '• ') AS is_bulleted
               |FROM ${OracleMat.src("q64")} ORDER BY doc_id""".stripMargin))
  )
}
