package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-container queries: the WebDataset tar-shard interchange the
  * large multimodal training stacks read, and the video-as-frames path.
  *
  * Reference scope note: the reference's only containers are netCDF
  * rasters (SURVEY §2.1); tar shards / video are part of this engine's
  * training-data extension surface, same tier as WARC (q82).
  */
object Multimedia {

  /** q107: WebDataset tar-shard round trip — the corpus leaves as real
    * ustar shards (one `.tar` per partition, TWO members per sample:
    * `{id}.txt` payload + `{id}.json` metadata, members of a sample
    * adjacent) and comes back through the MEMBER-PARALLEL reader: a
    * header-only index pass (512 B seek-read per member, no data touched)
    * fans exact `(path, offset, size)` rows across tasks, each reading
    * only its own ranges; samples regroup on the basename key. The oracle
    * is the documents table itself — any header, padding, checksum,
    * offset, or grouping defect loses or corrupts a member and breaks the
    * hash.
    */
  def q107TarRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.TarIO
    val dir = java.nio.file.Files.createTempDirectory("graft_wds").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val members = docs.select(col("doc_id").cast("string").as("key"),
        lit("txt").as("ext"), encode(col("text"), "UTF-8").as("bytes"))
      .unionAll(docs.select(col("doc_id").cast("string").as("key"),
        lit("json").as("ext"),
        encode(concat(lit("{\"lang\":\""), col("lang"),
          lit("\",\"source\":\""), col("source"), lit("\"}")), "UTF-8").as("bytes")))
    TarIO.writeShards(members, dir)
    val back = TarIO.samples(TarIO.readShardsFanout(spark, dir))
    back.select(col("key").cast("long").as("doc_id"),
        array_join(col("exts"), ",").as("exts"),
        decode(element_at(col("members"), "txt"), "UTF-8").as("text"),
        decode(element_at(col("members"), "json"), "UTF-8").as("meta"))
      .select(col("doc_id"), col("exts"),
        length(col("text")).cast("long").as("n_chars"), col("text"),
        get_json_object(col("meta"), "$.lang").as("lang"),
        get_json_object(col("meta"), "$.source").as("source"))
  }

  val q107Sql: String =
    """SELECT doc_id, 'json,txt' AS exts, CAST(length(text) AS BIGINT) AS n_chars,
      |  text, lang, source
      |FROM documents""".stripMargin

  /** q108: video frame sampling — each document becomes a real 4-frame
    * MJPEG AVI (16×16 gray frames, frame k = the text bytes cyclically
    * shifted by k, JPEG-encoded by the from-scratch T.81 codec;
    * `Video.mjpegAssemble` wraps them in RIFF/avih/strh/movi/idx1
    * framing), then the sampler takes every 2nd frame via the `idx1`
    * index ONLY — unsampled frames are never decoded — and reports each
    * sampled frame's per-8×8-block exact DC reconstruction means. The
    * oracle re-derives the q77 dyadic DC math per (frame, block) from the
    * text: container framing, index offsets, frame ordering after the
    * assemble shuffle, stride arithmetic, and the JPEG DC path all have to
    * be right for 16 block means per document to hash-match.
    */
  def q108VideoFrames(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Video
    // spread the single-split corpus before the per-frame encode kernel
    // (the q139/q123 convention — r20 probe: the 4·|docs| JPEG encodes ran
    // as ONE task without it; no-op on a many-split corpus)
    val docs = graft.core.Plans.ensureMinPartitions(
      Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      spark.sparkContext.defaultParallelism).as[(Long, String)]
    val frames = docs.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      (0 until 4).map { k =>
        val px = Array.tabulate(256)(i => b((i + k) % b.length))
        (id, k, graft.sources.Jpeg.encodeGray(16, 16, px))
      }
    }.toDF("video_id", "frame_no", "jpeg")
    Video.sampleDcMeans(Video.mjpegAssemble(frames, 16, 16), stride = 2)
      .select(col("video_id").as("doc_id"), col("frame_no"),
        col("block_row"), col("block_col"), col("dc_mean"))
  }

  val q108Sql: String =
    """WITH px AS (
      |  SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
      |    CAST((i - 1) // 16 AS INTEGER) AS r, CAST((i - 1) % 16 AS INTEGER) AS c,
      |    ascii(substr(text, CAST((i - 1 + f) % length(text) + 1 AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, 256)) AS i FROM documents) t,
      |       (SELECT unnest([0, 2]) AS f) fr
      |)
      |SELECT doc_id, frame_no, CAST(r // 8 AS INTEGER) AS block_row,
      |  CAST(c // 8 AS INTEGER) AS block_col,
      |  128.0 + 2.0 * FLOOR((SUM(v) - 8192) / 128.0 + 0.5) AS dc_mean
      |FROM px GROUP BY 1, 2, 3, 4""".stripMargin

  /** q109: audio rate normalization — documents' bytes as 16-bit LE PCM
    * (the q72 framing) are wrapped in REAL RIFF/WAVE containers
    * (sources.Wav), then linearly resampled 4000 Hz → 5333 Hz (ratio 4/3:
    * interpolation weights are exact quarters, so every output sample is
    * engine-exact) and audited per clip. The oracle replays the
    * interpolation relationally — sample indexing, fmt/data framing,
    * sign handling, edge clamping, and half-up rounding all have to agree
    * for the integer sums to hash-match.
    */
  def q109AudioResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.{Audio, Multimodal}
    val media = Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) >= 2)
      .select(col("doc_id").as("media_id"), lit("pcm").as("kind"),
        encode(col("text"), "UTF-8").as("payload"), lit(0).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Audio.resampleStats(Audio.wavEncode(media, sampleRate = 4000), num = 4, den = 3)
      .select(col("media_id").as("doc_id"), col("rate_in"), col("rate_out"),
        col("n_in"), col("n_out"), col("sum_out"), col("max_out"))
  }

  // ASCII docs: LE sample k (0-based) = ascii(char 2k+1) + 256·ascii(char 2k+2)
  val q109Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text, length(text) // 2 AS n FROM documents
      |  WHERE length(text) >= 2
      |),
      |s AS (
      |  SELECT doc_id, i - 1 AS k,
      |    ascii(substr(text, 2 * i - 1, 1)) + 256 * ascii(substr(text, 2 * i, 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i FROM t)
      |),
      |r AS (
      |  SELECT doc_id, (3 * j) // 4 AS i0, (3 * j) % 4 AS fr
      |  FROM (SELECT doc_id, unnest(generate_series(0, ((n - 1) * 4) // 3)) AS j FROM t)
      |),
      |o AS (
      |  SELECT r.doc_id,
      |    CAST(FLOOR(a.v + (COALESCE(b.v, a.v) - a.v) * fr / 4.0 + 0.5) AS BIGINT) AS vout
      |  FROM r
      |  JOIN s a ON a.doc_id = r.doc_id AND a.k = r.i0
      |  LEFT JOIN s b ON b.doc_id = r.doc_id AND b.k = r.i0 + 1
      |)
      |SELECT t.doc_id, CAST(4000 AS INTEGER) AS rate_in,
      |  CAST(16000 // 3 AS INTEGER) AS rate_out,
      |  CAST(t.n AS BIGINT) AS n_in, CAST(((t.n - 1) * 4) // 3 + 1 AS BIGINT) AS n_out,
      |  o2.sum_out, o2.max_out
      |FROM t JOIN (
      |  SELECT doc_id, CAST(SUM(vout) AS BIGINT) AS sum_out,
      |    CAST(MAX(vout) AS INTEGER) AS max_out
      |  FROM o GROUP BY doc_id
      |) o2 USING (doc_id)""".stripMargin

  /** q121: bilinear image resize 16×16 → 11×11 — the vision-model input
    * normalization pass (Multimodal.resizeBilinear): align-corners
    * mapping puts every source position at an exact half-integer
    * (step 15/10), so the interpolation is engine-exact. Images are the
    * q84-style cyclic text tiles; the oracle replays the axis arithmetic,
    * edge clamping, 4-neighbor blend, and half-up rounding per output
    * pixel.
    */
  def q121ImageResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), lit("gray").as("kind"),
        encode(substring(repeat(col("text"),
          (lit(256) / length(col("text"))).cast("int") + 1), 1, 256), "UTF-8").as("payload"),
        lit(16).as("width"), lit(0).as("height"))
      .as[Multimodal.MediaRow]
    Multimodal.resizeBilinear(media, width = 16, outW = 11, outH = 11)
      .select(col("media_id").as("doc_id"), col("r"), col("c"), col("v"))
  }

  val q121Sql: String =
    """WITH px AS (
      |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS idx,
      |    ascii(substr(text, CAST((i - 1) % length(text) + 1 AS BIGINT), 1)) AS v
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, 256)) AS i FROM documents) t
      |),
      |o AS (
      |  SELECT doc_id, r, c,
      |    CAST((r * 15) // 10 AS INTEGER) AS y0,
      |    LEAST(CAST((r * 15) // 10 AS INTEGER) + 1, 15) AS y1,
      |    ((r * 15) % 10) / 10.0 AS fy,
      |    CAST((c * 15) // 10 AS INTEGER) AS x0,
      |    LEAST(CAST((c * 15) // 10 AS INTEGER) + 1, 15) AS x1,
      |    ((c * 15) % 10) / 10.0 AS fx
      |  FROM (SELECT doc_id, unnest(generate_series(0, 10)) AS r FROM documents) a,
      |       (SELECT unnest(generate_series(0, 10)) AS c) b
      |)
      |SELECT o.doc_id, CAST(r AS INTEGER) AS r, CAST(c AS INTEGER) AS c,
      |  CAST(FLOOR(
      |    (1 - fy) * ((1 - fx) * p00.v + fx * p01.v) +
      |    fy * ((1 - fx) * p10.v + fx * p11.v) + 0.5) AS INTEGER) AS v
      |FROM o
      |JOIN px p00 ON p00.doc_id = o.doc_id AND p00.idx = y0 * 16 + x0
      |JOIN px p01 ON p01.doc_id = o.doc_id AND p01.idx = y0 * 16 + x1
      |JOIN px p10 ON p10.doc_id = o.doc_id AND p10.idx = y1 * 16 + x0
      |JOIN px p11 ON p11.doc_id = o.doc_id AND p11.idx = y1 * 16 + x1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q107_tar_roundtrip", q107TarRoundtrip, Some(q107Sql)),
    QueryDef("q108_video_frames", q108VideoFrames, Some(q108Sql)),
    QueryDef("q109_audio_resample", q109AudioResample, Some(q109Sql)),
    QueryDef("q121_image_resize", q121ImageResize, Some(q121Sql)),
    QueryDef("q122_wds_census", q122WdsCensus, Some(q122Sql)),
    QueryDef("q123_video_neardup", q123VideoNearDup, Some(q123Sql)),
    QueryDef("q139_scene_cuts", q139SceneCuts, Some(q139Sql)))

  /** q123: video near-duplicate detection — the clip-dedup pass a
    * multimodal corpus needs: every odd doc's 4-frame clip is rebuilt
    * from its even predecessor's text (the planted duplicate), all clips
    * go through the REAL pipeline (JPEG encode → MJPEG assemble →
    * idx1-driven frame walk → per-frame perceptual dHash over the decoded
    * DC surface), and clips sharing a (frame_no, dhash) cell pair up —
    * the planted (2k, 2k+1) pairs must surface with all 4 frames shared.
    * 64×16 frames give 14 dHash bits, so coincidental collisions are rare
    * and, being deterministic, reproduced exactly by the oracle's
    * relational replay of the dyadic DC math and the bit packing.
    */
  def q123VideoNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Video
    val docs = Tables.load(spark, sfDir, "documents")
      .select((col("doc_id") - col("doc_id") % 2).as("src_id"), col("doc_id"))
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("src_id"), col("text"))
    // spread the single-split corpus before the per-frame encode kernel
    // (same reasoning as q139 — no-op on a many-split corpus)
    val frames = graft.core.Plans.ensureMinPartitions(
      docs.join(texts, "src_id").select(col("doc_id"), col("text")),
      spark.sparkContext.defaultParallelism).as[(Long, String)]
      .flatMap { case (id, text) =>
        val b = text.getBytes("UTF-8")
        (0 until 4).map { k =>
          val px = Array.tabulate(1024)(i => b((i + k) % b.length))
          (id, k, graft.sources.Jpeg.encodeGray(64, 16, px))
        }
      }.toDF("video_id", "frame_no", "jpeg")
    // persist before the self-join: both join branches read the same
    // (video, frame, dhash) table — without it the whole JPEG encode →
    // MJPEG assemble → idx1 walk → decode chain executes TWICE (measured
    // 7.5 s → ~4 s at sf0.1). Hash-sized rows, so the cache is tiny.
    val dh = graft.core.CacheLife.scoped(
      Video.frameDHash(Video.mjpegAssemble(frames, 64, 16), stride = 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = dh.select(col("video_id").as("doc_id_a"), col("frame_no"), col("dhash"))
    val b = dh.select(col("video_id").as("doc_id_b"), col("frame_no"), col("dhash"))
    a.join(b, Seq("frame_no", "dhash"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .groupBy(col("doc_id_a"), col("doc_id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 4)
  }

  // relational replay: per (doc, frame, block) the q77 dyadic DC mean over
  // the SOURCE doc's text (odd docs read their even predecessor), dHash
  // bit r set when block (r, c) < block (r, c+1), packed little-endian in
  // scan order (bc-major per row, 7 comparisons per row × 2 rows)
  val q123Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, CAST(f AS INTEGER) AS frame_no,
      |    CAST((i - 1) // 64 AS INTEGER) AS r, CAST((i - 1) % 64 AS INTEGER) AS c,
      |    ascii(substr(s.text, CAST((i - 1 + f) % length(s.text) + 1 AS BIGINT), 1)) AS v
      |  FROM documents d
      |  JOIN documents s ON s.doc_id = d.doc_id - d.doc_id % 2
      |  CROSS JOIN (SELECT unnest(generate_series(1, 1024)) AS i) ii
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) ff
      |),
      |dc AS (
      |  SELECT doc_id, frame_no, CAST(r // 8 AS INTEGER) AS br,
      |    CAST(c // 8 AS INTEGER) AS bc,
      |    128.0 + 2.0 * FLOOR((SUM(v) - 8192) / 128.0 + 0.5) AS m
      |  FROM px GROUP BY 1, 2, 3, 4
      |),
      |bits AS (
      |  SELECT a.doc_id, a.frame_no,
      |    CAST(SUM(CASE WHEN a.m < b.m
      |      THEN CAST(1 AS BIGINT) << (a.br * 7 + a.bc) ELSE 0 END) AS BIGINT) AS dhash
      |  FROM dc a JOIN dc b
      |    ON b.doc_id = a.doc_id AND b.frame_no = a.frame_no
      |   AND b.br = a.br AND b.bc = a.bc + 1
      |  GROUP BY 1, 2
      |)
      |SELECT x.doc_id AS doc_id_a, y.doc_id AS doc_id_b,
      |  COUNT(1) AS n_shared
      |FROM bits x JOIN bits y
      |  ON y.frame_no = x.frame_no AND y.dhash = x.dhash AND x.doc_id < y.doc_id
      |GROUP BY 1, 2
      |HAVING COUNT(1) >= 4""".stripMargin

  /** q122: shard census through the `wds` DataSource V2 — the corpus goes
    * out as tar shards (q107's layout) and comes back through
    * `spark.read.format("wds")` with BOTH pushdowns live: `ext = 'txt'`
    * filters members at the index and the bytes-free projection keeps the
    * scan header-only (512 B per member read, zero payload bytes — the
    * petabyte-census shape). Sizes must reconcile with the documents
    * table exactly.
    */
  def q122WdsCensus(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.TarIO
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_census").toString
    val docs = Tables.load(spark, sfDir, "documents")
    val members = docs.select(col("doc_id").cast("string").as("key"),
        lit("txt").as("ext"), encode(col("text"), "UTF-8").as("bytes"))
      .unionAll(docs.select(col("doc_id").cast("string").as("key"),
        lit("json").as("ext"),
        encode(concat(lit("{\"lang\":\""), col("lang"), lit("\"}")), "UTF-8").as("bytes")))
    TarIO.writeShards(members, dir)
    spark.read.format("wds").load(dir)
      .filter(col("ext") === "txt")
      .select(col("key").cast("long").as("doc_id"), col("size").as("n_bytes"))
  }

  // documents are ASCII → UTF-8 byte length = char length
  val q122Sql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes FROM documents""".stripMargin

  /** q139: scene-cut detection + segmentation — the clip-splitting pass a
    * video training corpus runs before captioning/packing (split on
    * visual discontinuity, emit per-scene segments). Every doc becomes a
    * 6-frame MJPEG clip whose pixel content switches at a per-video cut
    * point (frames before `2 + doc_id % 3` render the doc's text at byte
    * offset 0, frames after at offset 1); each frame goes through the
    * REAL pipeline (JPEG encode → MJPEG assemble → idx1-driven frame walk
    * → perceptual dHash over the decoded DC surface, the q123 chain), a
    * consecutive-frame Hamming distance ≥ 4 marks a cut, and a running
    * cut-count over the per-video frame window labels scenes, aggregated
    * to (start, end, n_frames) segments. Scale shape: hashing is
    * map-side; the only shuffle is the per-video window + segment
    * aggregate over hash-sized rows — never pixels; at 100 TB the window
    * key (video_id) is the natural partitioner and frames-per-video is
    * bounded by the stride sampler.
    */
  def q139SceneCuts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Video
    // the corpus parquet is a single sub-MB split — without the spread the
    // 6·|docs| JPEG encodes below run on ONE core (no-op on a real
    // many-split corpus)
    val docs = graft.core.Plans.ensureMinPartitions(
      Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      spark.sparkContext.defaultParallelism).as[(Long, String)]
    val frames = docs.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val cut = (2 + id % 3).toInt
      (0 until 6).map { k =>
        val off = if (k < cut) 0 else 1
        val px = Array.tabulate(1024)(i => b((i + off) % b.length))
        (id, k, graft.sources.Jpeg.encodeGray(64, 16, px))
      }
    }.toDF("video_id", "frame_no", "jpeg")
    val dh = Video.frameDHash(Video.mjpegAssemble(frames, 64, 16), stride = 1)
    val wOrd = Window.partitionBy(col("video_id")).orderBy(col("frame_no"))
    val scenes = dh
      .withColumn("d",
        bit_count(col("dhash").bitwiseXOR(lag(col("dhash"), 1).over(wOrd))))
      .withColumn("is_cut", when(col("d") >= 4, 1L).otherwise(0L))
      .withColumn("scene_no", sum(col("is_cut")).over(wOrd))
    scenes.groupBy(col("video_id"), col("scene_no"))
      .agg(min(col("frame_no")).as("start_frame"),
        max(col("frame_no")).as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  // same relational dHash replay as q123 (dyadic DC mean, 7×2 bit pack),
  // with the per-frame byte offset switching at the planted cut point
  val q139Sql: String =
    """WITH px AS (
      |  SELECT d.doc_id, CAST(f AS INTEGER) AS frame_no,
      |    CAST((i - 1) // 64 AS INTEGER) AS r, CAST((i - 1) % 64 AS INTEGER) AS c,
      |    ascii(substr(d.text, CAST((i - 1 +
      |      CASE WHEN f < 2 + d.doc_id % 3 THEN 0 ELSE 1 END)
      |      % length(d.text) + 1 AS BIGINT), 1)) AS v
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(1, 1024)) AS i) ii
      |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS f) ff
      |),
      |dc AS (
      |  SELECT doc_id, frame_no, CAST(r // 8 AS INTEGER) AS br,
      |    CAST(c // 8 AS INTEGER) AS bc,
      |    128.0 + 2.0 * FLOOR((SUM(v) - 8192) / 128.0 + 0.5) AS m
      |  FROM px GROUP BY 1, 2, 3, 4
      |),
      |bits AS (
      |  SELECT a.doc_id, a.frame_no,
      |    CAST(SUM(CASE WHEN a.m < b.m
      |      THEN CAST(1 AS BIGINT) << (a.br * 7 + a.bc) ELSE 0 END) AS BIGINT) AS dhash
      |  FROM dc a JOIN dc b
      |    ON b.doc_id = a.doc_id AND b.frame_no = a.frame_no
      |   AND b.br = a.br AND b.bc = a.bc + 1
      |  GROUP BY 1, 2
      |),
      |ham AS (
      |  SELECT doc_id, frame_no,
      |    bit_count(xor(dhash,
      |      lag(dhash) OVER (PARTITION BY doc_id ORDER BY frame_no))) AS d
      |  FROM bits
      |),
      |scenes AS (
      |  SELECT doc_id, frame_no,
      |    SUM(CASE WHEN d >= 4 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY frame_no) AS scene_no
      |  FROM ham
      |)
      |SELECT doc_id AS video_id, CAST(scene_no AS BIGINT) AS scene_no,
      |  MIN(frame_no) AS start_frame, MAX(frame_no) AS end_frame,
      |  CAST(COUNT(1) AS BIGINT) AS n_frames
      |FROM scenes GROUP BY doc_id, scene_no""".stripMargin
}
