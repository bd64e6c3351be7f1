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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q107_tar_roundtrip", q107TarRoundtrip, Some(q107Sql)))
}
