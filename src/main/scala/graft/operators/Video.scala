package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.sources.{Avi, Jpeg}

/** Video as a training-data modality: MJPEG AVI payloads in binary
  * columns, frame-sampled and feature-extracted without ever shuffling the
  * payload bytes.
  *
  * Scale shape: every op is a per-partition kernel. [[sampleFrames]] reads
  * a video's `idx1` index FIRST (16 bytes per frame) and slices only the
  * sampled frames — for a stride-30 thumbnail pass over hour-long videos
  * that is ~3% of the `movi` bytes decoded and 0% reshuffled. At corpus
  * scale the payloads arrive through the member-parallel container readers
  * ([[graft.sources.TarIO.readShardsFanout]] for WebDataset shards), so one
  * huge video next to thousands of small ones still splits across tasks.
  */
object Video {

  final case class VideoRow(video_id: Long, payload: Array[Byte])

  /** `(video_id, frame_no, jpeg)` frame rows → one MJPEG AVI per video.
    * One shuffle on video_id (the frames must meet their container);
    * frames stay byte-identical — MJPEG is just framing around them.
    */
  def mjpegAssemble(frames: DataFrame, width: Int, height: Int,
      fps: Int = 25): Dataset[VideoRow] = {
    import frames.sparkSession.implicits._
    frames.select("video_id", "frame_no", "jpeg")
      .as[(Long, Int, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val fs = it.toSeq.sortBy(_._2).map(_._3)
        VideoRow(id, Avi.write(fs, width, height, fps))
      }
  }

  /** Every `stride`-th frame of each video: `(video_id, frame_no, jpeg)`.
    * Index-driven — unsampled frames' bytes are never copied or decoded. */
  def sampleFrames(videos: Dataset[VideoRow], stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos.flatMap { v =>
      if (v.payload == null || v.payload.isEmpty) Seq.empty
      else Avi.frameIndex(v.payload).zipWithIndex.collect {
        case ((off, len), no) if no % stride == 0 =>
          (v.video_id, no,
            java.util.Arrays.copyOfRange(v.payload, off.toInt, (off + len).toInt))
      }
    }.toDF("video_id", "frame_no", "jpeg")
  }

  /** Sampled frames → per-8×8-block exact reconstruction means (the
    * [[Multimodal.decodeJpegDcMeans]] dyadic-rational DC path, per frame):
    * `(video_id, frame_no, block_row, block_col, dc_mean)`. */
  def sampleDcMeans(videos: Dataset[VideoRow], stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos.flatMap { v =>
      if (v.payload == null || v.payload.isEmpty) Seq.empty
      else Avi.frameIndex(v.payload).zipWithIndex.collect {
        case ((off, len), no) if no % stride == 0 =>
          val img = Jpeg.decodeDc(java.util.Arrays.copyOfRange(
            v.payload, off.toInt, (off + len).toInt))
          for {
            br <- 0 until img.blocksH
            bc <- 0 until img.blocksW
          } yield (v.video_id, no, br, bc, img.dcMean(br, bc))
      }.flatten
    }.toDF("video_id", "frame_no", "block_row", "block_col", "dc_mean")
  }

  /** Per-sampled-frame perceptual dHash over the decoded block-DC grid —
    * the video twin of [[Multimodal.dHash]]: neighboring-mean gradient
    * signs over the `(blocksH × blocksW)` DC surface, packed to a long.
    * Near-duplicate frames (and hence near-duplicate clips, by hash-set
    * overlap) collide. */
  def frameDHash(videos: Dataset[VideoRow], stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos.flatMap { v =>
      if (v.payload == null || v.payload.isEmpty) Seq.empty
      else Avi.frameIndex(v.payload).zipWithIndex.collect {
        case ((off, len), no) if no % stride == 0 =>
          val img = Jpeg.decodeDc(java.util.Arrays.copyOfRange(
            v.payload, off.toInt, (off + len).toInt))
          // same bound as Multimodal.dHash: wrapping h |= on bit%64 would
          // saturate toward all-ones past 64 comparisons and destroy the
          // hash's discriminating power silently
          require(img.blocksH * (img.blocksW - 1) <= 64,
            s"frameDHash needs blocksH*(blocksW-1) <= 64 bits, " +
              s"got ${img.blocksH}x${img.blocksW} blocks — sample larger strides " +
              "or crop frames to at most 64 gradient comparisons")
          var h = 0L
          var bit = 0
          for (br <- 0 until img.blocksH; bc <- 0 until img.blocksW - 1) {
            if (img.dcMean(br, bc) < img.dcMean(br, bc + 1)) h |= (1L << bit)
            bit += 1
          }
          (v.video_id, no, h)
      }
    }.toDF("video_id", "frame_no", "dhash")
  }
}
