package graft.multimodal

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — opaque binary payloads + typed metadata,
  * decoded/feature-extracted per partition (north-star extension).
  *
  * The image/audio codec libraries are not available in this environment, so
  * `decodeStub` is a clearly-marked deterministic fake: it derives "decoded"
  * dimensions from the payload bytes. Everything around it is the real
  * Spark plumbing a production decoder would use:
  *  - payloads travel as `BinaryType` columns (columnar, dictionary-free);
  *  - decode runs via typed `mapPartitions`, so a real codec would be
  *    initialized once per partition (per JVM task), not per row — the
  *    Scala analog of `mapInPandas` batch iteration;
  *  - output schema is a flat typed struct, joinable/filterable downstream.
  *
  * Scale posture: decode is map-only (no shuffle); partition sizing is
  * controlled by the upstream source's `maxPartitionBytes`, which bounds
  * per-task decoder memory.
  */
object Multimodal extends QueryModule {

  /** One media payload row. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features; in production this would carry real decoded
    * dimensions / frame counts / feature vectors. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, n_frames: Int)

  /** STUB — stands in for a real image/video decoder (libjpeg/ffmpeg et al.
    * are not present in this container). Deterministic arithmetic on the
    * payload length so results are reproducible and oracle-checkable; a
    * real implementation would replace only this function body. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 640, (n * 7) % 480, n % 30 + 1)
  }

  /** Partition-wise feature extraction. The iterator-in/iterator-out shape
    * is what lets a real decoder amortize per-partition setup. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real decoder init would happen here, once per partition)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, w, h, f)
      }
    }
  }

  /** documents.text encoded as a fake binary payload (the driver testdata
    * has no true media column; utf-8 bytes stand in for image bytes). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  val qs: Seq[Q] = Seq(
    // Binary column + mapPartitions feature extraction; the oracle
    // reproduces the stub's arithmetic from octet_length, plus an md5 over
    // the payload to pin the bytes themselves.
    Q("q35_multimodal_features",
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
             |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
             |  CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames,
             |  md5(text) AS payload_md5
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val feats = extractFeatures(mediaTable(s, d)).toDF()
        val payloads = Tables.table(s, d, "documents")
          .select(col("doc_id"), md5(col("text").cast("binary")).as("payload_md5"))
        feats.join(payloads, Seq("doc_id"))
          .select("doc_id", "n_bytes", "width", "height", "n_frames", "payload_md5")
          .orderBy("doc_id")
      }),

    // Resize planning: aspect-preserving fit of the stub-decoded (width,
    // height) into a 224×224 target box — integer arithmetic identical in
    // both engines (floor division by the larger relative dimension).
    // A real resize would consume these plans inside the partition-wise
    // decode; the planning math and schema are the production shape.
    Q("q35c_resize_plan",
      Some("""WITH dims AS (
             |  SELECT doc_id,
             |    CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS w,
             |    CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS h
             |  FROM documents)
             |SELECT doc_id, w, h,
             |  CAST(CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS INT) AS out_w,
             |  CAST(CASE WHEN h >= w THEN 224 ELSE (h * 224) // w END AS INT) AS out_h,
             |  CAST(CASE WHEN w >= h THEN (h * 224) // w ELSE (w * 224) // h END AS INT) AS short_side
             |FROM dims ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val base = Tables.table(s, d, "documents")
          .withColumn("w", length(col("text").cast("binary")) % 640 + 1)
          .withColumn("h", (length(col("text").cast("binary")) * 7) % 480 + 1)
        base.select(col("doc_id"), col("w"), col("h"),
          when(col("w") >= col("h"), 224)
            .otherwise(expr("(w * 224) div h")).cast("int").as("out_w"),
          when(col("h") >= col("w"), 224)
            .otherwise(expr("(h * 224) div w")).cast("int").as("out_h"),
          when(col("w") >= col("h"), expr("(h * 224) div w"))
            .otherwise(expr("(w * 224) div h")).cast("int").as("short_side"))
          .orderBy("doc_id")
      }),

    // Frame sampling over the "video" payloads: one row per sampled frame
    // (every 3rd frame), with a deterministic byte offset per frame —
    // the explode-then-process layout a real frame extractor would feed.
    Q("q35b_frame_sample",
      Some("""WITH frames AS (
             |  SELECT doc_id,
             |    octet_length(encode(text)) AS nb,
             |    octet_length(encode(text)) % 30 + 1 AS nf,
             |    unnest(generate_series(0, octet_length(encode(text)) % 30)) AS f
             |  FROM documents)
             |SELECT doc_id, CAST(f AS INT) AS frame_id,
             |  CAST(f * (nb // nf) AS BIGINT) AS byte_offset
             |FROM frames WHERE f % 3 = 0
             |ORDER BY doc_id, frame_id""".stripMargin),
      (s, d) => {
        Tables.table(s, d, "documents")
          .withColumn("n_bytes", length(col("text").cast("binary")))
          .withColumn("n_frames", col("n_bytes") % 30 + 1)
          .withColumn("frame_id", explode(expr("sequence(0, n_frames - 1)")))
          .filter(col("frame_id") % 3 === 0)
          .select(col("doc_id"), col("frame_id").cast("int").as("frame_id"),
            (col("frame_id").cast("long")
              * expr("n_bytes div n_frames")).as("byte_offset"))
          .orderBy("doc_id", "frame_id")
      })
  )
}
