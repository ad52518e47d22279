package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed multimodal ingestion path: opaque binary payloads + metadata
  * flowing through a `mapPartitions` decode/feature-extract stage.
  *
  * The decode itself is a STUB — no image/audio codecs exist in this
  * container — but it is a *deterministic* stub derived from the payload
  * bytes, so the whole pipeline (schema, encoders, partition-local batch
  * loop, output shape) is real, tested, and DuckDB-oracled. A production
  * deployment swaps `decodeStub` for a codec call; nothing else changes.
  *
  * Partitioning note for 100 TB: payloads stay inside their input
  * partition through decode (mapPartitions is a narrow dependency — zero
  * shuffle); only the small fixed-width feature rows ever move.
  */
object Multimodal {

  /** One media record entering the pipeline. */
  case class MediaIn(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features leaving the decode stage. */
  case class MediaFeat(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB codec: real impl would hand `bytes` to an image/audio decoder.
    * Deterministic fake: dimensions from the first/last byte, so tests and
    * the DuckDB oracle can verify the plumbing end-to-end.
    */
  private def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val bn = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xff else 0
    (64 + b0 % 64, 64 + bn % 64)
  }

  /** Frame sampling stub: one "frame" per KiB of payload. */
  private def frameSample(nBytes: Long): Int = (nBytes / 1000 + 1).toInt

  /** The typed decode stage: one pass over each partition, batch-style. */
  def pipeline(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val (w, h) = decodeStub(m.payload)
        MediaFeat(
          doc_id = m.doc_id,
          kind = m.kind,
          n_bytes = m.payload.length.toLong,
          width = w,
          height = h,
          n_frames = frameSample(m.payload.length.toLong),
          checksum = m.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
      }
    }.toDF()
  }

  /** Query entry: documents.text as the stand-in payload (ASCII in the
    * testdata, so the byte-level oracle is expressible over chars).
    */
  val multimodalPipeline: (SparkSession, String) => DataFrame = (s, d) => {
    val media = Tables.documents(s, d).select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("kind"),
      col("text").cast("binary").as("payload"))
    pipeline(s, media)
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Declarative frame sampling over the binary payload: fixed-stride
    * offsets explode to one row per frame, each frame sliced with binary
    * `substring` and fingerprinted with md5 — all builtin codegen'd
    * expressions, no UDF. This is the batch shape a video/audio
    * frame-sample stage needs at 100 TB: the explode is narrow (frames
    * stay in the payload's partition) and only (id, offset, digest) rows
    * ever shuffle. A real decoder replaces the md5 "feature" per frame;
    * the slicing/offset/batch plumbing is what is verified here.
    */
  val multimodalFrames: (SparkSession, String) => DataFrame = (s, d) => {
    val stride = 256
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .filter(col("n_bytes") >= 1)
      .withColumn("frame_idx",
        explode(expr(s"sequence(0L, (n_bytes - 1) div $stride)")))
      .withColumn("offset", (col("frame_idx") * stride).cast("long"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("offset"),
        length(expr(s"substring(payload, offset + 1, $stride)")).cast("long")
          .as("frame_bytes"),
        // Fingerprint the HEX of the byte slice, not the raw bytes: DuckDB
        // 1.0 has no md5(BLOB), so hashing the (identical, uppercase-hex)
        // string representation is what keeps the oracle byte-exact for
        // non-ASCII payloads — both engines slice the same UTF-8 bytes.
        md5(hex(expr(s"substring(payload, offset + 1, $stride)"))).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio feature extraction over the binary payload: bytes reinterpreted
    * as s16le PCM samples (lo + 256·hi, two's-complement), framed at 128
    * samples, with per-frame sample count, energy (Σ v² — exact integer
    * arithmetic, no FP drift possible) and peak amplitude. The per-sample
    * decode is hex-pair arithmetic over builtin codegen expressions
    * (`hex`/`substring`/`conv`), the same no-UDF discipline as the frame
    * sampler; the sample explode is narrow (samples stay in the payload's
    * partition) and only the small (doc, frame, 3-int) rows shuffle for
    * the per-frame aggregate. A real deployment swaps the hex decode for
    * a codec via the multimodal mapPartitions stage; the framing/energy
    * plumbing verified here is unchanged.
    */
  val multimodalAudio: (SparkSession, String) => DataFrame = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        hex(col("text").cast("binary")).as("hx"),
        expr("length(CAST(text AS BINARY)) div 2").as("n_samples_doc"))
      .filter(col("n_samples_doc") >= 1)
      .withColumn("k", explode(expr("sequence(0L, n_samples_doc - 1)")))
      .withColumn("u", expr(
        """CAST(conv(substring(hx, CAST(4 * k + 1 AS INT), 2), 16, 10) AS BIGINT)
          | + 256 * CAST(conv(substring(hx, CAST(4 * k + 3 AS INT), 2), 16, 10)
          |            AS BIGINT)""".stripMargin))
      .withColumn("v",
        when(col("u") >= 32768L, col("u") - 65536L).otherwise(col("u")))
      .groupBy(col("doc_id"), expr("k div 128").as("frame_idx"))
      .agg(
        count(lit(1)).as("n_samples"),
        sum(col("v") * col("v")).as("energy"),
        max(abs(col("v"))).as("peak"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_multimodal_pipeline" -> multimodalPipeline,
    "llm_multimodal_frames" -> multimodalFrames,
    "llm_multimodal_audio" -> multimodalAudio
  )

  /** Both oracles work on the UTF-8 BYTES of `text` (via hex(encode(..))),
    * mirroring the Spark side's binary cast — char-based substring/ascii
    * would silently diverge on any non-ASCII document. DuckDB 1.0 cannot
    * slice or md5 a BLOB, so byte N is the hex pair at 2N+1 and frames are
    * fingerprinted as md5-of-uppercase-hex (identical in both engines).
    */
  val oracles: Map[String, String] = Map(
    "llm_multimodal_pipeline" ->
      """WITH b AS (
        |  SELECT doc_id, source, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS nb FROM documents)
        |SELECT doc_id,
        | 'media/' || source AS kind,
        | nb AS n_bytes,
        | 64 + ('0x' || substring(hx, 1, 2))::int % 64 AS width,
        | 64 + ('0x' || substring(hx, CAST((nb - 1) * 2 + 1 AS INTEGER), 2))::int % 64 AS height,
        | nb // 1000 + 1 AS n_frames,
        | CAST(list_sum(list_transform(range(nb),
        |   i -> ('0x' || substring(hx, CAST(i * 2 + 1 AS INTEGER), 2))::int)) AS BIGINT) AS checksum
        |FROM b ORDER BY doc_id""".stripMargin,
    "llm_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |   unnest(range(0, (octet_length(encode(text)) - 1) // 256 + 1)) AS frame_idx
        |  FROM documents WHERE octet_length(encode(text)) >= 1)
        |SELECT doc_id, frame_idx, frame_idx * 256 AS offset,
        |       length(substring(hx, CAST(frame_idx * 512 + 1 AS INTEGER), 512)) // 2
        |         AS frame_bytes,
        |       md5(substring(hx, CAST(frame_idx * 512 + 1 AS INTEGER), 512))
        |         AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "llm_multimodal_audio" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |   octet_length(encode(text)) // 2 AS ns
        |  FROM documents WHERE octet_length(encode(text)) >= 2),
        |smp AS (SELECT doc_id, hx, unnest(range(ns)) AS k FROM b),
        |uv AS (
        |  SELECT doc_id, k,
        |   ('0x' || substring(hx, CAST(4 * k + 1 AS INTEGER), 2))::int
        |   + 256 * ('0x' || substring(hx, CAST(4 * k + 3 AS INTEGER), 2))::int
        |     AS u
        |  FROM smp),
        |sv AS (SELECT doc_id, k,
        |        CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v FROM uv)
        |SELECT doc_id, CAST(k // 128 AS BIGINT) AS frame_idx,
        | count(*) AS n_samples,
        | CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
        | CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM sv GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx""".stripMargin
  )
}
