package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table

/** §2j multimodal column plumbing (SURVEY §2j).
  *
  * Media assets are opaque `binary` columns travelling next to typed
  * metadata; decode / feature-extraction is per-row imperative work done by
  * a native library at the executors. This container has no image/audio
  * codecs, so the decode step is a clearly-marked deterministic STUB
  * (hash-derived pseudo-features) — but the Spark-side plumbing is real and
  * is the part that matters at 100 TB:
  *  - binary payload + metadata struct schema,
  *  - per-row feature extraction inside the scan stage (no shuffle),
  *  - a typed `mapPartitions` pipeline for the chunk/frame-explode shape
  *    (one input row → many frame rows) with partition-local batching, which
  *    is the Scala analog of arrow-batched `mapInPandas` decode loops.
  */
object Multimodal {

  /** One "asset" row per document: UTF-8 payload standing in for an image
    * blob, metadata struct (byte count, mime, md5 checksum), and an 8-dim
    * stub feature vector (STUB — replace the per-slot expressions with the
    * real decoder's embedding at deploy time). Each feature slot is a
    * strided codepoint-sum over one eighth of the content — pure arithmetic,
    * content-sensitive, and engine-neutral, so the WHOLE output (checksum
    * and features included) is hash-checked against the DuckDB oracle.
    * Surfaced as per-slot doubles: the driver comparator can't hash array
    * cells, and float JSON formatting differs between engines.
    */
  def decodeStub(spark: SparkSession, sfDir: String): DataFrame =
    decodeStub(table(spark, sfDir, "documents")).orderBy(col("doc_id"))

  /** API form: asset rows over any `(doc_id, text)` frame — unordered. */
  def decodeStub(docs: DataFrame): DataFrame = {
    // slot i samples 32 strided positions from segment i of the doc:
    // f_i = (Σ_j codepoint(text[⌊(32i+j)·n/256⌋])) mod 1000 / 1000 ∈ [0,1).
    // All 8 slot sums come from ONE native single-pass expression
    // (StridedAsciiSums): the composed 256-term ascii/substr tree both
    // overflowed janino's method limit (whole stage silently interpreted)
    // and re-walked the string from offset 0 per term. The sums array is
    // hoisted into its own projection so it evaluates once — CollapseProject
    // never re-inlines a non-cheap alias referenced 8× (same hoist as
    // ml_assembler, plan-guarded in the suite). The suite also pins the
    // native expression bit-equal to the composed form.
    def slot(i: Int) =
      (pmod(element_at(col("slot_sums"), i + 1), lit(1000L))
        .cast(DoubleType) / 1000.0).as(s"f$i")
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        md5(col("payload")).as("checksum")))
      .withColumn("slot_sums", graft.functions.StringMath.stridedAsciiSums(
        col("text"), slots = 8, terms = 32, denom = 256))
      .select(Seq(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.mime").as("mime"),
        col("meta.checksum").as("checksum")) ++ (0 until 8).map(slot): _*)
  }

  /** Frame-sampling shape: explode each payload into fixed-size "frames"
    * (256-byte chunks standing in for video frames / audio windows), one
    * output row per frame with a stub frame feature. Implemented with a
    * typed `mapPartitions` to exercise the real executor-side batch loop a
    * native decoder needs (iterator in, iterator out, nothing driver-side).
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(table(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      frameBytes = 256)
      .orderBy(col("doc_id"), col("frame_idx"))

  /** API form: frame-explode any `(doc_id, payload binary)` frame at a
    * caller-chosen frame size — unordered.
    */
  def frameSample(assets: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    val spark2 = assets.sparkSession
    import spark2.implicits._
    assets
      // tuple encoders bind by position: pin the two columns explicitly so
      // any extra caller columns don't shift the payload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, payload) =>
          payload.grouped(frameBytes).zipWithIndex.map {
            case (frame, idx) =>
              // STUB decode: real impl hands `frame` to a codec; here a
              // deterministic position-weighted digest stands in for the
              // decoded feature. Mod-prime (not wrap-around) arithmetic so
              // the SQL oracle reproduces it exactly.
              val digest = frame.zipWithIndex.map {
                case (b, k) => (k + 1L) * b
              }.sum % 144115188075855881L
              (docId, idx, frame.length, digest)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_digest")
  }

  /** Resize shape: downsample each payload to a fixed-length thumbnail by
    * striding over the bytes (STUB for an image resize — a real kernel
    * would interpolate pixels; the stride keeps it deterministic and
    * byte-faithful). Fixed output size regardless of input size is the
    * contract a downstream feature extractor needs.
    */
  def resizeStub(spark: SparkSession, sfDir: String): DataFrame =
    resizeStub(table(spark, sfDir, "documents"), thumbLen = 64)
      .orderBy(col("doc_id"))

  /** API form: fixed-length strided thumbnail at a caller-chosen length
    * over any `(doc_id, text)` frame — unordered.
    */
  def resizeStub(docs: DataFrame, thumbLen: Int): DataFrame = {
    require(thumbLen >= 1, s"thumbLen must be >= 1, got $thumbLen")
    docs
      .withColumn("n_chars", length(col("text")))
      // the strided downsample is StridedAsciiSums degenerated to one term
      // per slot: element i = codepoint at position ⌊i·n/64⌋+1 — the same
      // single-pass walk as the decode stub instead of 64 independent
      // substr reads each re-walking the string (see StringMath)
      .withColumn("thumb", graft.functions.StringMath.stridedAsciiSums(
        col("text"), slots = thumbLen, terms = 1, denom = thumbLen))
      .select(col("doc_id"), col("n_chars"),
        size(col("thumb")).as("thumb_len"),
        // CSV rendering: the comparator needs hashable cells, and int→string
        // formatting is engine-independent so the byte content stays
        // oracle-checked
        array_join(transform(col("thumb"), _.cast(StringType)), ",")
          .as("thumb_csv"))
  }

  /** SQL-checkable slice of the multimodal plumbing: payload sizing layout
    * (frame counts per asset) is pure arithmetic over octet lengths, so the
    * schema/partitioning contract is oracle-verified even though decode
    * content is not.
    */
  def frameLayout(spark: SparkSession, sfDir: String): DataFrame =
    frameLayout(table(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      frameBytes = 256)
      .orderBy(col("doc_id"))

  /** API form: frame-count layout for any `(doc_id, payload binary)` frame
    * at a caller-chosen frame size — unordered.
    */
  def frameLayout(assets: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    assets.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      ceil(length(col("payload")).cast(DoubleType) / frameBytes.toDouble)
        .cast(IntegerType).as("n_frames"))
  }

  val oracleSql: Map[String, String] = Map(
    // stub decode is engine-neutral arithmetic over the ASCII corpus: byte
    // count, md5 hex digest (identical in both engines over UTF-8 bytes),
    // and strided codepoint-sum features
    "mm_decode_stub" -> {
      val slots = (0 until 8).map { i =>
        s"""  CAST((list_sum(list_transform(range(0, 32),
           |    j -> ascii(substr(text,
           |      CAST(FLOOR((${i * 32} + j) * length(text) / 256.0) AS INTEGER) + 1,
           |      1)))) % 1000) AS DOUBLE) / 1000.0 AS f$i""".stripMargin
      }.mkString(",\n")
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         |  'application/octet-stream' AS mime,
         |  md5(text) AS checksum,
         |$slots
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // frame explode reproduced with a correlated unnest(range(...)) — one
    // row per 256-byte frame; the position-weighted digest is plain
    // arithmetic in both engines
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(j AS INTEGER) AS frame_idx,
        |  CAST(LEAST(256, length(text) - j*256) AS INTEGER) AS frame_bytes,
        |  CAST(list_sum(list_transform(
        |    range(1, LEAST(256, length(text) - j*256) + 1),
        |    k -> k * ascii(substr(text, j*256 + k, 1))))
        |    % 144115188075855881 AS BIGINT) AS frame_digest
        |FROM documents,
        |  unnest(range(0, CAST(CEIL(length(text)/256.0) AS INTEGER))) AS t(j)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // stride-downsample is pure arithmetic over ASCII codepoints (corpus is
    // all-ASCII), so the resize contract gets a full hash oracle; DuckDB
    // needs an explicit FLOOR where Spark's CAST AS INT truncates
    "mm_resize_stub" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(64 AS INTEGER) AS thumb_len,
        |  array_to_string(list_transform(range(0, 64),
        |    i -> CAST(ascii(substr(text,
        |           CAST(FLOOR(i * length(text) / 64.0) AS INTEGER) + 1, 1))
        |         AS VARCHAR)), ',') AS thumb_csv
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_layout" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(CEIL(CAST(octet_length(encode(text)) AS DOUBLE) / 256.0)
        |       AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
