package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column handling: image/audio/video payloads carried as
 * opaque `binary` columns with a typed metadata struct alongside —
 * the fourth north-star family (no counterpart in the reference
 * engine, which is purely relational).
 *
 * Everything metadata/bytes-level (length, digests, base64, frame
 * slicing, resize arithmetic) is codegen'd built-ins over
 * `BinaryType` — no UDFs, fully portable to the DuckDB oracle. Only
 * the codec step (`decodeFeaturesStub`) needs per-row imperative
 * code; this container ships no image/audio libraries, so that step
 * is a clearly-marked deterministic stub behind real Spark plumbing
 * (typed Dataset, batched mapPartitions — the Scala analogue of
 * `mapInPandas`).
 */
object Multimodal {

  /**
   * Deterministic multimodal corpus synthesized from a text table:
   * `payload` = UTF-8 bytes of `textCol` (a stand-in for real media
   * bytes), `media` = struct(format, width, height) derived from the
   * id — so the oracle can reproduce both sides with no shared state.
   *
   * Scale: pure per-row projection, no shuffle; payloads stay opaque
   * binary all the way down (never materialized as strings).
   */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    docs.select(
      id,
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        element_at(
          array(lit("png"), lit("jpeg"), lit("webp")),
          (id % 3 + 1).cast("int")).as("format"),
        (lit(64) * (id % 4 + 1)).cast("int").as("width"),
        (lit(64) * (id % 3 + 1)).cast("int").as("height")).as("media"))
  }

  /** Byte length of a binary payload. */
  def nBytes(payload: Column): Column = length(payload).cast("int")

  /** Lowercase-hex SHA-256 digest of the raw bytes. */
  def sha256Hex(payload: Column): Column = sha2(payload, 256)

  /** Lowercase-hex MD5 digest of the raw bytes. */
  def md5Hex(payload: Column): Column = md5(payload)

  /** RFC-4648 base64 (no line wrapping in Spark ≥3.3 defaults). */
  def b64(payload: Column): Column = base64(payload)

  /** Uppercase hex of the first `n` bytes — a magic-number peek. */
  def hexHead(payload: Column, n: Int): Column =
    hex(payload.substr(lit(1), lit(n)))

  /**
   * Aspect-preserving resize arithmetic on the metadata struct only —
   * the planning half of a resize operator (the pixel half lives
   * behind [[decodeFeaturesStub]]'s codec boundary). Output dims are
   * floor(dim × scale) with scale = maxDim / max(w, h), capped at 1.
   */
  def resizeDims(media: Column, maxDim: Int): Column = {
    val w = media.getField("width").cast("double")
    val h = media.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    struct(
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"))
  }

  /**
   * Frame sampling: slice the payload into fixed-size chunks starting
   * every `stride` bytes — the byte-level shape of video
   * frame-extraction (seek points + bounded reads). One output row
   * per (row, frame).
   *
   * Scale: `sequence` + `posexplode` + `substr` are all codegen'd;
   * the fan-out is bounded by payload size / stride and shuffles
   * nothing. At 100 TB the per-row expansion streams through the
   * scan stage without materializing whole payload copies per frame
   * (each frame is an independent bounded slice).
   */
  def frames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      frameSize: Int,
      stride: Int): DataFrame = {
    // Empty payloads emit no frames (Spark's sequence(1,0,n) throws;
    // DuckDB's generate_series(1,0,n) is empty — match the latter).
    val positions = when(
      length(col(payloadCol)) > 0,
      sequence(lit(1), length(col(payloadCol)), lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), col(payloadCol), posexplode(positions))
      .select(
        col(idCol),
        col("pos").cast("int").as("frame_idx"),
        col(payloadCol).substr(col("col"), lit(frameSize)).as("frame"))
  }

  /**
   * Codec-boundary STUB: batched feature extraction over payload
   * bytes via typed `mapPartitions` — the Scala analogue of a
   * `mapInPandas` decode UDF. A real deployment would decode the
   * image/audio codec per batch here (javax.imageio / ffmpeg / JNI);
   * this container ships no codec libraries, so the body emits
   * DETERMINISTIC FAKE features (byte-sampled, normalized to [0,1])
   * while keeping every piece of the Spark plumbing real: typed
   * Dataset[(id, bytes)] input, fixed `dim` feature-vector schema,
   * explicit batch shape (`batchSize`-row groups, the unit a codec
   * would process per native call), partition-local execution (no
   * shuffle, no driver collect).
   */
  def decodeFeaturesStub(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // >>> codec call site: decode(batch) would go here <<<
          batch.map { case (id, bytes) =>
            val feats = Array.tabulate(dim) { j =>
              if (bytes.isEmpty) 0.0f
              else (bytes(j * 31 % bytes.length) & 0xff) / 255.0f
            }
            (id, feats)
          }
        }
      }
      .toDF(idCol, "features")
  }
}
