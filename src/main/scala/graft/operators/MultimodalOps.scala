package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row carrying an opaque media payload + typed metadata — the multimodal
  * column pattern: media as `binary`, schema'd sidecar fields.
  */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String, source: String)

/** Deterministic features extracted from a payload by the decode stub. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
    first_byte: Int, head_sum: Long)

/** Multimodal-column operators: image/audio/video handled as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted by a
  * partition-local stub (north-star mandate; no media codecs ship in this
  * environment, so the decode body is a clearly-marked deterministic fake
  * while the Spark-side plumbing — schema, encoders, partitioning, batch
  * shape — is real and oracle-tested).
  *
  * Scale notes: `mapPartitions` is the right boundary for codec work —
  * one codec init per partition, streaming iterator (no per-partition
  * materialization), binary payloads never shuffled except by explicit
  * key. At 100 TB the payload column stays in parquet until the decode
  * stage projects it, and column pruning keeps metadata-only queries from
  * ever reading the bytes.
  */
object MultimodalOps extends OpGroup {

  /** STUB decode: stands in for image/audio decode + feature extraction
    * (e.g. JPEG→RGB stats, PCM→spectral moments). Deterministic on the
    * payload bytes so the oracle can replicate it arithmetically.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val headSum = r.payload.take(8).foldLeft(0L)((a, b) => a + (b & 0xFF))
    MediaFeatures(r.doc_id, r.mime, r.payload.length,
      r.payload.headOption.map(_ & 0xFF).getOrElse(0), headSum)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata → partition-local decode → typed features.
    "multimodal_binary_features" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("mime"), col("source"))
        .as[MediaRow]
        .mapPartitions(_.map(decodeStub))  // one codec init per partition
        .toDF()
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // Fixture text is ASCII, so byte-level features equal char-level ones.
    "multimodal_binary_features" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
        |       CAST(ascii(substr(text, 1, 1)) + ascii(substr(text, 2, 1))
        |          + ascii(substr(text, 3, 1)) + ascii(substr(text, 4, 1))
        |          + ascii(substr(text, 5, 1)) + ascii(substr(text, 6, 1))
        |          + ascii(substr(text, 7, 1)) + ascii(substr(text, 8, 1))
        |         AS BIGINT) AS head_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
