package graft.schemas

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference warehouse's three table schemas as Spark StructTypes —
  * mechanical translations of the BigQuery schema files (field order
  * preserved):
  *   - artists: terraform/schemas/artists_schema.json:1-21
  *   - albums:  terraform/schemas/albums_schema.json:1-210 (4-level
  *     nesting: tracks.items[].artists[].external_urls)
  *   - tracks:  terraform/schemas/tracks_schema.json:1-171 (child carries
  *     its parent album record)
  *
  * BigQuery type mapping (SURVEY.md §1.2): STRING→StringType,
  * INTEGER→LongType (int64), BOOLEAN→BooleanType, REPEATED→ArrayType,
  * RECORD→StructType. `id` is REQUIRED (nullable = false); everything
  * else NULLABLE. Used with `spark.read.schema(...).json` — declared
  * schema, never inference, matching `bq load` semantics (unknown keys
  * dropped, missing keys → NULL).
  */
object Spotify {

  /** `bq load` REQUIRED-mode semantics: the load FAILS when a REQUIRED
    * column is NULL (artists_schema.json:2 — BigQuery rejects such rows
    * outright). Spark's declared-schema JSON read ignores nullability and
    * silently yields a NULL instead, so strict ingestion guards each
    * REQUIRED column with an inline raise_error — evaluated row-by-row
    * inside the scan projection, no driver-side validation pass. Pair
    * with the permissive `validate_required` count for audit-then-fail
    * pipelines.
    */
  def failOnNullRequired(df: DataFrame, required: Seq[String]): DataFrame =
    required.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull,
          raise_error(lit(s"REQUIRED column '$c' is NULL (bq load would reject this row)")))
          .otherwise(col(c)))
    }

  private val extUrls = StructType(Seq(
    StructField("spotify", StringType)))

  private val artistRef = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("uri", StringType),
    StructField("href", StringType),
    StructField("external_urls", extUrls)))

  private val image = StructType(Seq(
    StructField("url", StringType),
    StructField("height", LongType),
    StructField("width", LongType)))

  /** artists_schema.json:1-21 */
  val artists: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("popularity", LongType),
    StructField("genres", ArrayType(StringType)),
    StructField("href", StringType),
    StructField("uri", StringType),
    StructField("type", StringType),
    StructField("followers", StructType(Seq(
      StructField("total", LongType),
      StructField("href", StringType)))),
    StructField("external_urls", extUrls),
    StructField("images", ArrayType(StructType(Seq(
      StructField("height", LongType),
      StructField("width", LongType),
      StructField("url", StringType)))))))

  private val trackItem = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("track_number", LongType),
    StructField("disc_number", LongType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("uri", StringType),
    StructField("is_local", BooleanType),
    StructField("available_markets", ArrayType(StringType)),
    StructField("href", StringType),
    StructField("preview_url", StringType),
    StructField("type", StringType),
    StructField("external_urls", extUrls),
    StructField("artists", ArrayType(artistRef)),
    StructField("linked_from", StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType),
      StructField("uri", StringType),
      StructField("href", StringType),
      StructField("external_urls", extUrls)))),
    StructField("restrictions", StructType(Seq(
      StructField("reason", StringType))))))

  /** albums_schema.json:1-210 */
  val albums: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("album_type", StringType),
    StructField("total_tracks", LongType),
    StructField("release_date", StringType),
    StructField("release_date_precision", StringType),
    StructField("popularity", LongType),
    StructField("label", StringType),
    StructField("type", StringType),
    StructField("uri", StringType),
    StructField("href", StringType),
    StructField("available_markets", ArrayType(StringType)),
    StructField("external_urls", extUrls),
    StructField("images", ArrayType(image)),
    StructField("artists", ArrayType(artistRef)),
    StructField("copyrights", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("type", StringType))))),
    StructField("external_ids", StructType(Seq(
      StructField("upc", StringType)))),
    StructField("genres", ArrayType(StringType)),
    StructField("tracks", StructType(Seq(
      StructField("href", StringType),
      StructField("limit", LongType),
      StructField("next", StringType),
      StructField("offset", LongType),
      StructField("previous", StringType),
      StructField("total", LongType),
      StructField("items", ArrayType(trackItem)))))))

  private val albumRef = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("album_type", StringType),
    StructField("album_group", StringType),
    StructField("total_tracks", LongType),
    StructField("release_date", StringType),
    StructField("release_date_precision", StringType),
    StructField("uri", StringType),
    StructField("href", StringType),
    StructField("type", StringType),
    StructField("available_markets", ArrayType(StringType)),
    StructField("external_urls", extUrls),
    StructField("restrictions", StructType(Seq(
      StructField("reason", StringType)))),
    StructField("images", ArrayType(image)),
    StructField("artists", ArrayType(artistRef))))

  /** tracks_schema.json:1-171 */
  val tracks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("popularity", LongType),
    StructField("disc_number", LongType),
    StructField("track_number", LongType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("is_local", BooleanType),
    StructField("type", StringType),
    StructField("uri", StringType),
    StructField("href", StringType),
    StructField("preview_url", StringType),
    StructField("available_markets", ArrayType(StringType)),
    StructField("external_urls", extUrls),
    StructField("external_ids", StructType(Seq(
      StructField("isrc", StringType),
      StructField("ean", StringType),
      StructField("upc", StringType)))),
    StructField("artists", ArrayType(artistRef)),
    StructField("album", albumRef)))
}
