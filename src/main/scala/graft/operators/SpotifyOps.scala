package graft.operators

import graft.OpGroup
import graft.schemas.Spotify
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries over the reference's REAL nested warehouse schemas
  * (terraform/schemas/albums_schema.json:123-209 — the 4-level
  * `tracks.items[].artists[].external_urls` nesting; artists_schema
  * .json:1-21), exercised end-to-end on the repo's Spotify-shaped ndjson
  * fixtures and oracle-checked via DuckDB `read_json` with the same
  * declared columns (bq-load semantics: unknown keys dropped, missing →
  * NULL, never inference).
  *
  * The fixture paths are absolute — the driver's sfDir holds the
  * TPC-H-ish tables only; these queries are schema-shape coverage, not
  * scale coverage (FIXTURES.md §B).
  */
object SpotifyOps extends OpGroup {

  private val dir = "/root/repo/src/test/resources/spotify"

  private def albums(s: SparkSession): DataFrame =
    s.read.schema(Spotify.albums).json(s"$dir/albums.ndjson")
  private def artists(s: SparkSession): DataFrame =
    s.read.schema(Spotify.artists).json(s"$dir/artists.ndjson")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The nested star: albums ⋈ explode(tracks.items) ⋈ explode(items
    // .artists) ⋈ artists — a user's first query over this warehouse
    // (app.py:183-190 walks exactly this path). posexplode pins both
    // nesting levels' ordinals; the artists dimension is deduped to max
    // popularity (the fixture plants a duplicate id) and broadcast.
    "spotify_album_track_star" -> ((s, _) => {
      val art = artists(s).groupBy("id")
        .agg(max("popularity").as("artist_popularity"))
      albums(s)
        .select(col("id").as("album_id"), col("name").as("album_name"),
          posexplode(col("tracks.items")).as(Seq("tp", "it")))
        .select(col("album_id"), col("album_name"),
          (col("tp") + 1).cast("int").as("track_pos"),
          col("it.id").as("track_id"), col("it.name").as("track_name"),
          col("it.track_number").as("track_number"),
          posexplode(col("it.artists")).as(Seq("ap", "ar")))
        .select(col("album_id"), col("album_name"), col("track_pos"),
          col("track_id"), col("track_name"), col("track_number"),
          (col("ap") + 1).cast("int").as("artist_pos"),
          col("ar.id").as("artist_id"), col("ar.name").as("artist_name"),
          col("ar.external_urls.spotify").as("artist_url"))
        .join(broadcast(art), col("artist_id") === col("id"), "left")
        .drop("id")
        .orderBy("album_id", "track_pos", "artist_pos")
    }),

    // E-outer — keep-parent explode over empty/missing REPEATED fields:
    // the reference's defensive `.get('available_markets', [])`
    // (app.py:143,156-157) keeps albums with no markets; plain explode
    // would silently drop them. b2 (missing), b3 (empty []) and b4
    // (missing) each survive as one NULL-market row.
    "spotify_markets_explode_outer" -> ((s, _) =>
      albums(s)
        .select(col("id").as("album_id"),
          explode_outer(col("available_markets")).as("market"),
          when(col("available_markets").isNull, 0)
            .otherwise(size(col("available_markets"))).as("n_markets"))
        .orderBy(col("album_id"), col("market").asc_nulls_first)),

    // Nested-ARRAY patch: rewrite every element of a REPEATED record
    // in place — `transform` re-emits the struct with a rewritten url
    // and a derived n_px field, no explode in the patch itself (the
    // posexplode_outer below only flattens the RESULT for row
    // comparison; keep-parent so image-less albums survive). This is
    // the repeated-field sibling of nested_field_update: together they
    // cover BigQuery-style UPDATE over RECORD and REPEATED RECORD.
    "spotify_image_array_patch" -> ((s, _) =>
      albums(s)
        .withColumn("images", expr(
          """transform(images, im -> struct(
            |  replace(im.url, 'https://img.example.com/',
            |          'https://cdn.example.net/') AS url,
            |  im.height * im.width AS n_px))""".stripMargin))
        .select(col("id").as("album_id"),
          posexplode_outer(col("images")).as(Seq("p", "im")))
        .select(col("album_id"), (col("p") + 1).cast("int").as("image_pos"),
          col("im.url").as("url"), col("im.n_px").as("n_px"))
        .orderBy(col("album_id"), col("image_pos").asc_nulls_first)),
  )

  val oracleSql: Map[String, String] = Map(
    // patched array re-derived element-wise; the outer branch re-adds
    // image-less albums as one NULL row (posexplode_outer semantics)
    "spotify_image_array_patch" ->
      s"""WITH albums AS (
         |  SELECT * FROM read_json('$dir/albums.ndjson',
         |    format='newline_delimited',
         |    columns={id:'VARCHAR',
         |             images:'STRUCT(url VARCHAR, height BIGINT, width BIGINT)[]'})),
         |ex AS (
         |  SELECT a.id AS album_id, CAST(r.i AS INTEGER) AS image_pos,
         |         a.images[CAST(r.i AS INTEGER)] AS im
         |  FROM albums a CROSS JOIN range(1, 17) r(i)
         |  WHERE r.i <= len(a.images)),
         |patched AS (
         |  SELECT album_id, image_pos,
         |         replace(im.url, 'https://img.example.com/',
         |                 'https://cdn.example.net/') AS url,
         |         im.height * im.width AS n_px
         |  FROM ex
         |  UNION ALL
         |  SELECT id, NULL, NULL, NULL FROM albums
         |  WHERE images IS NULL OR len(images) = 0)
         |SELECT album_id, image_pos, url, n_px
         |FROM patched ORDER BY album_id, image_pos NULLS FIRST""".stripMargin,
    "spotify_album_track_star" ->
      s"""WITH albums AS (
         |  SELECT * FROM read_json('$dir/albums.ndjson',
         |    format='newline_delimited',
         |    columns={id:'VARCHAR', name:'VARCHAR',
         |             tracks:'STRUCT(items STRUCT(id VARCHAR, name VARCHAR,
         |                     track_number BIGINT,
         |                     artists STRUCT(id VARCHAR, name VARCHAR,
         |                       external_urls STRUCT(spotify VARCHAR))[])[])'})),
         |artists AS (
         |  SELECT id, max(popularity) AS artist_popularity
         |  FROM read_json('$dir/artists.ndjson',
         |    format='newline_delimited',
         |    columns={id:'VARCHAR', popularity:'BIGINT'})
         |  GROUP BY id),
         |items AS (
         |  SELECT a.id AS album_id, a.name AS album_name,
         |         CAST(r.i AS INTEGER) AS track_pos,
         |         a.tracks.items[CAST(r.i AS INTEGER)] AS it
         |  FROM albums a CROSS JOIN range(1, 65) r(i)
         |  WHERE r.i <= len(a.tracks.items)),
         |flat AS (
         |  SELECT album_id, album_name, track_pos,
         |         it.id AS track_id, it.name AS track_name,
         |         it.track_number AS track_number,
         |         CAST(r2.j AS INTEGER) AS artist_pos,
         |         it.artists[CAST(r2.j AS INTEGER)].id AS artist_id,
         |         it.artists[CAST(r2.j AS INTEGER)].name AS artist_name,
         |         it.artists[CAST(r2.j AS INTEGER)].external_urls.spotify AS artist_url
         |  FROM items CROSS JOIN range(1, 65) r2(j)
         |  WHERE r2.j <= len(it.artists))
         |SELECT f.*, ar.artist_popularity
         |FROM flat f LEFT JOIN artists ar ON f.artist_id = ar.id
         |ORDER BY album_id, track_pos, artist_pos""".stripMargin,
    "spotify_markets_explode_outer" ->
      s"""WITH albums AS (
         |  SELECT * FROM read_json('$dir/albums.ndjson',
         |    format='newline_delimited',
         |    columns={id:'VARCHAR', available_markets:'VARCHAR[]'}))
         |SELECT id AS album_id,
         |       CASE WHEN coalesce(len(available_markets), 0) = 0 THEN NULL
         |            ELSE available_markets[CAST(r.i AS INTEGER)] END AS market,
         |       CAST(coalesce(len(available_markets), 0) AS INTEGER) AS n_markets
         |FROM albums CROSS JOIN range(1, 65) r(i)
         |WHERE r.i <= coalesce(len(available_markets), 0) OR r.i = 1
         |ORDER BY album_id, market NULLS FIRST""".stripMargin,
  )
}
