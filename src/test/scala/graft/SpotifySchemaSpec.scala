package graft

import graft.schemas.Spotify
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declared-schema semantics over the Spotify-shaped nested fixtures
  * (FIXTURES.md §B): S2 `bq load` behavior (unknown keys dropped,
  * missing → NULL), E1-E4 explode over 4-level nesting, F4 JSON render
  * round trip, F6 variable-precision dates, J3 parent-embedding, D4
  * dedup on duplicate ids.
  */
class SpotifySchemaSpec extends SparkSpec {
  import spark.implicits._

  private def artists: DataFrame =
    spark.read.schema(Spotify.artists).json(fixture("artists.ndjson"))
  private def albums: DataFrame =
    spark.read.schema(Spotify.albums).json(fixture("albums.ndjson"))
  private def tracks: DataFrame =
    spark.read.schema(Spotify.tracks).json(fixture("tracks.ndjson"))

  test("S2: unknown JSON keys are dropped, missing keys read as NULL") {
    val df = artists
    assert(!df.columns.contains("unknown_extra_key")) // bq load drops unknowns
    val a2 = df.filter(col("id") === "a2").head()
    assert(a2.isNullAt(a2.fieldIndex("name")))
    assert(a2.isNullAt(a2.fieldIndex("genres")))
    assert(a2.isNullAt(a2.fieldIndex("followers")))
    // fully-populated row keeps nested values
    val a1 = df.filter(col("id") === "a1" && col("popularity") === 86).head()
    assert(a1.getStruct(a1.fieldIndex("followers")).getLong(0) === 1000000L)
  }

  test("E2/E3: explode drops null+empty arrays, explode_outer keeps rows") {
    val g = artists.select(col("id"), explode(col("genres")).as("genre"))
    // a2 (null genres) and a3 (empty genres) contribute nothing
    assert(g.filter(col("id").isin("a2", "a3")).count() === 0)
    val go = artists.select(col("id"), explode_outer(col("genres")).as("genre"))
    assert(go.filter(col("id") === "a2").count() === 1) // kept with null genre
    assert(go.filter(col("id") === "a3").count() === 1)
  }

  test("E1/E4: 4-level nested explode of tracks.items with ordinals") {
    val items = albums.filter(col("id") === "b1")
      .select(col("id").as("album_id"),
        posexplode(col("tracks.items")).as(Seq("pos", "item")))
    val rows = items.select(col("pos"), col("item.id"), col("item.track_number"),
      col("item.artists")(0)("external_urls")("spotify").as("artist_url"))
      .as[(Int, String, Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq === Seq("t1", "t2"))
    // stored ordinal == position + 1 (track_number is 1-based)
    assert(rows.forall { case (pos, _, tn, _) => tn === pos + 1 })
    assert(rows.head._4 === "https://open.example.com/artist/a1")
  }

  test("G6: track list materialized in declared track_number order") {
    val ordered = albums.filter(col("id") === "b1")
      .select(expr("transform(array_sort(tracks.items, " +
        "(a, b) -> CASE WHEN a.track_number < b.track_number THEN -1 " +
        "WHEN a.track_number > b.track_number THEN 1 ELSE 0 END), it -> it.id)")
        .as("ids"))
      .as[Seq[String]].head()
    assert(ordered === Seq("t1", "t2"))
  }

  test("F6: release_date parses under its declared precision") {
    val parsed = albums
      .select(col("id"), col("release_date"), col("release_date_precision"),
        expr("""CAST(coalesce(try_to_timestamp(release_date, 'yyyy-MM-dd'),
               |               try_to_timestamp(release_date, 'yyyy-MM'),
               |               try_to_timestamp(release_date, 'yyyy')) AS DATE)"""
          .stripMargin).as("d"))
      .filter(col("d").isNotNull)
      .as[(String, String, String, java.sql.Date)].collect()
      .map(r => r._1 -> r._4.toString).toMap
    assert(parsed("b1") === "1973-03-25")
    assert(parsed("b2") === "1973-01-01")
    assert(parsed("b3") === "1973-03-01")
  }

  test("F4: to_json ∘ from_json is identity on the artists schema") {
    val originals = artists.select(to_json(struct(artists.columns.map(col): _*)).as("j"))
    val roundTrip = originals
      .select(from_json(col("j"), Spotify.artists).as("s"))
      .select(to_json(col("s")).as("j"))
    assert(originals.exceptAll(roundTrip).isEmpty &&
      roundTrip.exceptAll(originals).isEmpty)
  }

  test("REQUIRED id: strict load throws on NULL id, permissive load counts it") {
    val dir = tmpDir("graft_required")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.ndjson"),
      """{"id":"ok1","name":"fine"}
        |{"id":null,"name":"rejected by bq load"}
        |""".stripMargin)
    val df = spark.read.schema(Spotify.artists).json(s"$dir/bad.ndjson")
    // Spark's permissive read yields the NULL the declared schema forbids
    assert(df.filter(col("id").isNull).count() === 1)
    // strict mode: the load fails, matching bq load's rejection
    val ex = intercept[Exception] {
      Spotify.failOnNullRequired(df, Seq("id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("REQUIRED column 'id'")), msgs(ex).mkString("; "))
    // a clean fixture passes strict mode untouched
    assert(Spotify.failOnNullRequired(artists, Seq("id")).count() === artists.count())
  }

  test("J3: child rows carry their embedded parent album (and D4 dedups ids)") {
    val t = tracks
    assert(t.count() === 4) // includes the duplicate t1
    val dedup = t.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("popularity").asc_nulls_first)))
      .filter(col("rn") === 1)
    assert(dedup.count() === 3)
    val t4 = t.filter(col("id") === "t4").head()
    val album = t4.getStruct(t4.fieldIndex("album"))
    assert(album.getString(album.fieldIndex("release_date_precision")) === "year")
    // J3 flat view: track joined to its parent fields without explosion
    val flat = t.filter(col("album").isNotNull)
      .select(col("id"), col("album.id").as("album_id"),
        col("album.release_date").as("album_release"))
    assert(flat.filter(col("id") === "t1" && col("album_id") === "b1").count() === 1)
  }
}
