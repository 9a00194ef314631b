package graft

/** q193_source_concentration: hand-computed HHI — 'en' split 4/4/2
  * over three sources (HHI = 36/100), 'fr' a 5-doc monoculture
  * (HHI = 1, effective sources 1), 'de' two equal sources
  * (HHI = 1/2, effective 2).
  */
class SourceConcentrationSpec extends SparkSuite {

  test("HHI and effective source counts are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hhi").toString
    val rows =
      (0 until 4).map(i => (100L + i, "t", "en", "sA")) ++
        (0 until 4).map(i => (200L + i, "t", "en", "sB")) ++
        (0 until 2).map(i => (300L + i, "t", "en", "sC")) ++
        (0 until 5).map(i => (400L + i, "t", "fr", "sA")) ++
        (0 until 3).map(i => (500L + i, "t", "de", "sA")) ++
        (0 until 3).map(i => (600L + i, "t", "de", "sB"))
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q193_source_concentration")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got("en") == ((3L, 10L, 36.0 / 100.0, 100.0 / 36.0)))
    assert(got("fr") == ((1L, 5L, 1.0, 1.0)),
      "monoculture must read HHI = 1, effective sources = 1")
    assert(got("de") == ((2L, 6L, 18.0 / 36.0, 2.0)))
  }
}
