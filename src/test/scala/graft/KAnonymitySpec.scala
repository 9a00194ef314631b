package graft

/** q188_k_anonymity: hand-built equivalence classes — (en, band 0)
  * holds 3 docs from 2 sources (k=3, l=2), (fr, band 1) holds 1 doc
  * (the re-identifiable singleton, l=1 mono-source), (de, band 0)
  * holds 2 docs from one source (mono-source but k-safe at 2).
  */
class KAnonymitySpec extends SparkSuite {

  test("class sizes, l-diversity and risk flags are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    // (doc_id, text, lang, source, n_chars) — n_chars drives the band
    Seq(
      (1L, "t", "en", "sA", 10L), (2L, "t", "en", "sA", 50L),
      (3L, "t", "en", "sB", 99L),
      (4L, "t", "fr", "sA", 150L),
      (5L, "t", "de", "sC", 20L), (6L, "t", "de", "sC", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q188_k_anonymity")(spark, dir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.size == 3)
    assert(got(("en", 0L)) == ((3L, 2L, 0.5, 0L, 0L)))
    assert(got(("fr", 1L)) == ((1L, 1L, 1.0 / 6.0, 1L, 1L)),
      "singleton class must flag re-identifiable AND mono-source")
    assert(got(("de", 0L)) == ((2L, 1L, 2.0 / 6.0, 0L, 1L)),
      "k-safe mono-source class must still flag provenance leakage")
  }
}
