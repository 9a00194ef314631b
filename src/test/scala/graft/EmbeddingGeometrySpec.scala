package graft

/** q158_embedding_geometry (dim × squared-norm histogram): planted
  * mixed dims, a zero vector, unit vectors and an off-norm vector
  * must land in exactly the right cells, with the squared norm
  * folded in array order over the same float→double conversions as
  * the engine (bit-identical replica).
  */
class EmbeddingGeometrySpec extends SparkSuite {

  private def fixture: Seq[(Long, Seq[Option[Float]], Int)] = Seq(
    (0L, Seq(0f, 0f, 0f, 0f).map(Option(_)), 0),         // dim 4, sq 0 → bucket 0
    (1L, Seq(1f, 0f, 0f, 0f).map(Option(_)), 0),         // dim 4, sq 1 → bucket 10
    (2L, Seq(0f, 1f, 0f, 0f).map(Option(_)), 0),         // dim 4, sq 1 → bucket 10
    (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f).map(Option(_)), 1), // dim 4, sq 1 → bucket 10
    (4L, Seq(0.95f, 0f, 0f, 0f).map(Option(_)), 1),      // dim 4, sq ≈ 0.9025 → bucket 9
    (5L, (1 to 8).map(_ => Option(0.25f)), 2),           // dim 8, sq 0.5 → bucket 5
    // NULL element: engines disagree on folding it (Spark propagates,
    // DuckDB skips) — the sentinel bucket −1 surfaces it identically
    (6L, Seq(Option(1f), None, Option(2f)), 2))          // dim 3 → bucket −1

  test("cells exact against the float→double fold replica") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geom").toString
    fixture.toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q158_embedding_geometry")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = fixture
      .map { case (_, e, _) =>
        if (e.exists(_.isEmpty)) (e.size.toLong, -1L)
        else {
          val sq = e.flatten.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
          (e.size.toLong, math.floor(sq * 10).toLong)
        }
      }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(got == want, s"got $got\nwant $want")
    assert(got((4L, 0L)) == 1L, "zero vector must sit in bucket 0")
    assert(got((4L, 10L)) == 3L, "unit vectors in bucket 10")
    assert(got((4L, 9L)) == 1L, "off-norm vector in bucket 9")
    assert(got((8L, 5L)) == 1L, "mixed dim surfaces as its own row")
    assert(got((3L, -1L)) == 1L, "null-element vector takes the sentinel bucket")
  }
}
