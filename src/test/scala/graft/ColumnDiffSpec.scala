package graft

import org.apache.spark.sql.functions._

/** q178_column_diff: doc_ids chosen to hit every diff class — the
  * version carving is deterministic in doc_id, so each class is a
  * congruence pick: removed (%13=5 drops it from v2), added (%11=3
  * absent from v1), changed-text (%9=2), changed-source (%17=1),
  * unchanged (none of the above → filtered out of the output).
  */
class ColumnDiffSpec extends SparkSuite {

  test("every diff class lands in its row; unchanged docs are absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snapdiff").toString
    // 5=removed (5%13=5), 3=added (3%11=3), 2=changed text (2%9=2),
    // 35=changed source (35%17=1; 35%13=9, %11=2, %9=8 keep it clean
    // elsewhere), 7=unchanged
    val docs = Seq(5L, 3L, 2L, 35L, 7L)
      .map(id => (id, s"text-$id", "en", s"src-$id", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q178_column_diff")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.size == 4, s"rows: $got")
    assert(got(5L) == (("removed", 0L, 0L, 0L)))
    assert(got(3L) == (("added", 0L, 0L, 0L)))
    assert(got(2L) == (("changed", 1L, 0L, 0L)))
    assert(got(35L) == (("changed", 0L, 0L, 1L)))
    assert(!got.contains(7L))
  }
}
