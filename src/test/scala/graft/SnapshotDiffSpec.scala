package graft

import org.apache.spark.sql.functions._

/** q112 (corpus snapshot diff): the emitted manifest is exactly the
  * planted change set — every simulated-new doc surfaces as added,
  * every retired doc as removed, every edited doc (edit actually
  * fires) as changed, and nothing else leaks through the
  * suppressed-equal filter.
  */
class SnapshotDiffSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("manifest rows are exactly the planted adds/removes/changes") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.flatMap { case (id, text) =>
      (id % 10) match {
        case 7 => Some(id -> "added")
        case 5 => Some(id -> "removed")
        case 3 if text.contains("spark") => Some(id -> "changed")
        case _ => None
      }
    }
    val got = SparkEntry.queries("q112_snapshot_diff")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected,
      s"manifest mismatch: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    // fingerprint columns: empty exactly on the missing side
    val rows = SparkEntry.queries("q112_snapshot_diff")(spark, sf)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    rows.foreach {
      case ("added", o, n)   => assert(o.isEmpty && n.nonEmpty)
      case ("removed", o, n) => assert(o.nonEmpty && n.isEmpty)
      case ("changed", o, n) => assert(o.nonEmpty && n.nonEmpty && o != n)
      case other             => fail(s"unexpected status row: $other")
    }
    // the fixture genuinely exercises all three statuses
    assert(Set("added", "removed", "changed").subsetOf(rows.map(_._1).toSet))
  }
}
