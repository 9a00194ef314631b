package graft

import org.apache.spark.sql.functions._

/** q189_scd2_merge: structural invariants of a type-2 history plus
  * cross-consistency with q178's change mask on the same carved
  * versions — the two operators read the same reconcile, so their
  * verdicts must agree row for row.
  */
class Scd2Spec extends SparkSuite {

  test("history invariants + agreement with the q178 change mask") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("q189_scd2_merge")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6)))
    val byDoc = hist.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      // at most one current row; ver_to is null IFF current
      assert(rows.count(_._5 == 1L) <= 1, s"doc $id: multiple current rows")
      rows.foreach { r =>
        assert((r._4.isEmpty) == (r._5 == 1L), s"doc $id: open/current mismatch")
      }
      // two-row docs are a closed v1 chained to an open v2
      if (rows.length == 2) {
        val Seq(a, b) = rows.sortBy(_._3).toSeq
        assert(a._3 == 1L && a._4.contains(2L) && a._5 == 0L)
        assert(b._3 == 2L && b._4.isEmpty && b._5 == 1L)
      } else assert(rows.length == 1, s"doc $id: ${rows.length} rows")
    }
    // agreement with q178: changed docs are exactly the 2-row docs;
    // removed docs are the closed-single-row docs; added docs the
    // open v2-only docs; unchanged docs appear in the history (open
    // v1) but not in q178's delta
    val mask = SparkEntry.queries("q178_column_diff")(spark, dir)
      .select($"doc_id", $"status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val changed = byDoc.filter(_._2.length == 2).keySet
    val removedH = byDoc.filter { case (_, rs) =>
      rs.length == 1 && rs.head._3 == 1L && rs.head._4.contains(2L) }.keySet
    val addedH = byDoc.filter { case (_, rs) =>
      rs.length == 1 && rs.head._3 == 2L }.keySet
    assert(changed == mask.filter(_._2 == "changed").keySet)
    assert(removedH == mask.filter(_._2 == "removed").keySet)
    assert(addedH == mask.filter(_._2 == "added").keySet)
    val unchangedH = byDoc.keySet -- changed -- removedH -- addedH
    assert(unchangedH.nonEmpty && unchangedH.forall(!mask.contains(_)),
      "unchanged docs must carry an open v1 row and be absent from the delta")
  }
}
