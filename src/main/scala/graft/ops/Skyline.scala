package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto-optimal set) over BIGINT objective
  * columns, all maximized — callers negate a dimension to minimize
  * it. Row b DOMINATES row a iff b ≥ a on every objective and b > a
  * on at least one; the skyline is the undominated set (ties —
  * identical objective vectors — dominate neither way, so both
  * survive, matching the SQL NOT EXISTS oracle form).
  *
  * Two-phase distributed shape (Börzsönyi et al. 2001's block-nested
  * skyline, partitioned):
  *
  *  1. LOCAL PRUNE — one mapPartitions pass keeps each partition's
  *     own skyline. Sound because domination is checked against a
  *     SUBSET: a globally undominated row is undominated in its
  *     partition, so phase 1 never loses a skyline member; it only
  *     sheds locally-dominated rows. On anti-correlated data the
  *     local skyline can stay large (worst case the whole partition);
  *     on anything real it collapses the corpus to candidate-sized.
  *  2. GLOBAL FILTER — candidates anti-joined against themselves on
  *     the domination predicate. The candidate frame is measured
  *     (localCheckpoint + count) and the build side broadcast only
  *     under the row budget — the q131 lesson: above it the plain
  *     join stands and AQE decides.
  *
  * A self-row never dominates itself (the strict-> clause), so no
  * key exclusion is needed in the anti-join.
  */
object Skyline {

  /** Broadcast the candidate set only below this row count. */
  val BroadcastCandRows: Long = 1L << 20

  /** The skyline of `df` maximizing every column in `dims` (BIGINT).
    * Returns `df`'s schema unchanged, skyline rows only.
    */
  def of(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one objective")
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex)
    val enc = Encoders.row(schema)
    // phase 1: block-nested local skyline, O(rows · |local skyline|)
    val local = df.mapPartitions { it =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Row)]
      it.foreach { r =>
        val v = idx.map(r.getLong).toArray
        var dominated = false
        var i = 0
        while (i < buf.length && !dominated) {
          val w = buf(i)._1
          var geAll = true; var gtAny = false; var j = 0
          while (j < v.length) {
            if (w(j) < v(j)) geAll = false
            if (w(j) > v(j)) gtAny = true
            j += 1
          }
          if (geAll && gtAny) dominated = true
          else {
            // drop buffered rows the newcomer dominates
            var leAll = true; var ltAny = false; var k = 0
            while (k < v.length) {
              if (w(k) > v(k)) leAll = false
              if (w(k) < v(k)) ltAny = true
              k += 1
            }
            if (leAll && ltAny) { buf.remove(i); i -= 1 }
          }
          i += 1
        }
        if (!dominated) buf += ((v, r))
      }
      buf.iterator.map(_._2)
    }(enc)
    // phase 2: candidates vs candidates — left_anti on domination
    val cand = local.localCheckpoint()
    val other = cand.select(dims.map(d => col(d).as(s"__sky_$d")): _*)
    val otherJ =
      if (cand.count() <= BroadcastCandRows) broadcast(other) else other
    val geAll = dims.map(d => col(s"__sky_$d") >= col(d)).reduce(_ && _)
    val gtAny = dims.map(d => col(s"__sky_$d") > col(d)).reduce(_ || _)
    cand.join(otherJ, geAll && gtAny, "left_anti")
  }
}
