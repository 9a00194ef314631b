package graft.ops

import graft.queries.Mining
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch-vs-corpus ExactSubstr dedup — q102's winnowed
  * substring statistic in the daily-drop posture ([[Lsh.saveBands]] /
  * [[ConnectedComponents.updateLabels]]'s counterpart for substring-
  * level duplication): persist the corpus's winnowed fingerprints
  * ONCE, then score each new batch against corpus ∪ batch without
  * ever re-reading corpus text.
  *
  * State: a flat parquet dir of (fp, ndocs) partial counts (one
  * append per drop — sum per fp at read; [[Layouts.compactFlat]] on
  * the usual schedule), plus a sidecar recording the FROZEN pos
  * ladder rung and running max-grams. Freezing the rung is what makes
  * increments comparable: q102 sizes its packed (hash, pos) BIGINT
  * from the corpus max document length, and a batch fingerprinted
  * under a different rung hashes differently. A batch that would
  * widen the rung fails loudly — rebuild the state, exactly like
  * re-training a drifted ANN model ([[IndexDrift]]).
  *
  * Probe scale shape: the corpus-sized state is only ever SCANNED —
  * the batch's fingerprint set broadcasts into a left-semi that
  * restricts state scan-side, the per-fp sum then runs on a
  * batch-sized frame, and the scoring join is batch × batch.
  * O(|batch| · grams) fingerprint work + one state scan per drop.
  *
  * Equivalence contract (WinnowStateSpec): probe(batch) is row-
  * identical to [[Mining.winnowDupCoverage]] over corpus ∪ batch
  * restricted to the batch's documents, as long as the rung holds —
  * the `require` enforces exactly the condition under which the
  * full run would pick the same rung.
  */
object WinnowState {

  final case class Ladder(hashHex: Int, posMod: Long, maxGrams: Long)

  /** Build the state from the current corpus: winnow under the rung
    * the corpus itself sizes, store per-fp distinct-doc counts.
    */
  def save(docs: DataFrame, dir: String, w: Int = 8): Unit = {
    val spark = docs.sparkSession
    val maxGrams = Mining.maxGramsOf(docs)
    val (hashHex, posMod) = Mining.posLadder(maxGrams)
    Mining.selectedFingerprints(docs, w, hashHex, posMod)
      .groupBy(col("fp")).agg(countDistinct(col("doc_id")).as("ndocs"))
      .write.mode("overwrite").parquet(s"$dir/fps")
    writeLadder(spark, dir, Ladder(hashHex, posMod, maxGrams))
  }

  /** Score a batch against corpus ∪ batch and, when `commit`, fold the
    * batch's fingerprints into the state (decisions first, append
    * after — a batch never double-counts against itself). Output is
    * q102's exact schema (doc_id, n_fp, n_dup, dup_frac), batch rows
    * only.
    *
    * `sink` (streaming hook) runs with the scored frame BEFORE any
    * state write — so the one fingerprint pass feeds both the output
    * and the commit. `batchId` switches the commit from a flat append
    * into an OVERWRITE of the per-batch directory
    * `fps_stream/b<id>` — idempotent, which is what makes
    * [[graft.streaming.StreamWinnow]]'s replays exactly-once for the
    * state (a flat append replayed after a crash would double-count
    * the batch's fingerprints; an overwrite of the same directory
    * cannot).
    */
  def probe(
      batch: DataFrame,
      dir: String,
      w: Int = 8,
      commit: Boolean = true,
      batchId: Option[Long] = None,
      sink: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = batch.sparkSession
    val ladder = readLadder(spark, dir)
    val batchMax = Mining.maxGramsOf(batch)
    require(
      Mining.posLadder(math.max(batchMax, ladder.maxGrams)) ==
        ((ladder.hashHex, ladder.posMod)),
      s"batch of $batchMax grams widens the pos ladder beyond the state's " +
        s"frozen rung (posMod=${ladder.posMod}) — rebuild the state with " +
        "WinnowState.save over the full corpus")
    val sel = Mining
      .selectedFingerprints(batch, w, ladder.hashHex, ladder.posMod)
      .localCheckpoint()
    val batchNd = sel.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("bdocs"))
    // corpus-side counts for exactly the batch's fingerprints: the
    // state streams through its scan, the probe set broadcasts
    val stateNd = relevantState(spark, dir, sel.select(col("fp")).distinct())
      .groupBy(col("fp")).agg(sum(col("ndocs")).as("cdocs"))
    val totals = batchNd.join(stateNd, Seq("fp"), "left")
      .select(col("fp"),
        (col("bdocs") + coalesce(col("cdocs"), lit(0L))).as("ndocs"))
    val out = sel.join(totals, "fp")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_fp"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).cast("long").as("n_dup"))
      .withColumn("dup_frac", col("n_dup").cast("double") / col("n_fp"))
      .localCheckpoint()
    sink(out)
    if (commit) {
      val nd = batchNd.select(col("fp"), col("bdocs").as("ndocs"))
      batchId match {
        case Some(id) =>
          nd.write.mode("overwrite").parquet(s"$dir/fps_stream/b$id")
        case None =>
          nd.write.mode("append").parquet(s"$dir/fps")
      }
      if (batchMax > ladder.maxGrams)
        writeLadder(spark, dir, ladder.copy(maxGrams = batchMax))
    }
    Checkpoints.release(sel)
    out
  }

  /** The state rows for the probed fingerprints — broadcast left-semi,
    * corpus state never shuffles. Package-private for the spec's plan
    * assertion.
    */
  private[graft] def relevantState(
      spark: SparkSession, dir: String, probeFps: DataFrame): DataFrame =
    stateFps(spark, dir)
      .join(broadcast(probeFps), Seq("fp"), "left_semi")

  /** The full (fp, ndocs) state frame: the flat `fps` dir plus every
    * live per-batch streaming append. A `fps_stream` directory listed
    * in a pending-fold sidecar whose token matches the `_fold` token
    * INSIDE the current fps dir is already folded in (the fold
    * published but its deletions didn't finish) and is excluded —
    * see [[compactStream]]'s crash-safety protocol.
    */
  private[graft] def stateFps(spark: SparkSession, dir: String): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded: Set[String] = Layouts.readSidecar(fs, foldPendingPath(dir)) match {
      case Some(s) =>
        val lines = s.trim.split('\n')
        val token = lines.head
        val published = Layouts
          .readSidecar(fs, new Path(s"$dir/fps/_fold")).map(_.trim).contains(token)
        if (published) lines.tail.toSet else Set.empty
      case None => Set.empty
    }
    val streamRoot = new Path(s"$dir/fps_stream")
    val streamDirs =
      if (!fs.exists(streamRoot)) Seq.empty
      else fs.listStatus(streamRoot).toSeq
        .filter(st => st.isDirectory && !folded.contains(st.getPath.getName))
        .map(_.getPath.toString)
    val base = spark.read.parquet(s"$dir/fps")
    if (streamDirs.isEmpty) base
    else base.unionByName(
      spark.read.parquet(streamDirs: _*).select(col("fp"), col("ndocs")))
  }

  /** Fold the per-batch streaming appends into the flat `fps` dir and
    * drop them — the small-file compaction for stream-maintained
    * state. Crash-safe across the two directories involved: the new
    * fps content carries a fold token file, a pending sidecar names
    * the token and the folded batch dirs BEFORE the publish, and
    * readers ([[stateFps]]) exclude the named dirs ONLY when the
    * published fps carries the matching token — so a crash before the
    * publish changes nothing (sidecar names a token no fps dir has),
    * a crash after it cannot double-count (readers see the folded
    * dirs excluded), and re-running compactStream finishes the
    * deletions either way.
    */
  def compactStream(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // finish (or discard) a previous fold first
    Layouts.readSidecar(fs, foldPendingPath(dir)).foreach { s =>
      val lines = s.trim.split('\n')
      val token = lines.head
      val published = Layouts
        .readSidecar(fs, new Path(s"$dir/fps/_fold")).map(_.trim).contains(token)
      if (published)
        lines.tail.foreach(d => fs.delete(new Path(s"$dir/fps_stream/$d"), true))
      fs.delete(foldPendingPath(dir), false)
    }
    val streamRoot = new Path(s"$dir/fps_stream")
    if (!fs.exists(streamRoot)) return
    val dirs = fs.listStatus(streamRoot).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
    if (dirs.isEmpty) return
    val token = java.util.UUID.randomUUID().toString
    val tmp = s"$dir/fps__compact_tmp"
    stateFps(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(tmp)
    Layouts.writeSidecar(fs, new Path(s"$tmp/_fold"), s"$token\n")
    Layouts.writeSidecar(fs, foldPendingPath(dir),
      (token +: dirs).mkString("", "\n", "\n"))
    Layouts.publish(spark, s"$dir/fps", tmp)
    dirs.foreach(d => fs.delete(new Path(s"$dir/fps_stream/$d"), true))
    fs.delete(foldPendingPath(dir), false)
  }

  private def foldPendingPath(dir: String) = new Path(s"$dir/_fold_pending")

  private def ladderPath(dir: String) = new Path(s"$dir/_ladder")

  private def writeLadder(spark: SparkSession, dir: String, l: Ladder): Unit = {
    val p = ladderPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layouts.writeSidecar(fs, p, s"${l.hashHex} ${l.posMod} ${l.maxGrams}\n")
  }

  private[graft] def readLadder(spark: SparkSession, dir: String): Ladder = {
    val p = ladderPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = Layouts.readSidecar(fs, p).getOrElse(
      throw new IllegalArgumentException(
        s"no winnow state at $dir — run WinnowState.save first"))
      .trim.split(' ')
    Ladder(parts(0).toInt, parts(1).toLong, parts(2).toLong)
  }
}
