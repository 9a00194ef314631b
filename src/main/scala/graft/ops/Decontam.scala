package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination in the daily-drop posture — q137's
  * at-rest twin, completing the incremental family beside
  * [[BlockState]] (passages), [[WinnowState]] (substrings), and
  * [[Lsh.saveBands]] (near-dups): persist the evaluation set's W-gram
  * hashes ONCE, then screen every incoming drop at ingest without
  * re-reading the benchmark.
  *
  * Unlike the other incremental states this one is READ-ONLY at probe
  * time: benchmarks are versioned artifacts, not accumulating state —
  * a new benchmark version is a fresh [[save]] (rebuild, like ANN
  * retrain), so there are no per-batch children, no commit markers,
  * and no replay hazards. What IS shared is the geometry discipline:
  * the gram width is frozen by sidecar, because a probe at a
  * different W hashes different runs and would silently miss
  * contamination ([[BlockState]]'s fail-loudly posture).
  *
  * Scale shape (DecontamSpec's plan assertion): the persisted gram
  * table is benchmark-sized and BROADCASTS into the probe join; the
  * batch's gram stream flows scan-side and never shuffles — the only
  * exchange is the doc_id-keyed aggregation over rows that actually
  * hit, which is contamination-sized. Per-drop cost is
  * O(|batch| tokens) + one benchmark-table read.
  *
  * Equivalence contract (DecontamSpec): probe(batch) is row-identical
  * to q137_decontam over eval ∪ batch restricted to the batch's
  * documents.
  */
object Decontam {

  /** (doc_id, gh) W-gram hashes of a documents frame (lowercased a–z
    * tokens, stride-1 sliding window, 60-bit md5 hash of the
    * space-joined gram) — THE canonical gram generator: q137 calls
    * this same method, so query and persisted state cannot drift.
    */
  private[graft] def gramHashes(docs: DataFrame, gramTokens: Int): DataFrame = {
    val w = gramTokens
    docs
      .select(col("doc_id"), expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${w - 1}), i -> array_join(slice(toks, i, $w), ' '))")).as("g"))
      .select(col("doc_id"),
        expr(graft.queries.Selection.h60("g")).as("gh"))
  }

  /** Persist the benchmark's distinct (eval_doc, gh) gram table and
    * freeze the gram width. Overwrite semantics: a save IS the
    * benchmark version.
    */
  def save(evalDocs: DataFrame, dir: String, gramTokens: Int = 8): Unit = {
    val spark = evalDocs.sparkSession
    gramHashes(evalDocs, gramTokens)
      .select(col("doc_id").as("eval_doc"), col("gh")).distinct()
      .write.mode("overwrite").parquet(s"$dir/grams")
    // the gram table is immutable after save, so its row count is
    // geometry too: probe's broadcast gate reads it from the sidecar
    // instead of launching a count job PER PROBE (per trigger under
    // StreamDecontam — round-11 review finding)
    val nGrams = spark.read.parquet(s"$dir/grams").count()
    val p = new Path(s"$dir/_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layouts.writeSidecar(fs, p, s"$gramTokens\n$nGrams\n")
  }

  /** Broadcast the persisted gram table only below this row count —
    * the q131 lesson: an unconditional hint on a frame that can
    * outgrow executor memory OOMs instead of degrading; above the
    * budget the plain join stands and AQE decides. The count comes
    * from the geometry sidecar (frozen at save), not a per-probe job
    * — which makes gate consistency part of [[save]]'s single-writer
    * contract: a probe racing a concurrent re-save could read the OLD
    * count against the NEW grams table, but that probe is already
    * unsafe (it can read a half-overwritten grams directory) — a
    * benchmark version swap quiesces probes, same as every other
    * rebuild-class state here (ANN retrain, BlockState geometry).
    */
  val BroadcastGramRows: Long = 1L << 22

  /** Screen a batch against the persisted benchmark: q137's output
    * schema (doc_id, n_hit_grams, n_eval_docs), flagged batch docs
    * only.
    */
  def probe(batch: DataFrame, dir: String, gramTokens: Int = 8): DataFrame = {
    val spark = batch.sparkSession
    val (frozen, nGrams) = readGeometry(spark, dir)
    require(frozen == gramTokens,
      s"probe at gramTokens=$gramTokens against state frozen at $frozen — " +
        "a different width hashes different runs and silently misses " +
        "contamination; rebuild with Decontam.save or probe at the frozen width")
    val ev = spark.read.parquet(s"$dir/grams")
    // pre-sidecar states (no count line) pay the one count job;
    // either way the decision goes through the one shared gate
    val evJ = graft.Sql.broadcastIfSmall(ev, BroadcastGramRows,
      knownCount = Some(nGrams.getOrElse(ev.count())))
    gramHashes(batch, gramTokens)
      .join(evJ, "gh")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gh")).cast("long").as("n_hit_grams"),
        countDistinct(col("eval_doc")).cast("long").as("n_eval_docs"))
  }

  /** (frozen gram width, gram-table row count) — the count is absent
    * on states saved before it joined the sidecar.
    */
  private[graft] def readGeometry(
      spark: SparkSession, dir: String): (Int, Option[Long]) = {
    val p = new Path(s"$dir/_geometry")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lines = Layouts.readSidecar(fs, p).getOrElse(
      throw new IllegalArgumentException(
        s"no decontam state at $dir — run Decontam.save first"))
      .trim.split('\n').toSeq
    (lines.head.trim.toInt, lines.drop(1).headOption.map(_.trim.toLong))
  }
}
