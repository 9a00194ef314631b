package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical inverted index AT REST — the exact-search twin of the ANN
  * layouts ([[IvfIndex]]/[[IvfPq]]/[[AnnIndex]]): posting rows
  * (tok, doc_id, tf, dl) persisted sorted by token, probed by term
  * list, scoring the q95 BM25 algebra FROM THE INDEX instead of
  * rescanning the corpus — the Lucene-shaped artifact a production
  * retrieval stack keeps beside its vector index (q115 fuses both
  * legs; this makes the lexical leg index-served).
  *
  * Determinism contract: [[search]] reproduces q95's output
  * BIT-FOR-BIT (same exact-integer tf/df/dl/sum_dl/nd, same
  * fixed-order per-document fold), so q129 reuses q95's oracle SQL
  * verbatim — the index provably changes the ACCESS PATH, not one
  * double of the answer.
  *
  * State shape: a [[Layouts.liveChildren]] child-dir layout —
  * `post/base` from [[save]], `post/b<id>` per drop (NEW doc_ids
  * only, the q112 drop contract; postings are disjoint across
  * children so the merged view is plain concatenation), each written
  * token-sorted so the term probe prunes row groups under the pushed
  * `In(tok, …)` filter. df is NOT stored: it is counted over the
  * pruned probe rows at search time, so appends can never leave a
  * stale df behind. The two corpus scalars BM25 needs (Σdl, n_docs)
  * live as one-row parquet children under `stats/` with the same
  * child names — a replayed drop overwrites BOTH its children
  * idempotently, so exactly-once needs no marker (the
  * [[graft.streaming.StreamCms]] argument).
  *
  * 100 TB shape: build is the one (doc, tok) shuffle q95 pays anyway;
  * a probe reads only the query terms' row groups plus k tiny stats
  * files; a drop costs O(|batch|) with no corpus rescan.
  */
object LexIndex {

  /** (tok, doc_id, tf, dl) posting rows of a (doc_id, text) frame —
    * q95's exact tokenization and counts.
    */
  def postings(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z]+'), x -> x <> '')")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dl = wc.groupBy(col("doc_id")).agg(sum(col("tf")).cast("long").as("dl"))
    wc.join(dl, "doc_id").select(col("tok"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Build the index from the current corpus. */
  def save(docs: DataFrame, path: String): Unit =
    writeChild(docs, path, "base")

  /** Fold a drop of NEW documents in — one idempotent pair of child
    * overwrites per `batchId` (postings + stats), O(|batch|).
    */
  def append(batch: DataFrame, path: String, batchId: Long): Unit =
    writeChild(batch, path, s"b$batchId")

  private def writeChild(docs: DataFrame, path: String, child: String): Unit = {
    val post = postings(docs)
      .repartition(col("tok"))
      .sortWithinPartitions("tok", "doc_id")
      .localCheckpoint() // feeds the posting write AND the stats agg
    post.write.mode("overwrite").parquet(s"$path/post/$child")
    post.select(col("doc_id"), col("dl")).distinct()
      .agg(sum(col("dl")).cast("long").as("sum_dl"),
        count(lit(1)).cast("long").as("nd"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/stats/$child")
    Checkpoints.release(post)
  }

  /** BM25 scores for `terms` served from the index — output
    * (doc_id, dl, n_qterms, score), bit-identical to q95's corpus
    * scan. `k > 0` keeps the global top-k (TakeOrderedAndProject);
    * `k = 0` returns every matching document (q95's shape).
    */
  def search(spark: SparkSession, path: String, terms: Seq[String], k: Int = 0): DataFrame = {
    val post = Layouts
      .readChildren(spark, s"$path/post", "tok STRING, doc_id BIGINT, tf BIGINT, dl BIGINT")
      .filter(col("tok").isin(terms: _*))
    val df = post.groupBy(col("tok")).agg(count(lit(1)).cast("long").as("df"))
    val stats = Layouts
      .readChildren(spark, s"$path/stats", "sum_dl BIGINT, nd BIGINT")
      .agg(sum(col("sum_dl")).cast("long").as("sum_dl"),
        sum(col("nd")).cast("long").as("nd"))
    val scored = post.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok").as("w"), col("dl"),
        ((col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") /
              (col("sum_dl").cast("double") / col("nd").cast("double"))))) *
          ((col("nd").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)))).as("ts"))
      .groupBy(col("doc_id"))
      .agg(
        max(col("dl")).as("dl"),
        count(lit(1)).cast("long").as("n_qterms"),
        sort_array(collect_list(struct(col("w"), col("ts")))).as("xs"))
      .select(col("doc_id"), col("dl"), col("n_qterms"),
        expr("aggregate(xs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.ts)").as("score"))
    if (k > 0) scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    else scored
  }

  /** Fold the accumulated children back to one per root — postings
    * concatenate (disjoint docs), stats re-sum; [[Layouts.foldChildren]]'s
    * crash-safe protocol on both roots.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    Layouts.foldChildren(spark, s"$path/post", identity)
    Layouts.foldChildren(spark, s"$path/stats",
      _.agg(sum(col("sum_dl")).cast("long").as("sum_dl"),
        sum(col("nd")).cast("long").as("nd")))
  }
}
