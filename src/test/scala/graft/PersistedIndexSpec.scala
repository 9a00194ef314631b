package graft

import java.nio.file.Files

import graft.ops.{AnnIndex, IvfIndex, IvfPq, PqIndex}
import org.apache.spark.sql.functions._

/** The at-rest index layouts promised by the AnnIndex/IvfIndex/PqIndex
  * scaladocs: saving the sign-LSH index `bucketBy(bkey)` makes a probe
  * prune buckets (`SelectedBucketsCount` in the scan) with no shuffle on
  * the index side; saving the IVF index `partitionBy(cell)` makes a
  * probe prune partitions (`PartitionFilters`); saving the PQ codes
  * `bucketBy(vec_id)` gives the ADC probe a direct scan of the
  * compressed frame with the per-partition shortlist reduction sitting
  * straight on it. All persisted probes must return exactly what the
  * in-memory probe returns.
  */
class PersistedIndexSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def vectors = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def queries = vectors.orderBy("vec_id").limit(5)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("qid", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** The plan text between the candidate join and the index scan — the
    * path that must be exchange-free (post-join exchanges on the small
    * candidate set are legitimate).
    */
  private def scanToJoin(plan: String): String = {
    val start = plan.indexOf("BroadcastHashJoin")
    val end = plan.indexOf("BroadcastExchange", start)
    assert(start >= 0 && end > start, s"unexpected plan shape:\n$plan")
    plan.substring(start, end)
  }

  test("bucketBy-persisted sign-LSH index probes with bucket pruning and no index-side shuffle") {
    spark.sql("DROP TABLE IF EXISTS ann_idx")
    AnnIndex.save(vectors, dim = 64, tableName = "ann_idx", numBuckets = 64)

    val probed = AnnIndex.topKFromTable(spark, "ann_idx", queries, k = 10, dim = 64)
    val result = rows(probed)
    val plan = probed.queryExecution.executedPlan.toString

    // bucket pruning engaged: the scan reads a strict subset of buckets
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in plan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"probe read every bucket: ${sel.get.matched}")

    // the index side must not shuffle: between the candidate join and
    // the bucketed index scan there is no exchange (the probe side is
    // the broadcast)
    assert(scanToJoin(plan).contains("FileScan parquet spark_catalog.default.ann_idx"),
      s"join does not read the persisted index directly:\n$plan")
    assert(!scanToJoin(plan).contains("Exchange"),
      s"index side shuffles on probe:\n$plan")

    // and the persisted probe agrees exactly with the in-memory probe
    assert(result === rows(AnnIndex.topK(spark, vectors, queries, k = 10, dim = 64)))
    assert(result.nonEmpty)
  }

  test("partitionBy-persisted IVF index probes with partition pruning") {
    val path = Files.createTempDirectory("ivf-idx").toString
    val centroids = IvfIndex.train(vectors, k = 16, iters = 3, dim = 64)
    IvfIndex.save(vectors, centroids, path)

    val probed = IvfIndex.topKFromSaved(spark, path, centroids, queries, k = 10, nprobe = 4)
    val result = rows(probed)
    val plan = probed.queryExecution.executedPlan.toString

    // the cell IN-filter must reach the scan as a partition filter
    // (Spark then lists/reads only those cell= directories)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n$plan")
    assert(!scanToJoin(plan).contains("Exchange"),
      s"index side shuffles on probe:\n$plan")

    // persisted probe equals in-memory probe (same centroids, same data)
    assert(result === rows(IvfIndex.topK(spark, vectors, queries,
      k = 10, numCells = 16, nprobe = 4, iters = 3, dim = 64)))
    assert(result.nonEmpty)
  }

  test("bucketBy-persisted PQ codes probe with no exchange below the partial top-k") {
    spark.sql("DROP TABLE IF EXISTS pq_codes")
    spark.sql("DROP TABLE IF EXISTS pq_codebook")
    val model = PqIndex.train(vectors, m = 8, k = 16, dim = 64, iters = 4)
    PqIndex.save(vectors, model, "pq_codes", "pq_codebook")

    val probed = PqIndex.topKFromSaved(
      spark, "pq_codes", "pq_codebook", vectors, queries, k = 10)
    val result = rows(probed)
    val plan = probed.queryExecution.executedPlan.toString

    // the probe ADC-scans the persisted code frame — encoding never re-runs
    val scanIdx = plan.indexOf("FileScan parquet spark_catalog.default.pq_codes")
    assert(scanIdx >= 0, s"probe does not read the persisted codes:\n$plan")

    // the bounded per-query shortlist heap sits DIRECTLY on that scan:
    // no exchange between the codes scan and the MapPartitions reduce,
    // so the full |corpus|x|queries| distance stream never shuffles
    val mpIdx = plan.lastIndexOf("MapPartitions", scanIdx)
    assert(mpIdx >= 0, s"no per-partition shortlist reduction over the codes scan:\n$plan")
    assert(!plan.substring(mpIdx, scanIdx).contains("Exchange"),
      s"codes side shuffles below the shortlist reduction:\n$plan")

    // exact re-rank streams the float corpus with the shortlist broadcast
    assert(!scanToJoin(plan).contains("Exchange"),
      s"corpus side shuffles on probe:\n$plan")

    // persisted probe equals in-memory probe (training is deterministic,
    // so the saved codebook IS the codebook topK would retrain)
    assert(result === rows(PqIndex.topK(spark, vectors, queries, k = 10)))
    assert(result.nonEmpty)
  }

  test("partitionBy-persisted IVF-PQ codes probe with partition pruning and no re-encode") {
    spark.sql("DROP TABLE IF EXISTS ivfpq_cells")
    spark.sql("DROP TABLE IF EXISTS ivfpq_codebook")
    val path = Files.createTempDirectory("ivfpq-idx").toString
    val model = IvfPq.train(vectors, kCells = 8, m = 8, kSub = 16, dim = 64, iters = 4)
    IvfPq.save(vectors, model, path, "ivfpq_cells", "ivfpq_codebook")

    val probed = IvfPq.topKFromSaved(
      spark, path, "ivfpq_cells", "ivfpq_codebook", vectors, queries, k = 10)
    val result = rows(probed)
    val plan = probed.queryExecution.executedPlan.toString

    // the probed-cell IN-filter must reach the codes scan as a
    // partition filter (only those cell= directories are listed/read)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n$plan")
    // the shortlist heap sits directly on the pruned codes scan: the
    // tree prints top-down, so the codes FileScan is the next scan
    // BELOW the MapPartitions reduce, with no Exchange in between
    val mpIdx = plan.indexOf("MapPartitions")
    val scanIdx = plan.indexOf("FileScan parquet", mpIdx)
    assert(mpIdx >= 0 && scanIdx > mpIdx &&
      !plan.substring(mpIdx, scanIdx).contains("Exchange"),
      s"codes side shuffles below the shortlist reduction:\n$plan")

    // persisted probe equals in-memory probe (both trainings are
    // deterministic, so the saved models ARE what topK would retrain)
    assert(result === rows(IvfPq.topK(spark, vectors, queries, k = 10)))
    assert(result.nonEmpty)
  }
}
