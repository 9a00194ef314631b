package graft

import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

/** IvfIndex.appendSaved — incremental index maintenance: appending a
  * new drop under the frozen quantizer must be probe-identical to
  * rebuilding the whole layout, and must not break the partition
  * pruning the at-rest layout exists for.
  */
class IndexAppendSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("append = rebuild under the same frozen centroids") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = all.filter($"vec_id" < 400)
    val drop = all.filter($"vec_id" >= 400)
    val cents = IvfIndex.train(all, k = 8, iters = 3, dim = 64)

    val incDir = java.nio.file.Files.createTempDirectory("ivf-incremental").toString
    IvfIndex.save(base, cents, incDir)
    IvfIndex.appendSaved(drop, cents, incDir)
    val rebuildDir = java.nio.file.Files.createTempDirectory("ivf-rebuild").toString
    IvfIndex.save(all, cents, rebuildDir)

    // the appended layout holds exactly the union, cell for cell
    val incCells = spark.read.parquet(incDir).groupBy($"cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rebCells = spark.read.parquet(rebuildDir).groupBy($"cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(incCells == rebCells, s"cell populations diverged: $incCells vs $rebCells")

    // probe equivalence, row for row (same sims, same ranks)
    val queries = all.filter($"vec_id" < 5)
    def probe(path: String) =
      IvfIndex.topKFromSaved(spark, path, cents, queries, k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(probe(incDir) == probe(rebuildDir))

    // pruning survives the append: the probe's cell IN-filter still
    // reaches the scan as a partition filter on the merged directories
    val someCell = incCells.keys.min
    val plan = spark.read.parquet(incDir).filter($"cell" === someCell)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning after append:\n$plan")
  }

  test("IvfPq.appendSaved: compressed-layout append = rebuild, probe for probe") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = all.filter($"vec_id" < 400)
    val drop = all.filter($"vec_id" >= 400)
    val model = graft.ops.IvfPq.train(all, kCells = 4, m = 8, kSub = 8, dim = 64, iters = 2)

    val incDir = java.nio.file.Files.createTempDirectory("ivfpq-incremental").toString
    graft.ops.IvfPq.save(base, model, incDir, "iapp_cells", "iapp_codebook")
    graft.ops.IvfPq.appendSaved(drop, model, incDir)
    val rebuildDir = java.nio.file.Files.createTempDirectory("ivfpq-rebuild").toString
    graft.ops.IvfPq.save(all, model, rebuildDir, "iapp_cells2", "iapp_codebook2")

    val queries = all.filter($"vec_id" < 5)
    def probe(path: String, ct: String, cb: String) =
      graft.ops.IvfPq.topKFromSaved(spark, path, ct, cb, all, queries, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(probe(incDir, "iapp_cells", "iapp_codebook") ==
      probe(rebuildDir, "iapp_cells2", "iapp_codebook2"))
  }

  test("compactSaved bounds per-cell file count; probe identical, pruning intact") {
    import spark.implicits._
    import graft.ops.Layouts
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val cents = IvfIndex.train(all, k = 8, iters = 3, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivf-compact").toString

    // one save + 4 daily drops → up to 5 file sets per cell directory
    IvfIndex.save(all.filter($"vec_id" < 200), cents, dir)
    (0 until 4).foreach { d =>
      IvfIndex.appendSaved(
        all.filter($"vec_id" >= 200 + d * 100 && $"vec_id" < 300 + d * 100), cents, dir)
    }
    val before = Layouts.dataFilesPerPartition(spark, dir, "cell")
    assert(before.values.exists(_ > 1),
      s"fixture never accumulated small files: $before")

    val queries = all.filter($"vec_id" < 5)
    def probe() =
      IvfIndex.topKFromSaved(spark, dir, cents, queries, k = 10, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val pre = probe()

    IvfIndex.compactSaved(spark, dir)
    val after = Layouts.dataFilesPerPartition(spark, dir, "cell")
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compact left multiple data files in a cell dir: $after")
    assert(after.keySet == before.keySet, "compact changed the cell directory set")
    assert(probe() == pre, "compact changed probe results")

    // pruning survives the rewrite
    val someCell = 0
    val plan = spark.read.parquet(dir).filter($"cell" === someCell)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"no partition pruning after compact:\n$plan")

    // same contract on the compressed layout
    val model = graft.ops.IvfPq.train(all, kCells = 4, m = 8, kSub = 8, dim = 64, iters = 2)
    val pqDir = java.nio.file.Files.createTempDirectory("ivfpq-compact").toString
    graft.ops.IvfPq.save(all.filter($"vec_id" < 500), model, pqDir, "cmp_cells", "cmp_codebook")
    graft.ops.IvfPq.appendSaved(all.filter($"vec_id" >= 500), model, pqDir)
    def pqProbe() =
      graft.ops.IvfPq.topKFromSaved(spark, pqDir, "cmp_cells", "cmp_codebook", all, queries, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val pqPre = pqProbe()
    graft.ops.IvfPq.compactSaved(spark, pqDir)
    val pqAfter = Layouts.dataFilesPerPartition(spark, pqDir, "cell")
    assert(pqAfter.nonEmpty && pqAfter.values.forall(_ == 1), s"IvfPq compact: $pqAfter")
    assert(pqProbe() == pqPre, "IvfPq compact changed probe results")
  }
}
