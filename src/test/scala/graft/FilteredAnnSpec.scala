package graft

import graft.ops.IvfPq
import org.apache.spark.sql.functions._

/** Filtered ANN on the compressed at-rest layout: metadata columns
  * ride in the code frame, the probe predicate prunes candidates
  * BEFORE the ADC heaps (PushedFilters next to the cell
  * PartitionFilters in the SAME scan), every result matches the
  * predicate, k fills, and recall holds against the exact filtered
  * top-k (q104's semantics).
  */
class FilteredAnnSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("predicate prunes in-scan, k fills with matching candidates, recall >= 0.6") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
    val model = IvfPq.train(all, kCells = 4, m = 8, kSub = 8, dim = 64, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-filtered").toString
    IvfPq.save(all, model, dir, "fann_cells", "fann_codebook", metaCols = Seq("label"))

    val queries = all.filter($"vec_id" < 5)
    val pred = col("label") <= 4
    val k = 10
    val got = IvfPq.topKFromSaved(spark, dir, "fann_cells", "fann_codebook",
      all, queries, k = k, nprobe = 3, predicate = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // every result matches the predicate, and k fills per query
    val okIds = all.filter(pred).select($"vec_id").as[Long].collect().toSet
    assert(got.forall { case (_, v) => okIds.contains(v) },
      s"result outside the predicate: ${got.filterNot(t => okIds.contains(t._2))}")
    val perQ = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQ.size == 5 && perQ.values.forall(_ == k),
      s"k did not fill per query: $perQ")

    // recall vs the exact filtered top-k (q104 semantics, same fixture)
    graft.functions.CosineSim.register(spark)
    val qs = queries.select($"vec_id".as("qid"), $"embedding".as("qe"))
    val exact = all.filter(pred).crossJoin(broadcast(qs))
      .filter($"vec_id" =!= $"qid")
      .withColumn("sim", expr("cosine_sim(embedding, qe)"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)))
      .filter($"rk" <= k)
      .select($"qid", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.6, s"filtered recall@$k = $recall")

    // the predicate reaches the SAME pruned scan the probe executes:
    // label in PushedFilters, the probed-cell isin as PartitionFilters
    val probedCells = Seq(0, 1)
    val plan = IvfPq.savedCodes(spark, dir, Some(pred))
      .filter($"cell".isin(probedCells.map(Int.box): _*))
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).isDefined,
      s"metadata predicate not pushed to the codes scan:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell pruning lost on the filtered scan:\n$plan")
  }

  test("same contract on the bucketed sign-LSH layout (AnnIndex)") {
    import graft.ops.AnnIndex
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
    AnnIndex.save(all, dim = 64, tableName = "fann_lsh", metaCols = Seq("label"))

    val queries = all.filter($"vec_id" < 5)
    val pred = col("label") <= 4
    val k = 10
    val probed = AnnIndex.topKFromTable(spark, "fann_lsh", queries,
      k = k, dim = 64, predicate = Some(pred))
    val got = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // every result matches the predicate, and k fills per query
    val okIds = all.filter(pred).select($"vec_id").as[Long].collect().toSet
    assert(got.forall { case (_, v) => okIds.contains(v) },
      s"result outside the predicate: ${got.filterNot(t => okIds.contains(t._2))}")
    val perQ = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQ.size == 5 && perQ.values.forall(_ == k), s"k did not fill: $perQ")

    // recall vs the exact filtered top-k
    graft.functions.CosineSim.register(spark)
    val qs = queries.select($"vec_id".as("qid"), $"embedding".as("qe"))
    val exact = all.filter(pred).crossJoin(broadcast(qs))
      .filter($"vec_id" =!= $"qid")
      .withColumn("sim", expr("cosine_sim(embedding, qe)"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)))
      .filter($"rk" <= k)
      .select($"qid", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.6, s"filtered LSH recall@$k = $recall")

    // the predicate reaches the SAME bucket-pruned scan the probe
    // executes: in the probe's OWN executed plan, the fann_lsh scan
    // carries label in PushedFilters beside an engaged
    // SelectedBucketsCount (strictly below the table's bucket count)
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(_.contains("spark_catalog.default.fann_lsh"))
      .getOrElse(fail(s"probe does not read the persisted index:\n$plan"))
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(scanLine).isDefined,
      s"metadata predicate not pushed to the LSH index scan:\n$scanLine")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scanLine)
      .getOrElse(fail(s"no bucket pruning on the filtered scan:\n$scanLine"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"bucket pruning did not engage:\n$scanLine")
  }

  test("same contract on the float IVF layout (IvfIndex)") {
    import graft.ops.IvfIndex
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
    val cents = IvfIndex.train(all, k = 8, iters = 3, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivf-filtered").toString
    IvfIndex.save(all, cents, dir, metaCols = Seq("label"))

    val queries = all.filter($"vec_id" < 5)
    val pred = col("label") <= 4
    val k = 10
    val got = IvfIndex.topKFromSaved(spark, dir, cents, queries,
      k = k, nprobe = 3, predicate = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val okIds = all.filter(pred).select($"vec_id").as[Long].collect().toSet
    assert(got.forall { case (_, v) => okIds.contains(v) })
    val perQ = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQ.size == 5 && perQ.values.forall(_ == k), s"k did not fill: $perQ")
    // predicate + cell pruning land on one scan
    val plan = {
      val raw = spark.read.parquet(dir)
      raw.filter(pred).filter($"cell".isin(0, 1))
        .select($"cell", $"vec_id", $"embedding")
        .queryExecution.executedPlan.toString
    }
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(plan).isDefined, plan)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)
  }
}
