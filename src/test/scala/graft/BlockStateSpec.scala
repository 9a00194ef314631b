package graft

import graft.ops.BlockState
import graft.queries.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops.BlockState — incremental repeated-passage removal: probes must
  * equal the full q110 recompute over corpus ∪ batch restricted to
  * the batch, drops must accumulate (a batch can push a corpus block
  * over the threshold), the frozen block geometry must be enforced
  * loudly, and the corpus-sized state must never shuffle on the probe
  * path.
  */
class BlockStateSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  private def docsAll = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("probe ≡ full recompute restricted to the batch, across two committed drops") {
    val corpus = docsAll.filter(col("doc_id") % 4 =!= 0)
    val drop1 = docsAll.filter(col("doc_id") % 8 === 0)
    val drop2 = docsAll.filter(col("doc_id") % 8 === 4)
    val dir = java.nio.file.Files.createTempDirectory("blockstate").toString

    BlockState.save(corpus, dir)
    val got1 = rows(BlockState.probe(drop1, dir))
    val full1 = rows(Curation.removeBoilerplateBlocks(corpus.union(drop1))
      .filter(col("doc_id") % 8 === 0))
    assert(got1 == full1,
      s"drop1 diverged: ${(got1.toSet -- full1.toSet).take(3)}")

    val got2 = rows(BlockState.probe(drop2, dir))
    val full2 = rows(
      Curation.removeBoilerplateBlocks(corpus.union(drop1).union(drop2))
        .filter(col("doc_id") % 8 === 4))
    assert(got2 == full2,
      s"drop2 diverged: ${(got2.toSet -- full2.toSet).take(3)}")
  }

  test("a batch block crossing the threshold via corpus counts is dropped") {
    import spark.implicits._
    val nav = (1 to 10).map(i => s"nav$i").mkString(" ")
    val corpus = Seq(
      (1L, nav + " " + (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, nav + " " + (1 to 12).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, nav + " " + (1 to 12).map(i => s"c$i").mkString(" ")),
      (11L, (1 to 12).map(i => s"d$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("blockstate-x").toString
    BlockState.save(corpus, dir)
    // nav appears in 2 corpus docs + 1 batch doc = 3 ≥ minDocs: the
    // batch copy drops; the batch-only unique doc is untouched
    val got = rows(BlockState.probe(batch, dir))
    assert(got(10L)._2 == 1L &&
      got(10L)._3 == (1 to 12).map(i => s"c$i").mkString(" "), s"got $got")
    assert(got(11L)._2 == 0L)
  }

  test("geometry guard: probing at a different block width fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("blockstate-g").toString
    BlockState.save(docsAll.limit(10), dir, blockTokens = 10)
    val e = intercept[IllegalArgumentException] {
      BlockState.probe(docsAll.limit(5), dir, blockTokens = 8)
    }
    assert(e.getMessage.contains("frozen at 10"), e.getMessage)
  }

  test("the corpus state never shuffles on the probe path (plan assertion)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val dir = java.nio.file.Files.createTempDirectory("blockstate-plan").toString
    BlockState.save(docsAll.filter(col("doc_id") % 4 =!= 0), dir)
    val probeBhs = Seq(1L, 2L, 3L).toDF("bh").localCheckpoint()
    val plan = BlockState.relevantState(spark, dir, probeBhs)
      .queryExecution.sparkPlan
    def shufflesOutsideBroadcast(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: BroadcastExchangeLike => Nil
      case s: ShuffleExchangeLike => s +: s.children.flatMap(shufflesOutsideBroadcast)
      case other => other.children.flatMap(shufflesOutsideBroadcast)
    }
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty, plan.toString)
    assert(shufflesOutsideBroadcast(plan).isEmpty, plan.toString)
  }

  test("pre-child-dir flat state fails loudly and adoptFlat migrates it") {
    import graft.ops.Layouts
    val corpus = docsAll.filter(col("doc_id") % 4 =!= 0)
    val batch = docsAll.filter(col("doc_id") % 8 === 0)
    val dir = java.nio.file.Files.createTempDirectory("blockstate-flat").toString
    BlockState.save(corpus, dir)
    val want = rows(BlockState.probe(batch, dir, commit = false))
    // regress the layout to the pre-child-dir era: data files flat
    // under $dir/blocks (what a round-8 save left behind)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val blocks = new org.apache.hadoop.fs.Path(s"$dir/blocks")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/blocks/base"))
      .foreach(st => require(fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(blocks, st.getPath.getName))))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/blocks/base"), true)
    // a probe against the old layout must NOT read as empty state —
    // that would pass boilerplate through unremoved, silently
    val e = intercept[IllegalArgumentException] {
      BlockState.probe(batch, dir, commit = false).collect()
    }
    assert(e.getMessage.contains("adoptFlat"), e.getMessage)
    // migration restores the exact pre-regression probe results
    Layouts.adoptFlat(spark, s"$dir/blocks")
    assert(rows(BlockState.probe(batch, dir, commit = false)) == want)
  }
}
