package graft

import graft.ops.{AnnIndex, Multimodal}
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("codegen'd cosine_sim is bit-identical to the fold formulation") {
    graft.functions.CosineSim.register(spark)
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(col("a.embedding").as("ea"), col("b.embedding").as("eb"))
    val both = pairs.select(
      expr("cosine_sim(ea, eb)").as("native"),
      expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        + " / (sqrt(aggregate(zip_with(ea, ea, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        + " * sqrt(aggregate(zip_with(eb, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("cosine_sim edge semantics match the HOF form: length mismatch is NULL") {
    graft.functions.CosineSim.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS s")
      .collect()(0)
    assert(r.isNullAt(0), "length-mismatched vectors must yield NULL")
  }

  test("minhash_longs equals the builtin md5-hex-prefix formulation bit-for-bit") {
    graft.functions.MinHashLongs.register(spark)
    import spark.implicits._
    val g = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(expr(
        "transform(sequence(1, length(substring(text,1,60))-4), i -> substring(substring(text,1,60), i, 5))")).as("g"))
    val both = g.select(
      expr("minhash_longs(g, 8)").as("hs"),
      array((1 to 8).map(j =>
        expr(s"CAST(conv(substr(md5(concat('$j', '|', g)), 1, 15), 16, 10) AS BIGINT)")): _*).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("LSH ANN recall@10 vs exact brute-force baseline") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val approx = AnnIndex.topK(spark, e.select($"vec_id", $"embedding"), queries, k = 10)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q25_ann_topk")(spark, sf)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(s"recall@10 = $recall (${(approx & exact).size}/${exact.size})")
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("IVF ANN recall@10 vs exact brute-force baseline") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val approx = graft.ops.IvfIndex.topK(
      spark, e.select($"vec_id", $"embedding"), queries, k = 10)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q25_ann_topk")(spark, sf)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall (${(approx & exact).size}/${exact.size})")
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // determinism: same corpus → identical index/results
    val again = graft.ops.IvfIndex.topK(
      spark, e.select($"vec_id", $"embedding"), queries, k = 10)
      .select($"qid", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === approx)
  }

  test("multimodal decode contract: schema, determinism, batch shape") {
    import spark.implicits._
    val media = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", encode($"text", "UTF-8").as("media"),
        lit("text/plain").as("mime_hint"))
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === media.count())
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(_.doc_id).sorted === again.map(_.doc_id).sorted)
    val byId = again.map(f => f.doc_id -> f).toMap
    rows.foreach { f =>
      val g = byId(f.doc_id)
      assert(f.feature.toSeq === g.feature.toSeq)
      assert(f.n_bytes === g.n_bytes)
      assert(f.feature.length === 8)
      assert(f.width >= 16 && f.height >= 16)
    }
    // frame sampling stub keeps doc partitioning shape
    val frames = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.count() > 0)
    assert(frames.columns.toSeq === Seq("doc_id", "frame_no", "frame_bytes"))
  }
}
