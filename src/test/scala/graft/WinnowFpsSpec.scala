package graft

import graft.functions.{Winnow, WinnowFps, WinnowPolyFps}
import org.apache.spark.sql.functions._

/** The native winnowing expressions must produce EXACTLY the integers
  * of the declarative forms they replaced (explode + window-min +
  * distinct — the form the DuckDB oracle still replays): same md5
  * gram hash, same packed (hash, pos) BIGINT, same window minima,
  * same distinct set. Pinned here on random corpora — including
  * multibyte text, where gram boundaries must follow CHARACTER
  * semantics like SQL substring — against an independent replica
  * built from Spark builtins, plus direct unit pins of the deque
  * sliding-min + distinct kernel.
  */
class WinnowFpsSpec extends SparkSuite {

  private def declarativeFps(
      docs: org.apache.spark.sql.DataFrame,
      w: Int, hashHex: Int, posMod: Long): Set[(Long, Long)] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val grams = docs.filter(length($"t") >= 20)
      .select($"doc_id", (length($"t") - 19).cast("long").as("n_grams"),
        explode(expr(
          s"transform(sequence(1, length(t) - 19), i -> struct(CAST(i AS BIGINT) AS pos, " +
            s"CAST(conv(substr(md5(substring(t, i, 20)), 1, $hashHex), 16, 10) AS BIGINT) * ${posMod}L + i AS m))")).as("g"))
      .select($"doc_id", $"n_grams", $"g.pos".as("pos"), $"g.m".as("m"))
    val win = Window.partitionBy($"doc_id").orderBy($"pos".asc)
      .rowsBetween(Window.currentRow, w - 1)
    grams.withColumn("wmin", min($"m").over(win))
      .filter($"pos" <= $"n_grams" - (w - 1))
      .select($"doc_id", $"wmin").distinct()
      .select($"doc_id", expr(s"wmin div ${posMod}L").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("WinnowFps ≡ the declarative explode+window+distinct form, random ASCII corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // shared 40-char chunks force cross-doc duplicate grams
    val chunks = Array.fill(8)(rnd.alphanumeric.take(40).mkString)
    val docs = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(6)
      (i.toLong, Seq.fill(n)(chunks(rnd.nextInt(8))).mkString(rnd.nextInt(3) match {
        case 0 => "" ; case 1 => " " ; case _ => "xy"
      }))
    }.toDF("doc_id", "t")
    for (w <- Seq(1, 4, 8)) {
      val want = declarativeFps(docs, w, 11, 65536L)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val interp = graft.queries.Mining.selectedFingerprints(docs, w, 11, 65536L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(interp == want, s"interpreted eval, w=$w")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
      val got = graft.queries.Mining.selectedFingerprints(docs, w, 11, 65536L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"codegen eval, w=$w")
    }
  }

  test("multibyte text: gram boundaries follow character semantics like SQL substring") {
    import spark.implicits._
    val docs = Seq(
      (1L, "déjà-vu — naïve façade über café résumé — déjà-vu encore une fois"),
      (2L, "déjà-vu — naïve façade über café résumé — autre suffixe ici même"),
      (3L, "日本語のテキストはマルチバイトで、二十文字以上の長さが必要です、テスト用の文書。")
    ).toDF("doc_id", "t")
    val want = declarativeFps(docs, 4, 11, 65536L)
    val got = graft.queries.Mining.selectedFingerprints(docs, 4, 11, 65536L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("wider ladder rungs (24/32-bit pos) produce the declarative integers too") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1 to 10)
      .map(i => (i.toLong, rnd.alphanumeric.take(80).mkString)).toDF("doc_id", "t")
    for ((hh, pm) <- Seq((9, 16777216L), (7, 4294967296L))) {
      val want = declarativeFps(docs, 8, hh, pm)
      val got = graft.queries.Mining.selectedFingerprints(docs, 8, hh, pm)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"rung ($hh, $pm)")
    }
  }

  test("WinnowPolyFps ≡ the declarative rolling-hash window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(3)
    val docs = (1 to 50).map { i =>
      val n = 11 + rnd.nextInt(120)
      (i.toLong, Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString)
    }.toDF("doc_id", "s")
    val pows = Seq(27512614111L, 887503681L, 28629151L, 923521L, 29791L, 961L, 31L, 1L)
    val poly = pows.zipWithIndex
      .map { case (p, j) => s"ascii(substring(s, i + $j, 1)) * ${p}L" }
      .mkString(" + ")
    val grams = docs.select($"doc_id",
      explode(expr(
        s"transform(sequence(1, length(s) - 7), i -> struct(i AS pos, ($poly) % 2147483647 AS h))")).as("g"))
      .select($"doc_id", $"g.pos".as("pos"), $"g.h".as("h"))
    val w = Window.partitionBy($"doc_id").orderBy($"pos".asc)
      .rowsBetween(-3, Window.currentRow)
    val want = grams.withColumn("fp", min($"h").over(w))
      .filter($"pos" >= 4).select($"doc_id", $"fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.functions.WinnowPolyFps.register(spark)
    val got = docs.select($"doc_id", explode(expr("winnow_poly_fps(s, 4)")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("slidingDistinct kernel: brute-force property over random arrays") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(30)
      val w = 1 + rnd.nextInt(10)
      // small value range forces ties and repeated minima
      val m = Array.fill(n)(rnd.nextInt(6).toLong)
      val want = (0 to n - w).map(j => m.slice(j, j + w).min).distinct
      val got = Winnow.slidingDistinct(m, w).toSeq
      assert(got == want, s"n=$n w=$w m=${m.toSeq}")
    }
  }

  test("charOffsets: UTF-8 char starts, same boundaries substring cuts at") {
    val s = "aé日🙂z"
    val offs = Winnow.charOffsets(s.getBytes("UTF-8"))
    assert(offs.toSeq == Seq(0, 1, 3, 6, 10, 11))
    assert(Winnow.charOffsets(Array.emptyByteArray).toSeq == Seq(0))
  }

  test("Md5GramHashes ≡ the declarative transform, incl. multibyte and short input") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = ((1 to 40).map(i => (i.toLong, rnd.alphanumeric.take(5 + rnd.nextInt(60)).mkString)) ++
      Seq((98L, "déjà-vu — naïve façade über café résumé, encore déjà-vu"),
          (99L, "日本語のテキスト、マルチバイト文字列のテスト用。")))
      .toDF("doc_id", "t200")
    graft.functions.Md5GramHashes.register(spark)
    for ((width, hex) <- Seq((20, 15), (13, 15), (5, 8))) {
      // production call sites filter to >= one gram first (the
      // declarative sequence() turns DESCENDING below that); the
      // native expression instead returns an empty array — pinned in
      // the metadata test below
      val full = docs.filter(length($"t200") >= width)
      val want = full.select($"doc_id", explode(expr(
        s"transform(sequence(1, length(t200)-${width - 1}), i -> " +
          s"CAST(conv(substr(md5(substring(t200, i, $width)), 1, $hex), 16, 10) AS BIGINT))")).as("gh"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val got = full.select($"doc_id",
        explode(expr(s"md5_gram_hashes(t200, $width, $hex)")).as("gh"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want, s"width=$width hex=$hex")
      val short = docs.filter(length($"t200") < width)
        .select($"doc_id", expr(s"md5_gram_hashes(t200, $width, $hex)").as("gh"))
        .collect()
      short.foreach(r => assert(r.getSeq[Long](1).isEmpty))
    }
    // positions via posexplode equal the declarative struct form
    val docsW = docs.filter(length($"t200") >= 20)
    val wantP = docsW.select($"doc_id", explode(expr(
      "transform(sequence(1, length(t200)-19), i -> struct(CAST(i AS BIGINT) AS p, " +
        "CAST(conv(substr(md5(substring(t200, i, 20)), 1, 15), 16, 10) AS BIGINT) AS gh))")).as("g"))
      .select($"doc_id", $"g.p", $"g.gh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val gotP = docsW.select($"doc_id",
      posexplode(expr("md5_gram_hashes(t200, 20, 15)")).as(Seq("p0", "gh")))
      .select($"doc_id", ($"p0" + 1).cast("long"), $"gh")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(gotP == wantP)
  }

  test("expression metadata: null in → null out, empty under-w input → empty array") {
    import spark.implicits._
    graft.functions.WinnowFps.register(spark)
    graft.functions.WinnowPolyFps.register(spark)
    val df = Seq((1L, Option("short")), (2L, Option.empty[String]))
      .toDF("doc_id", "t")
      .select($"doc_id",
        expr("winnow_fps(t, 8, 11, 65536L)").as("a"),
        expr("winnow_poly_fps(t, 4)").as("b"))
      .collect()
    val byId = df.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getSeq[Long](1).isEmpty)
    assert(byId(1L).getSeq[Long](2).isEmpty)
    assert(byId(2L).isNullAt(1) && byId(2L).isNullAt(2))
  }
}
