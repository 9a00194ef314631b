package graft

/** q155_readability (Flesch reading-ease): hand-countable texts pin
  * the sentence/word/vowel-group algebra — punctuation-free text
  * floors at one sentence, digit-only text is excluded (no words) —
  * and the score must equal the identical IEEE op chain in the JVM.
  */
class ReadabilitySpec extends SparkSuite {

  private def fixture: Seq[(Long, String)] = Seq(
    (0L, "The cat sat. The dog ran!"),   // 2 sentences, 6 words, 6 syllables
    (1L, "beautiful orange"),            // 1 (floor), 2 words, 3+3 syllables
    (2L, "no punctuation here at all"),  // floor sentence
    (3L, "123 456 789"))                 // no words: excluded

  private def replica(t: String): Option[(Long, Long, Long, Double)] = {
    val sents = math.max(t.split("[.!?]+").map(_.trim).count(_.nonEmpty), 1).toLong
    val ws = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    if (ws.isEmpty) return None
    val syl = ws.map(w => math.max(w.split("[^aeiou]+").count(_.nonEmpty), 1).toLong).sum
    val flesch = 206.835 -
      1.015 * (ws.length.toDouble / sents.toDouble) -
      84.6 * (syl.toDouble / ws.length.toDouble)
    Some((sents, ws.length.toLong, syl, flesch))
  }

  test("hand counts, floors, exclusion, and bit-exact scores") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("read").toString
    fixture.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q155_readability")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L), s"doc 3 must be excluded: ${got.keySet}")
    // hand counts (the replica re-derives them; both must agree)
    assert(got(0L)._1 == 2L && got(0L)._2 == 6L && got(0L)._3 == 6L, got(0L))
    assert(got(1L)._1 == 1L && got(1L)._2 == 2L && got(1L)._3 == 6L, got(1L))
    fixture.foreach { case (id, t) =>
      replica(t) match {
        case Some(w) => assert(got(id) == w, s"doc $id: ${got(id)} != $w")
        case None    => assert(!got.contains(id))
      }
    }
  }
}
