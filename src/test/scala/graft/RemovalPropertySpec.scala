package graft

import graft.queries.{Curation, Mining}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based adversarial coverage for the two removal operators
  * (q108 span removal, q110 block boilerplate): random corpora built
  * from SHARED fragment pools (so cross-document duplication is dense
  * and overlapping), checked against independent local replicas that
  * use gram/block STRINGS instead of hashes — any hashing, windowing,
  * island-merge, or reconstruction defect in the engine diverges from
  * the replica. Fixed seeds (offline scalacheck bridge; the
  * MapReducePropertySpec convention).
  */
class RemovalPropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int, seed0: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  // ---------------------------------------------------------------- q108

  /** Local replica of removeDupSpans on (doc_id, t200) using gram
    * strings: duplicated position = 20-gram present in ≥ 2 docs with
    * this doc ≠ min-doc owner; merge overlapping positions; excise.
    */
  private def replicaSpans(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val gramDocs = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, t) =>
      (0 to t.length - 20).foreach { i =>
        gramDocs.getOrElseUpdate(t.substring(i, i + 20), scala.collection.mutable.Set.empty) += id
      }
    }
    docs.map { case (id, t) =>
      val rm = (0 to t.length - 20).filter { i =>
        val ds = gramDocs(t.substring(i, i + 20))
        ds.size >= 2 && id != ds.min
      }
      // merge [i, i+19] intervals (0-based); adjacent (gap 0) merge too
      val ivs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      rm.foreach { p =>
        if (ivs.nonEmpty && p <= ivs.last._2 + 1) {
          val (s0, e0) = ivs.last; ivs(ivs.size - 1) = (s0, math.max(e0, p + 19))
        } else ivs += ((p, p + 19))
      }
      val kept = new StringBuilder
      var pos = 0
      ivs.foreach { case (s0, e0) => kept.append(t.substring(pos, s0)); pos = e0 + 1 }
      kept.append(t.substring(pos))
      id -> ((ivs.size.toLong, ivs.map(iv => iv._2 - iv._1 + 1).sum.toLong, kept.toString))
    }.toMap
  }

  test("q108 engine ≡ string-level replica on dense shared-fragment corpora") {
    import spark.implicits._
    val frag = Gen.choose(8, 30).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    val corpusGen = for {
      pool <- Gen.listOfN(6, frag)
      nDocs <- Gen.choose(2, 6)
      docs <- Gen.listOfN(nDocs, for {
        k <- Gen.choose(1, 5)
        parts <- Gen.listOfN(k, Gen.oneOf(pool))
        pad <- Gen.stringOfN(7, Gen.alphaLowerChar)
      } yield (parts :+ pad).mkString)
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong + 1, t.take(200)) }
      .filter(_._2.nonEmpty)

    samples(corpusGen, 12, 1000L).filter(_.nonEmpty).foreach { corpus =>
      val expected = replicaSpans(corpus)
      val got = Mining.removeDupSpans(corpus.toDF("doc_id", "t200"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got.keySet == expected.keySet, s"doc set mismatch on $corpus")
      got.foreach { case (id, (n, rm, t)) =>
        val (en, erm, et) = expected(id)
        assert(t == et && n == en && rm == erm,
          s"doc $id: engine ($n,$rm,'$t') vs replica ($en,$erm,'$et') corpus=$corpus")
        // conservation holds independently of the replica
        assert(t.length.toLong + rm == corpus.find(_._1 == id).get._2.length)
      }
    }
  }

  // ---------------------------------------------------------------- q110

  /** Local replica of removeBoilerplateBlocks: aligned 10-token block
    * strings present in ≥ 3 distinct docs drop everywhere.
    */
  private def replicaBlocks(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    def blocksOf(t: String): Seq[String] =
      t.split(" ").filter(_.nonEmpty).grouped(10).map(_.mkString(" ")).toSeq
    val freq = docs.flatMap { case (id, t) => blocksOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).distinct.size }
    docs.flatMap { case (id, t) =>
      val bs = blocksOf(t)
      if (bs.isEmpty) None
      else {
        val kept = bs.filter(b => freq(b) < 3)
        Some(id -> ((bs.size.toLong, (bs.size - kept.size).toLong, kept.mkString(" "))))
      }
    }.toMap
  }

  test("q110 engine ≡ block-string replica on shared-passage corpora") {
    import spark.implicits._
    val word = Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
    val passage = Gen.listOfN(10, word).map(_.mkString(" "))
    val corpusGen = for {
      pool <- Gen.listOfN(5, passage)
      nDocs <- Gen.choose(3, 7)
      docs <- Gen.listOfN(nDocs, for {
        k <- Gen.choose(1, 4)
        parts <- Gen.listOfN(k, Gen.oneOf(pool))
        tailLen <- Gen.choose(0, 7)
        tail <- Gen.listOfN(tailLen, word)
      } yield (parts ++ (if (tail.isEmpty) Nil else Seq(tail.mkString(" ")))).mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }

    samples(corpusGen, 12, 2000L).filter(_.nonEmpty).foreach { corpus =>
      val expected = replicaBlocks(corpus)
      val got = Curation.removeBoilerplateBlocks(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expected, s"mismatch on $corpus:\n engine=$got\n replica=$expected")
    }
  }
}
