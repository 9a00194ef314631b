package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path: a session built with the
  * GraftExtensions injector resolves the native functions with no
  * per-query registration. Exercised via builder.withExtensions — the
  * same SparkSessionExtensions code path as the
  * spark.sql.extensions=graft.functions.GraftExtensions config, which
  * being a STATIC conf only applies when this JVM's SparkContext is
  * first created and so cannot be tested inside a shared-context
  * suite run.
  *
  * Session hygiene: extensions apply only at session construction, and
  * getOrCreate would happily return another suite's extension-less
  * session — so the default/active sessions are cleared first and
  * restored after (the underlying SparkContext is shared and must NOT
  * be stopped here).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves cosine_sim and minhash_longs in SQL") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sim = spark.sql(
        """SELECT cosine_sim(
             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS s""")
        .collect()(0).getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-12)
      val hs = spark.sql("SELECT minhash_longs('abcde', 8) AS hs")
        .collect()(0).getSeq[Long](0)
      assert(hs.length === 8)
      assert(hs.forall(_ >= 0L), "60-bit hashes must be non-negative")
      // matches the builtin md5-prefix formulation
      val ref = spark.sql(
        "SELECT CAST(conv(substr(md5(concat('1', '|', 'abcde')), 1, 15), 16, 10) AS BIGINT) AS h")
        .collect()(0).getLong(0)
      assert(hs.head === ref)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
