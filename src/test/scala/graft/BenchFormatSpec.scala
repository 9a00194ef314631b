package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact must be valid JSON regardless of the JVM's
  * default locale (comma-decimal locales would otherwise render
  * 1.2345 as "1,2345" through a bare f-interpolator).
  */
class BenchFormatSpec extends AnyFunSuite {

  test("number formatting is locale-independent") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.FRANCE)
      assert(f"${1.2345}%.4f" == "1,2345",
        "precondition: FRANCE locale must use comma decimals for this test to bite")
      assert(Bench.fmt(1.2345, "%.4f") == "1.2345")
      assert(Bench.fmt(101.219, "%.3f") == "101.219")
    } finally java.util.Locale.setDefault(saved)
  }
}
