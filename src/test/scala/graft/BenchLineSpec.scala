package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last ~2000 chars of Bench stdout; round 2's
  * full per-query line overflowed it and the whole bench parsed as null.
  * Pin the rendered headline line comfortably under the limit with
  * worst-case widths, and keep every headline pick a real query. */
class BenchLineSpec extends AnyFunSuite {

  test("headline bench line fits the driver's stdout tail with margin") {
    // worst case: every value prints like 12345.678 (9 chars)
    val qs = Bench.headline
      .map(k => "\"" + k + "\":12345.678").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":99999.999,"unit":"sec","warmup_sec":99999.999,"n_queries":9999,"n_errors":9999,"max_query":"some_rather_long_query_name","max_sec":99999.999,"queries":$qs,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length < 1800,
      s"bench line would be ${line.length} chars; driver tail is ~2000")
  }

  test("every headline pick is a registered query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in queries: $missing")
  }
}
