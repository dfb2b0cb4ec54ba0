package graft

/** The endpoint switch map smokes: every reference endpoint resolves to
  * an engine query that returns rows on the test fixture. */
class ApiSpec extends SparkSpec {
  test("every reference endpoint delegates to a row-producing engine query") {
    Api.endpoints.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }
}
