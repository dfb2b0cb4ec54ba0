package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Run two INDEPENDENT Spark-action pipelines concurrently — guide
  * §2.6 "overlap independent jobs": actions are only sequential
  * because driver code calls them sequentially, and a maintenance row
  * that stages/rewrites two unrelated tables back-to-back leaves the
  * cluster idle through every barrier twice. Two driver threads let
  * the second pipeline's tasks back-fill executors the first one's
  * tail frees. Job descriptions/groups are thread-local in Spark, so
  * concurrent jobs stay correctly labelled.
  *
  * Only for pipelines with NO shared mutable state (distinct scratch
  * dirs, distinct journals). BOTH sides are awaited to completion
  * before the call returns or throws (r16, the r15 advice item): an
  * eager `Await.result(fa)` would propagate a's failure while b's
  * in-flight writes still run — overlapping whatever the caller's
  * error path does next — and would silently drop b's own exception.
  * The first failure (in argument order) is rethrown after both sides
  * have quiesced. */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val ec = ExecutionContext.fromExecutorService(pool)
    try {
      val fa = Future(a)(ec)
      val fb = Future(b)(ec)
      Await.ready(fa, Duration.Inf)
      Await.ready(fb, Duration.Inf)
      (fa.value.get.get, fb.value.get.get)
    } finally pool.shutdown()
  }
}
