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
  * dirs, distinct journals). Exceptions propagate from either side;
  * the surviving side is allowed to finish before the pool dies. */
object Par {
  def both[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val ec = ExecutionContext.fromExecutorService(pool)
    try {
      val fa = Future(a)(ec)
      val fb = Future(b)(ec)
      (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    } finally pool.shutdown()
  }
}
