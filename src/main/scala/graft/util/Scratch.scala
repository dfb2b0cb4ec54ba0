package graft.util

import java.io.File
import java.util.concurrent.ConcurrentHashMap

/** Process-private scratch directories for the queries that round-trip
  * through temp tables (the K1 COW target, the K3/K7 round-trips, the
  * ivf2 serve index). Three guarantees, each bought by a distinct
  * piece of the path / lifecycle:
  *
  *   - NO cross-process races: the path carries the JVM pid, so two
  *     engine processes pointed at the same data dir (a bench and an
  *     audit, say) never interleave static-overwrite deletes with each
  *     other's reads — the collision class caught live in round 11
  *     when a concurrent ShuffleAudit raced a MatCheck read of the K1
  *     COW table mid-rewrite (44906 → 32873 rows).
  *   - NO cross-dir aliasing: the data-dir component is a full MD5 hex
  *     digest, not the 32-bit `String.hashCode` the first cut used —
  *     two data dirs colliding under hashCode would silently serve
  *     each other's scratch tables (wrong index, wrong COW target),
  *     and `math.abs(Int.MinValue)` is itself negative. A 128-bit
  *     digest makes accidental aliasing impossible in practice.
  *   - NO tmpdir leak: every path handed out is registered here and
  *     deleted by a JVM shutdown hook, so repeated bench / audit /
  *     matcheck runs no longer accumulate `graft_*_<pid>` dirs (at
  *     sf10 the serve index plus COW table per run are non-trivial).
  *     [[cleanupNow]] exposes the same sweep for explicit teardown.
  */
object Scratch {
  private val registered = ConcurrentHashMap.newKeySet[String]()
  private val pinned = ConcurrentHashMap.newKeySet[String]()
  @volatile private var hookInstalled = false

  /** A scratch path unique to (tag, data dir, this JVM), registered
    * for deletion at JVM exit. Stable within a process, so in-JVM
    * write-once-read-many reuse (the serve index) is unchanged. */
  def path(tag: String, dir: String): String =
    register(s"${System.getProperty("java.io.tmpdir")}${File.separator}" +
      s"graft_${tag}_${md5Hex(dir)}_${ProcessHandle.current().pid()}")

  /** Register an externally-derived path (e.g. a sibling suffix of a
    * [[path]] result) for the same end-of-process sweep. */
  private[graft] def register(p: String): String = {
    registered.add(p)
    ensureHook()
    p
  }

  /** Paths currently registered for cleanup (spec visibility). */
  private[graft] def registeredPaths: Set[String] = {
    import scala.jdk.CollectionConverters._
    registered.asScala.toSet
  }

  /** PIN a registered path against the in-process sweep: a pinned dir
    * survives [[cleanupNow]] and is deleted only by [[cleanupAll]]
    * (the shutdown hook) or an explicit [[cleanupPath]]. The
    * sweep-scope contract, component by component:
    *   - marker-gated serve indexes (ivf2serve, sq8serve) and the COW
    *     round-trip tables are NOT pinned — rebuild-on-next-use IS
    *     their contract (the completion marker dies with the dir, so
    *     the next read self-heals), and leaving them sweepable is
    *     what keeps [[cleanupNow]] useful for reclaiming scratch.
    *   - live session memos with NO self-heal-on-read (the shared
    *     zero-bar test fixture before it grew one) must pin: a
    *     mid-session sweep deleting them breaks every later consumer.
    * A pin is registration metadata, not a leak: the exit hook still
    * removes the dir. */
  private[graft] def pin(p: String): String = {
    pinned.add(p)
    p
  }

  private def ensureHook(): Unit = synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => cleanupAll(), "graft-scratch-cleanup"))
      hookInstalled = true
    }
  }

  /** Delete every registered UNPINNED scratch dir now (idempotent;
    * missing paths are no-ops) — the in-process reclaim. Pinned dirs
    * (see [[pin]]) are exempt, so a mid-session sweep can no longer
    * delete a live memoized dir out from under later consumers (the
    * zero-bar-fixture incident this guard exists for). The shutdown
    * hook runs [[cleanupAll]], which also takes the pinned set. */
  def cleanupNow(): Unit = {
    val it = registered.iterator()
    while (it.hasNext) {
      val p = it.next()
      if (!pinned.contains(p)) {
        deleteRecursively(new File(p))
        it.remove()
      }
    }
  }

  /** The exit sweep: every registered dir, pinned included. Only the
    * shutdown hook (and the subprocess probe asserting it) should
    * call this mid-process. */
  private[graft] def cleanupAll(): Unit = {
    val it = registered.iterator()
    while (it.hasNext) {
      deleteRecursively(new File(it.next()))
      it.remove()
    }
    pinned.clear()
  }

  /** Delete and deregister ONE scratch path — the targeted form for
    * in-process teardown (specs), leaving every other registered dir
    * alone. Removes any pin: explicit teardown outranks it. */
  private[graft] def cleanupPath(p: String): Unit = {
    deleteRecursively(new File(p))
    registered.remove(p)
    pinned.remove(p)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}

/** Subprocess target for ScratchSpec's hook-fires receipt: creates a
  * scratch dir with one file in it, prints the path, exits normally —
  * the parent asserts the JVM shutdown hook removed the dir. Pure JVM
  * (no Spark) so the spec can exec it with the inherited classpath. */
object ScratchHookProbe {
  def main(args: Array[String]): Unit = {
    val p = Scratch.path("probe", args(0))
    val d = new File(p)
    d.mkdirs()
    val w = new java.io.FileWriter(new File(d, "part-00000"))
    w.write("x")
    w.close()
    println(p)
  }
}
