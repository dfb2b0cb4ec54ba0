package graft.util

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** The scratch-dir lifecycle: digest keying (no 32-bit hashCode
  * aliasing), in-process sweep, and — via a real subprocess — the JVM
  * shutdown hook actually firing at exit. No Spark needed. */
class ScratchSpec extends AnyFunSuite {

  test("paths are keyed by a full digest, not 32-bit String.hashCode") {
    // classic hashCode collision pair: "Aa" and "BB" hash identically,
    // so the old abs(hashCode) scheme would alias their scratch tables
    assert("Aa".hashCode == "BB".hashCode)
    val a = Scratch.path("spec", "Aa")
    val b = Scratch.path("spec", "BB")
    assert(a != b)
    // and the pid suffix keeps the path process-private
    assert(a.contains(ProcessHandle.current().pid().toString))
  }

  test("cleanupPath deletes a registered dir, including nested files") {
    // targeted cleanup only: an in-process cleanupNow() would sweep
    // dirs OTHER suites memoized in this shared JVM (it deleted the
    // zero-bar fixture under 50 later tests before the fixture grew
    // its self-heal) — the full-registry sweep is exercised by the
    // isolated subprocess hook test below instead
    val p = Scratch.path("speccleanup", "some/data/dir")
    val d = new File(p)
    assert(d.mkdirs())
    val f = new File(d, "part-00000")
    val w = new java.io.FileWriter(f); w.write("x"); w.close()
    assert(Scratch.registeredPaths.contains(p))
    Scratch.cleanupPath(p)
    assert(!d.exists())
    assert(!Scratch.registeredPaths.contains(p))
  }

  test("an in-process sweep cannot delete a pinned live dir; the exit sweep still can") {
    val live = Scratch.pin(Scratch.path("specpinned", "live/memo/dir"))
    val doomed = Scratch.path("specswept", "scratch/dir")
    Seq(live, doomed).foreach { p =>
      val d = new File(p); assert(d.mkdirs())
      val w = new java.io.FileWriter(new File(d, "part-00000")); w.write("x"); w.close()
    }
    Scratch.cleanupNow()
    assert(new File(live).exists(), "cleanupNow must skip pinned dirs")
    assert(Scratch.registeredPaths.contains(live), "a pinned dir stays registered for exit")
    assert(!new File(doomed).exists(), "cleanupNow must still sweep unpinned dirs")
    // the hook body takes everything, pins included
    Scratch.cleanupAll()
    assert(!new File(live).exists(), "cleanupAll (the exit hook) must remove pinned dirs")
  }

  test("the shutdown hook removes scratch dirs at JVM exit (subprocess receipt)") {
    // forked test JVM ⇒ java.class.path is the real classpath; the
    // probe is pure JVM so no Spark conf or add-opens are needed
    val java = s"${System.getProperty("java.home")}${File.separator}bin${File.separator}java"
    val cp = System.getProperty("java.class.path")
    val out = scala.sys.process.Process(
      Seq(java, "-cp", cp, "graft.util.ScratchHookProbe", "probe/data/dir")).!!
    val p = out.trim.linesIterator.toSeq.last
    assert(p.contains("graft_probe_"), s"probe printed unexpected output: $out")
    assert(!new File(p).exists(), s"shutdown hook did not remove $p")
  }
}
