package graft.util

import java.io.File
import java.nio.file.{Files, Path, Paths}

/** Session-scoped scratch directories for operators that round-trip
  * through disk (the persisted IVF index of `ann_incremental_knn`, the
  * ScaleProbe incknn index, spec fixtures). Two guarantees the bare
  * `Files.createTempDirectory` calls lacked (ADVICE round 10):
  *  - dirs live under `target/tmp-scratch` when the repo's build scratch
  *    exists (bench reps / Verify runs stop accumulating unbounded /tmp
  *    disk across invocations — `target/` is the session scratch that
  *    dies with the session anyway);
  *  - every dir is registered for recursive delete at JVM exit, so even
  *    a long multi-query Verify run reclaims each query's index as the
  *    JVM ends rather than leaking it to the host.
  */
object Scratch {
  private val root: Path = {
    val t = new File("target")
    if (t.isDirectory) {
      val p = Paths.get("target", "tmp-scratch")
      Files.createDirectories(p)
      p
    } else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** A fresh scratch dir, deleted recursively at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(root, prefix)
    deleteOnExit(p)
    p.toString
  }

  // ONE shutdown hook draining a shared list (ADVICE r11): a hook per
  // dir made a long multi-query Verify/BenchReps session accumulate
  // unbounded Thread objects that all ran concurrently at exit.
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hookInstalled: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      var p = pending.poll()
      while (p != null) { deleteRecursively(p); p = pending.poll() }
    }))

  def deleteOnExit(p: Path): Unit = {
    hookInstalled
    pending.add(p): Unit
  }

  def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) {
      val kids = f.listFiles
      if (kids != null) kids.foreach(k => deleteRecursively(k.toPath))
    }
    f.delete(): Unit
  }
}
