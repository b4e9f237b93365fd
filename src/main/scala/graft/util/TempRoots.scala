package graft.util

import java.nio.file.{Files, Path}

/** JVM-lifetime temp directories for the self-contained query
  * registrations (the DML/lakehouse entries build their table history in
  * a fresh root per invocation). Every root registers for recursive
  * deletion at JVM exit — under the bench harness each such query runs
  * 3–5 times per round, and unregistered roots left several full copies
  * of the orders table in /tmp per benchmark run (ADVICE r14).
  *
  * Exit-time (not eager) deletion is deliberate: a query's result frame
  * is often consumed lazily AFTER the registration closure returns, so
  * the root must outlive the closure; the bench/verify mains are
  * short-lived JVMs, which bounds the accumulation to one run's worth.
  */
object TempRoots {
  private val roots = scala.collection.mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.synchronized { roots.foreach(deleteRecursively) }))
    true
  }

  /** Create a temp directory and register it for deletion at JVM exit. */
  def create(prefix: String): String = {
    require(hookInstalled)
    val p = Files.createTempDirectory(prefix)
    roots.synchronized { roots += p }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      // deepest-first so directories empty before their own delete
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try Files.deleteIfExists(f) catch {
          case _: Throwable => ()
        })
    } catch { case _: Throwable => () }
}
