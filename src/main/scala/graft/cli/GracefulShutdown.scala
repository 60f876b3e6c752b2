package graft.cli

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** Signal-driven graceful shutdown (SURVEY O4): the reference registers
  * SIGHUP/SIGTERM/SIGINT handlers that cancel outstanding tasks, drain
  * the executor, and stop the loop (main.py:545-552, 582-593). The Spark
  * equivalent cancels all running jobs and stops the session so executors
  * and shuffle state release cleanly.
  *
  * `sun.misc.Signal` is JDK-internal (not in the spec), so registration
  * goes through reflection and degrades to the JVM shutdown hook alone
  * when unavailable.
  */
object GracefulShutdown {
  private val log = LoggerFactory.getLogger(getClass)
  private val done = new AtomicBoolean(false)

  /** Cancel running jobs and stop the session; idempotent — the signal
    * handler and the shutdown hook may both fire. */
  def shutdown(spark: SparkSession, signal: String = "shutdown"): Unit =
    shutdownWith(signal,
      () => spark.sparkContext.cancelAllJobs(),
      () => spark.stop())

  /** Testable core: run cancel-then-stop exactly once per JVM. */
  private[cli] def shutdownWith(
      signal: String, cancel: () => Unit, stop: () => Unit): Unit =
    if (done.compareAndSet(false, true)) {
      log.warn(s"Received $signal — cancelling outstanding jobs")
      try cancel()
      catch { case e: Exception => log.warn(s"job cancel failed: ${e.getMessage}") }
      try stop()
      catch { case e: Exception => log.warn(s"spark stop failed: ${e.getMessage}") }
    }

  private[cli] def resetForTest(): Unit = done.set(false)

  /** Register handlers for the reference's signal set. Returns the signal
    * names actually hooked (empty when sun.misc.Signal is unavailable —
    * the shutdown hook still covers normal JVM termination). */
  def install(
      spark: SparkSession,
      // MUST stay an explicit lambda: `= sys.exit` compiles as the
      // APPLICATION sys.exit() (all-default-args method + Nothing <: any
      // expected type), killing the JVM the moment the default is
      // evaluated — i.e. on every plain install(spark) call. Caught by
      // MainE2ESpec; the unit specs always injected exit and never saw it.
      exit: Int => Unit = code => sys.exit(code),
      signals: Seq[String] = Seq("TERM", "HUP", "INT")): Seq[String] = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => shutdown(spark, "JVM exit")))
    signals.flatMap { name =>
      try {
        val sigCls = Class.forName("sun.misc.Signal")
        val handlerCls = Class.forName("sun.misc.SignalHandler")
        val handler = java.lang.reflect.Proxy.newProxyInstance(
          handlerCls.getClassLoader, Array(handlerCls),
          (_, method, _) => {
            if (method.getName == "handle") { shutdown(spark, s"SIG$name"); exit(1) }
            null
          })
        sigCls.getMethod("handle", sigCls, handlerCls).invoke(null,
          sigCls.getConstructor(classOf[String]).newInstance(name), handler)
        Some(name)
      } catch {
        case e: Throwable =>
          log.warn(s"cannot hook SIG$name (${e.getClass.getSimpleName}); relying on shutdown hook")
          None
      }
    }
  }
}
