package graft.cli

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler._
import org.slf4j.LoggerFactory

/** Progress reporting (SURVEY O2/O7): the reference polls pgfutter's
  * stdout and scrapes `NN.NN%` lines into a per-source progress map
  * (main.py:56-102, 424-458). The Spark-native bridge is event-driven
  * instead of scraped: a SparkListener counts finished tasks per stage and
  * logs percent milestones tagged with the current job description (the
  * Loader labels its stages "Import <table>", "Check", ... via
  * `setJobDescription`). No polling thread, no stdout parsing — the
  * scheduler already knows the truth.
  */
class ProgressReporter(logEveryPct: Int = 25) extends SparkListener {
  private val log = LoggerFactory.getLogger(getClass)

  private final case class StageState(
      desc: String, total: Int, done: AtomicInteger, loggedPct: AtomicInteger)

  private val stages = new ConcurrentHashMap[Int, StageState]()

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    val desc = Option(ev.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse(s"stage ${ev.stageInfo.stageId}")
    stages.put(ev.stageInfo.stageId,
      StageState(desc, ev.stageInfo.numTasks, new AtomicInteger(0), new AtomicInteger(0)))
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val st = stages.get(ev.stageId)
    if (st != null && st.total > 0) {
      val pct = st.done.incrementAndGet() * 100 / st.total
      val milestone = pct - pct % logEveryPct
      // log each milestone once (CAS guards concurrent task-end events)
      val prev = st.loggedPct.get()
      if (milestone > prev && milestone < 100 && st.loggedPct.compareAndSet(prev, milestone))
        log.info(s"""Task "${st.desc}": $milestone% (${st.done.get()}/${st.total} tasks)""")
    }
  }

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val st = stages.remove(ev.stageInfo.stageId)
    if (st != null) {
      val status = if (ev.stageInfo.failureReason.isEmpty) "finished successfully"
        else s"errored: ${ev.stageInfo.failureReason.get.linesIterator.next()}"
      log.info(s"""Task "${st.desc}" $status (${st.total} tasks)""")
    }
  }

  /** Live (stageId → done/total) view, for tests and embedding UIs. */
  def snapshot: Map[Int, (Int, Int)] =
    stages.asScala.map { case (id, st) => id -> (st.done.get(), st.total) }.toMap
}
