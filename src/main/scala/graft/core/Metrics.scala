package graft.core

import java.util.concurrent.ConcurrentLinkedDeque
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query observability: a [[QueryExecutionListener]] that distills each
  * completed action's executed plan into the numbers an operator of a
  * 100 TB cluster actually watches — rows scanned, bytes shuffled, rows
  * produced, wall time. At scale these are the difference between "the job
  * is slow" and "the join shuffled 40 TB because a filter didn't push".
  *
  * Metrics are read from the physical plan's own SQLMetrics after the run
  * (no extra instrumentation cost); the last `keep` queries are retained.
  */
class MetricsListener(keep: Int = 64) extends QueryExecutionListener {
  import Metrics.QueryStats

  private val log = new ConcurrentLinkedDeque[QueryStats]()

  def recent: Seq[QueryStats] = log.asScala.toSeq
  def last: Option[QueryStats] = Option(log.peekLast())
  def clear(): Unit = log.clear()

  /** Walk the executed plan INCLUDING adaptive boundaries: AQE wraps the
    * real (re-planned) tree in AdaptiveSparkPlanExec / QueryStageExec nodes
    * whose `children` is empty, so a plain foreach sees none of the scans.
    */
  private def walk(p: org.apache.spark.sql.execution.SparkPlan)
      : Iterator[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Iterator(a.executedPlan)
      case q: QueryStageExec => Iterator(q.plan)
      case _ => Iterator.empty
    }
    Iterator(p) ++ (p.children.iterator ++ inner).flatMap(walk)
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    import Metrics.QueryStats
    var scanRows = 0L; var shuffleBytes = 0L; var shuffleRows = 0L
    walk(qe.executedPlan).foreach { node =>
      val cls = node.getClass.getSimpleName
      node.metrics.foreach { case (key, m) =>
        if (key == "numOutputRows" && cls.contains("Scan")) scanRows += m.value
        if (key == "shuffleBytesWritten") shuffleBytes += m.value
        if (key == "shuffleRecordsWritten") shuffleRows += m.value
      }
    }
    // the raw root is AdaptiveSparkPlanExec (empty metrics) under AQE and
    // WholeStageCodegenExec otherwise — the first *walked* node carrying
    // numOutputRows is the root-most operator that actually counts rows
    val outputRows = walk(qe.executedPlan)
      .flatMap(_.metrics.get("numOutputRows")).map(_.value)
      .toSeq.headOption.getOrElse(-1L)
    log.addLast(QueryStats(funcName, durationNs / 1000000L, outputRows,
      scanRows, shuffleBytes, shuffleRows))
    while (log.size() > keep) log.removeFirst()
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()
}

object Metrics {
  case class QueryStats(action: String, durationMs: Long, outputRows: Long,
                        scanRows: Long, shuffleBytes: Long, shuffleRows: Long)

  /** Install a listener on the session; returns it for reading. */
  def install(spark: SparkSession, keep: Int = 64): MetricsListener = {
    val l = new MetricsListener(keep)
    spark.listenerManager.register(l)
    l
  }
}
