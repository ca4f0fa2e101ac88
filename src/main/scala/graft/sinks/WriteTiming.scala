package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-write timing/outcome observability — the Spark analog of the
  * reference's doobie `logHandler` (H2CsvCreateSink.scala:128–138), which
  * logs every statement's execution + processing millis at DEBUG and
  * failures with their cause at ERROR.
  *
  * Spark's unit of observable work is not the statement but the action:
  * `QueryExecutionListener` fires once per write/collect with the full
  * `QueryExecution` and wall nanos, on success AND failure — the same
  * success/failure × duration signal, at the granularity Spark actually
  * executes. Events are retained in a bounded in-memory queue so callers
  * (and tests) can inspect them; the log line itself goes through the
  * session's SLF4J logger like every other Spark component.
  */
final class WriteTimingListener(maxRetained: Int = 1024) extends QueryExecutionListener {

  final case class WriteEvent(funcName: String, millis: Long, error: Option[String])

  private val retained = new ConcurrentLinkedQueue[WriteEvent]()
  // CLQ.size() is O(n); bound-checking every dispatch with it would make
  // the listener O(maxRetained) per event. Track the count separately.
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[WriteTimingListener])

  private def record(e: WriteEvent): Unit = {
    retained.add(e)
    if (count.incrementAndGet() > maxRetained && retained.poll() != null)
      count.decrementAndGet()
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val e = WriteEvent(funcName, durationNs / 1000000L, None)
    record(e)
    log.info(s"graft sink: $funcName succeeded in ${e.millis} ms")
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
    record(WriteEvent(funcName, -1L, Some(exception.toString)))
    log.error(s"graft sink: $funcName FAILED", exception)
  }

  /** Snapshot of retained events, oldest first. */
  def events: List[WriteEvent] = {
    val it = retained.iterator()
    val b = List.newBuilder[WriteEvent]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

object WriteTimingListener {
  /** Register a fresh listener on the session and return it. */
  def install(spark: SparkSession): WriteTimingListener = {
    val l = new WriteTimingListener()
    spark.listenerManager.register(l)
    l
  }
}
