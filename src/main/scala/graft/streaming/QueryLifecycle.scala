package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.streaming.StreamingQuery

/** Lifecycle management for the engine's streaming queries: single-flight
  * start guard, stop-all, status — the reference's stream control routes
  * as a programmatic API (StreamRoutes.scala:19-123, ST7).
  */
final class QueryLifecycle {

  private val active = new AtomicReference[Seq[StreamingQuery]](Nil)

  final case class Status(id: String, name: String, isActive: Boolean)

  /** Start via `f` unless queries are already running (the reference's 409
    * single-flight guard). Returns Left(existing statuses) when refused. */
  def start(f: => Seq[StreamingQuery]): Either[Seq[Status], Seq[Status]] = {
    val current = active.get()
    if (current.exists(_.isActive)) Left(status())
    else {
      val started = f
      active.set(started)
      Right(status())
    }
  }

  def status(): Seq[Status] =
    active.get().map(q => Status(q.id.toString, Option(q.name).getOrElse(""), q.isActive))

  /** Stop all managed queries (graceful; waits for termination). */
  def stopAll(): Seq[Status] = {
    val qs = active.getAndSet(Nil)
    qs.foreach { q => if (q.isActive) q.stop() }
    qs.map(q => Status(q.id.toString, Option(q.name).getOrElse(""), q.isActive))
  }

  def isRunning: Boolean = active.get().exists(_.isActive)
}
