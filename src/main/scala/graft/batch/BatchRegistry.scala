package graft.batch

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** In-memory job registry with atomic state transitions (parity:
  * registry/BatchRegistry.scala:8-55) plus the durability the reference
  * spec'd but never implemented (AGENTS.md:1683): completed/failed records
  * are mirrored to a JSON file per batch under `persistDir`, and a fresh
  * registry can [[recover]] them after restart.
  *
  * The registry holds METADATA only (one small record per job) — result
  * data stays in the batch output directories, so driver memory is O(jobs),
  * never O(rows).
  */
final class BatchRegistry(persistDir: Option[String] = None) {

  private val records = new ConcurrentHashMap[String, BatchJobRecord]()

  def put(r: BatchJobRecord): Unit = { records.put(r.batchId, r); persist(r) }

  def get(batchId: String): Option[BatchJobRecord] = Option(records.get(batchId))

  /** Atomic read-modify-write of one record. */
  def update(batchId: String)(f: BatchJobRecord => BatchJobRecord): Option[BatchJobRecord] =
    Option(records.computeIfPresent(batchId, (_, r) => f(r))).map { r => persist(r); r }

  def listAll(limit: Int = Int.MaxValue): Seq[BatchJobRecord] =
    records.values().asScala.toSeq.sortBy(-_.submittedAt).take(limit)

  def size: Int = records.size()

  // ------------------------------------------------------------ durability

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def persist(r: BatchJobRecord): Unit = persistDir.foreach { dir =>
    if (r.status == BatchStatus.Completed || r.status == BatchStatus.Failed) {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      val json =
        s"""{"batchId":"${esc(r.batchId)}","status":"${r.status}",
            |"analysisType":"${esc(r.request.analysisType)}",
            |"startDate":"${esc(r.request.startDate)}","endDate":"${esc(r.request.endDate)}",
            |"submittedAt":${r.submittedAt},"rowCount":${r.rowCount.getOrElse(-1L)},
            |"rawPath":"${esc(r.rawPath.getOrElse(""))}",
            |"aggregatedPath":"${esc(r.aggregatedPath.getOrElse(""))}",
            |"error":"${esc(r.error.getOrElse(""))}"}""".stripMargin.replaceAll("\n", "")
      java.nio.file.Files.writeString(p.resolve(s"${r.batchId}.json"), json)
    }
  }

  /** Rebuild terminal records from disk after a restart (minimal fields —
    * enough to serve status and locate result paths). */
  def recover(): Int = persistDir.map { dir =>
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) 0
    else {
      val files = java.nio.file.Files.list(p).iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq
      files.foreach { f =>
        val txt = java.nio.file.Files.readString(f)
        def field(k: String): Option[String] =
          s""""$k":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
        def num(k: String): Option[Long] =
          s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        for {
          id <- field("batchId")
          st <- field("status")
        } records.putIfAbsent(id, BatchJobRecord(
          batchId = id,
          request = BatchRequest(
            field("startDate").getOrElse(""), field("endDate").getOrElse(""),
            field("analysisType").getOrElse("")),
          status = BatchStatus.withName(st),
          submittedAt = num("submittedAt").getOrElse(0L),
          rowCount = num("rowCount").filter(_ >= 0),
          rawPath = field("rawPath").filter(_.nonEmpty),
          aggregatedPath = field("aggregatedPath").filter(_.nonEmpty),
          error = field("error").filter(_.nonEmpty)))
      }
      files.size
    }
  }.getOrElse(0)
}
