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

  def put(r: BatchJobRecord): Unit = { persist(r); records.put(r.batchId, r) }

  def get(batchId: String): Option[BatchJobRecord] = Option(records.get(batchId))

  /** Atomic read-modify-write of one record.
    *
    * Durability ordering: the new record is persisted to disk INSIDE the
    * remapping function — i.e. BEFORE `computeIfPresent` publishes it to the
    * in-memory map. A poller that observes an in-memory terminal status is
    * therefore guaranteed the JSON file is already on disk (atomic
    * tmp+ATOMIC_MOVE in [[persist]]), so a crash-restart [[recover]] can
    * never lose a state an observer already saw. The remapping function runs
    * under the map's bin lock; the write is one small JSON file per
    * transition, which is an acceptable critical section for a metadata
    * registry (O(jobs) records, terminal transitions only hit the disk). */
  def update(batchId: String)(f: BatchJobRecord => BatchJobRecord): Option[BatchJobRecord] =
    Option(records.computeIfPresent(batchId, (_, r) => { val next = f(r); persist(next); next }))

  def listAll(limit: Int = Int.MaxValue): Seq[BatchJobRecord] =
    records.values().asScala.toSeq.sortBy(-_.submittedAt).take(limit)

  /** Keyset page: records strictly AFTER the cursor in
    * (submittedAt DESC, batchId ASC) order. Unlike offset paging, a page
    * boundary is stable under concurrent submissions (new records land
    * before the cursor and cannot shift later pages), and the response
    * stays bounded no matter how many records disk recovery loaded.
    * Returns (page, total matching the filter). */
  def listPage(
      limit: Int,
      after: Option[(Long, String)] = None,
      status: Option[BatchStatus.Value] = None): (Seq[BatchJobRecord], Int) = {
    val filtered = records.values().asScala.toSeq
      .filter(r => status.forall(_ == r.status))
    val page = filtered
      .filter(r => after.forall { case (ts, id) =>
        r.submittedAt < ts || (r.submittedAt == ts && r.batchId > id)
      })
      .sortBy(r => (-r.submittedAt, r.batchId))
      .take(limit)
    (page, filtered.size)
  }

  /** Retention sweep: drop TERMINAL records older than `horizonMs` from
    * memory and disk (active PENDING/RUNNING records are never touched).
    * Bounds registry growth across restarts — without it, disk [[recover]]
    * accumulates every job ever finished. Age is measured from the record's
    * LAST transition (completion), not submission: a job submitted before
    * the horizon but completed minutes ago is a fresh terminal record a
    * restart may still want — it must ride out the full retention.
    * Returns the number removed. */
  def prune(horizonMs: Long, now: Long = System.currentTimeMillis()): Int = {
    val cutoff = now - horizonMs
    val victims = records.values().asScala.toSeq.filter { r =>
      (r.status == BatchStatus.Completed || r.status == BatchStatus.Failed) &&
        math.max(r.submittedAt, r.completedAt.getOrElse(0L)) < cutoff
    }
    victims.foreach { r =>
      records.remove(r.batchId)
      persistDir.foreach { dir =>
        val f = java.nio.file.Paths.get(dir, s"${r.batchId}.json")
        scala.util.Try(java.nio.file.Files.deleteIfExists(f))
      }
    }
    victims.size
  }

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
            |"submittedAt":${r.submittedAt},"completedAt":${r.completedAt.getOrElse(-1L)},
            |"rowCount":${r.rowCount.getOrElse(-1L)},
            |"rawPath":"${esc(r.rawPath.getOrElse(""))}",
            |"aggregatedPath":"${esc(r.aggregatedPath.getOrElse(""))}",
            |"error":"${esc(r.error.getOrElse(""))}"}""".stripMargin.replaceAll("\n", "")
      // Crash-safe publish: write the full record to a temp file, then
      // ATOMIC_MOVE over the final name — a reader (or a recover() after a
      // crash mid-write) sees either the complete old JSON or the complete
      // new JSON, never a truncated file.
      val tmp = java.nio.file.Files.createTempFile(p, s".${r.batchId}", ".tmp")
      java.nio.file.Files.writeString(tmp, json)
      java.nio.file.Files.move(tmp, p.resolve(s"${r.batchId}.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Rebuild terminal records from disk after a restart (minimal fields —
    * enough to serve status and locate result paths). */
  def recover(): Int = persistDir.map { dir =>
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) 0
    else {
      // Orphaned .tmp files (crash between createTempFile and ATOMIC_MOVE)
      // are ignored; the published *.json files are complete by construction.
      val files = java.nio.file.Files.list(p).iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq
      val loaded = files.count { f =>
        scala.util.Try {
          val txt = java.nio.file.Files.readString(f)
          def field(k: String): Option[String] =
            s""""$k":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
          def num(k: String): Option[Long] =
            s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          (for {
            id <- field("batchId")
            st <- field("status")
            // null = actually inserted; an id already live in memory is not
            // "recovered" (keeps repeat recover() calls honest at 0)
          } yield null == records.putIfAbsent(id, BatchJobRecord(
            batchId = id,
            request = BatchRequest(
              field("startDate").getOrElse(""), field("endDate").getOrElse(""),
              field("analysisType").getOrElse("")),
            status = BatchStatus.withName(st),
            submittedAt = num("submittedAt").getOrElse(0L),
            completedAt = num("completedAt").filter(_ >= 0),
            rowCount = num("rowCount").filter(_ >= 0),
            rawPath = field("rawPath").filter(_.nonEmpty),
            aggregatedPath = field("aggregatedPath").filter(_.nonEmpty),
            error = field("error").filter(_.nonEmpty)))).getOrElse(false)
        }.getOrElse(false) // truncated/malformed file: skip, don't abort recovery
      }
      loaded
    }
  }.getOrElse(0)
}
