package graft.batch

/** Batch job lifecycle records. Parity: models/BatchJobRecord.scala:5-22. */
object BatchStatus extends Enumeration {
  val Pending, Running, Completed, Failed = Value
}

final case class BatchRequest(
    startDate: String, // inclusive, yyyy-MM-dd, on the event_date partition col
    endDate: String,   // inclusive
    analysisType: String,
    filters: Map[String, String] = Map.empty)

final case class BatchJobRecord(
    batchId: String,
    request: BatchRequest,
    status: BatchStatus.Value,
    submittedAt: Long,
    startedAt: Option[Long] = None,
    completedAt: Option[Long] = None,
    rowCount: Option[Long] = None,
    rawPath: Option[String] = None,
    aggregatedPath: Option[String] = None,
    error: Option[String] = None)
