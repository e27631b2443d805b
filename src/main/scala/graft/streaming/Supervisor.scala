package graft.streaming

/** Restart-on-failure supervision — the engine's re-expression of the
  * reference's supervisor loop (supervisor/supervisor.go): run the sync
  * body; on transient failure restart with backoff; on schema change run
  * the resync callback (drop state + fresh snapshot, as the reference drops
  * the replication slot and re-backfills) and then restart.
  */
object Supervisor {

  final case class Result(restarts: Int, resyncs: Int)

  /** @param body       one full run of the pipeline; returning normally ends
    *                    supervision (stream finished / test drained)
    * @param resync     invoked when `body` raises [[SchemaChangedException]]
    * @param maxRestarts give up after this many consecutive failures
    * @param backoffMs  sleep between restarts (doubled each consecutive
    *                    failure, reset on success) */
  def runForever(
      body: () => Unit,
      resync: () => Unit = () => (),
      maxRestarts: Int = 10,
      backoffMs: Long = 1000L): Result = {
    var restarts = 0
    var resyncs = 0
    var consecutive = 0
    var done = false
    while (!done) {
      try {
        body()
        done = true
      } catch {
        case e: SchemaChangedException =>
          resyncs += 1
          restarts += 1
          consecutive = 0
          resync()
        case scala.util.control.NonFatal(_) =>
          restarts += 1
          consecutive += 1
          if (consecutive > maxRestarts)
            throw new IllegalStateException(s"giving up after $consecutive consecutive failures")
          Thread.sleep(backoffMs * (1L << math.min(consecutive - 1, 6)))
      }
    }
    Result(restarts, resyncs)
  }
}
