package graft.streaming

/** Restart-on-failure supervision — the engine's re-expression of the
  * reference's supervisor loop (supervisor/supervisor.go): run the sync
  * body; on transient failure restart with backoff; on schema change run
  * the resync callback (drop state + fresh snapshot, as the reference drops
  * the replication slot and re-backfills) and then restart.
  */
object Supervisor {

  final case class Result(restarts: Int, resyncs: Int)

  /** Cooperative shutdown: a body that observes a stop request (operator
    * signal, deployment drain) throws this AFTER finishing its close
    * handshake (final standby status + CopyDone —
    * [[graft.cdc.PgReplication.Session.close]]); supervision then ends
    * NORMALLY — no restart, no backoff, no resync — mirroring the
    * reference's `Stop` (sync_service.go:224-237), where closing the
    * stream is a clean exit, not a failure. */
  final class StopRequested extends RuntimeException("stop requested")

  /** @param body       one full run of the pipeline; returning normally ends
    *                    supervision (stream finished / test drained)
    * @param resync     invoked when `body` raises [[SchemaChangedException]]
    * @param maxRestarts give up after this many consecutive failures
    * @param maxResyncs give up after this many resyncs in a row with no
    *                    normal completion — a resync that doesn't converge
    *                    (schema keeps flapping, or the callback fails to fix
    *                    the mismatch) must surface as a failure, not loop
    *                    resnapshot→restart forever
    * @param backoffMs  sleep between restarts (doubled each consecutive
    *                    failure; resyncs back off too, un-doubled)
    * @param progressMs a body that ran at least this long before failing
    *                    counts as progress and resets both consecutive
    *                    counters (restart-intensity semantics: only rapid
    *                    loops trip the bounds) */
  def runForever(
      body: () => Unit,
      resync: () => Unit = () => (),
      maxRestarts: Int = 10,
      maxResyncs: Int = 3,
      backoffMs: Long = 1000L,
      progressMs: Long = 60000L): Result = {
    var restarts = 0
    var resyncs = 0
    var consecutive = 0
    var consecutiveResyncs = 0
    var done = false
    while (!done) {
      val startedAt = System.nanoTime()
      def ranLongEnough: Boolean =
        (System.nanoTime() - startedAt) / 1000000L >= progressMs
      try {
        body()
        done = true
      } catch {
        case _: StopRequested =>
          done = true // drained: clean exit, not a restartable failure
        case e: SchemaChangedException =>
          // a body that ran for a while made progress: this is a FRESH
          // schema change (restart-intensity pattern), not a non-converging
          // resync loop. `consecutive` (crash-restart intensity) always
          // resets — a schema change is not a crash.
          if (ranLongEnough) consecutiveResyncs = 0
          restarts += 1
          consecutive = 0
          // bound check BEFORE counting, so the reported number equals the
          // number of resync() invocations that actually ran
          if (consecutiveResyncs >= maxResyncs)
            throw new IllegalStateException(
              s"schema resync did not converge after $resyncs resyncs: ${e.getMessage}")
          resyncs += 1
          consecutiveResyncs += 1
          // a resync can fail transiently (e.g. the dying stream's
          // cancelled tasks still flushing into the checkpoint it must
          // delete) — retry it with backoff against the restart budget
          // rather than either aborting supervision or running the body
          // against half-torn-down state
          var resyncOk = false
          while (!resyncOk) {
            try { resync(); resyncOk = true }
            catch {
              case re if scala.util.control.NonFatal(re) =>
                restarts += 1
                consecutive += 1
                if (consecutive > maxRestarts)
                  throw new IllegalStateException(
                    s"giving up: resync failed $consecutive consecutive times", re)
                Thread.sleep(backoffMs * (1L << math.min(consecutive - 1, 6)))
            }
          }
          consecutive = 0
          Thread.sleep(backoffMs)
        case e if scala.util.control.NonFatal(e) =>
          if (ranLongEnough) { consecutive = 0; consecutiveResyncs = 0 }
          restarts += 1
          consecutive += 1
          if (consecutive > maxRestarts)
            // carry the last failure as the cause: the give-up is what an
            // operator pages on, and "10 consecutive failures" without the
            // underlying exception is undebuggable
            throw new IllegalStateException(
              s"giving up after $consecutive consecutive failures", e)
          Thread.sleep(backoffMs * (1L << math.min(consecutive - 1, 6)))
      }
    }
    Result(restarts, resyncs)
  }
}
