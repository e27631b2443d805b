package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc._

/** Failure discipline of the per-batch concurrent staging
  * ([[StreamingMerge.eachTableConcurrently]]): the first failing table
  * must (a) cancel sibling SPARK jobs through the batch's job group — an
  * interrupted pool thread alone does NOT cancel a submitted job, and an
  * orphaned stage still writing `__scratch` while the replayed batch
  * rewrites the same path can publish a mixed-parts snapshot — and
  * (b) AWAIT every sibling before rethrowing, so no writer of any kind
  * outlives the call, and (c) rethrow the chronologically-first root
  * cause, not a sibling's cancellation artifact.
  *
  * The cancellation tests gate on EVENTS, not elapsed time: the failure
  * (or external interrupt) is released only after a latch — counted down
  * from inside the sibling job's own tasks — confirms the job is
  * airborne. A fixed sleep racing job startup flakes both ways on a
  * loaded host (failure fires before the job exists, or the job finishes
  * its waves before the failure lands); the latch makes the interleaving
  * the test is about deterministic. The one remaining time bound (the
  * cancel must beat running all waves to completion) is measured from
  * the moment the failure was actually released, not from call start.
  */
final class ConcurrentStagingSpec extends AnyFunSuite with Matchers {
  private val spark = TestSpark.spark

  private val rel = Relation("public", "t", Seq(
    RelColumn("id", PgTypes.Int8Oid, isIdentity = true)))

  private def merge(): StreamingMerge = {
    val base = java.nio.file.Files.createTempDirectory("graft-stg").toString
    new StreamingMerge(spark, base, Seq(rel), s"$base/_log")
  }

  test("rethrows the root cause only after EVERY sibling completed") {
    val sm = merge()
    val siblingDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boom = new RuntimeException("table a failed")
    val thrown = intercept[RuntimeException] {
      sm.eachTableConcurrently(Seq("a", "b")) {
        case "a" => Thread.sleep(50); throw boom
        case "b" =>
          // driver-side (non-Spark) work: the group cancel must not
          // interrupt it, and the call must still wait it out — the
          // no-writer-outlives-the-batch contract
          Thread.sleep(600); siblingDone.set(true); "ok"
      }
    }
    (thrown eq boom) shouldBe true
    siblingDone.get() shouldBe true
  }

  test("first failure cancels a sibling's in-flight Spark job") {
    val sm = merge()
    val sc = spark.sparkContext
    val siblingFailed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boom = new RuntimeException("fail fast")
    val latchKey = "cancel-in-flight"
    ConcurrentStagingSpec.jobStarted.put(latchKey,
      new java.util.concurrent.CountDownLatch(1))
    val failReleasedAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val thrown = intercept[RuntimeException] {
      sm.eachTableConcurrently(Seq("a", "b")) {
        case "a" =>
          // release the failure only once the sibling's job is AIRBORNE —
          // the scenario under test is cancel-in-flight, not
          // cancel-before-submit
          ConcurrentStagingSpec.jobStarted.get(latchKey).await(
            60, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
          failReleasedAt.set(System.nanoTime())
          throw boom
        case "b" =>
          try {
            // ~16 s if left to run (8 waves of 2 s on local[4]); the
            // group cancel's interruptOnCancel reaches the sleeping tasks
            sc.parallelize(1 to 32, 32)
              .mapPartitions { it =>
                ConcurrentStagingSpec.jobStarted.get("cancel-in-flight").countDown()
                Thread.sleep(2000); it
              }
              .count()
          } catch { case e: Throwable => siblingFailed.set(true); throw e }
      }
    }
    val cancelSecs = (System.nanoTime() - failReleasedAt.get()) / 1e9
    (thrown eq boom) shouldBe true // root cause, not the cancellation
    siblingFailed.get() shouldBe true // the job did NOT run to completion
    // the failure landed with ≥7 of 8 waves ahead (~14 s of work);
    // a prompt cancel returns in a couple of waves' worth at worst
    cancelSecs should be < 12.0
  }

  test("an external interrupt (query stop / rotation) cancels the batch's " +
      "staging jobs") {
    // q.stop() interrupts the micro-batch thread, which aborts the
    // barrier inside eachTableConcurrently — but the workers run in the
    // batch's OWN job group, detached from the stream's runId group, so
    // the stop's cancel never reaches them. The abort path must cancel
    // the batch group itself or a staging job outlives the batch (the
    // orphaned-scratch-writer corruption, made routine by checkpoint
    // rotation).
    val sm = merge()
    val sc = spark.sparkContext
    val jobDied = new java.util.concurrent.atomic.AtomicBoolean(false)
    val jobFinished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val latchKey = "external-interrupt"
    ConcurrentStagingSpec.jobStarted.put(latchKey,
      new java.util.concurrent.CountDownLatch(1))
    val caller = new Thread(() => {
      try {
        sm.eachTableConcurrently(Seq("a", "b")) {
          case "a" => Thread.sleep(60000); "a" // keeps the barrier waiting
          case "b" =>
            try {
              // ~16 s if left alone (8 waves of 2 s on local[4])
              sc.parallelize(1 to 32, 32)
                .mapPartitions { it =>
                  ConcurrentStagingSpec.jobStarted.get("external-interrupt").countDown()
                  Thread.sleep(2000); it
                }
                .count()
              jobFinished.set(true); "b"
            } catch { case e: Throwable => jobDied.set(true); throw e }
        }
        ()
      } catch { case _: Throwable => () } // InterruptedException expected
    }, "staging-caller")
    caller.start()
    // interrupt only once b's job is airborne — the orphan scenario
    ConcurrentStagingSpec.jobStarted.get(latchKey).await(
      60, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
    caller.interrupt() // the q.stop() shape: abort the awaiting thread
    caller.join(30000)
    caller.isAlive shouldBe false
    // the sibling's Spark job must die promptly — not run to completion
    val deadline = System.nanoTime() + 20L * 1000000000L
    while (!jobDied.get() && !jobFinished.get() && System.nanoTime() < deadline)
      Thread.sleep(100)
    jobDied.get() shouldBe true
    jobFinished.get() shouldBe false
  }

  test("stagingThreads=1 degrades to serial in-order staging") {
    val base = java.nio.file.Files.createTempDirectory("graft-stg1").toString
    val sm = new StreamingMerge(spark, base, Seq(rel), s"$base/_log",
      stagingThreads = 1)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    sm.eachTableConcurrently(Seq("x", "y", "z")) { t =>
      order += t; t
    } shouldBe Seq("x", "y", "z")
    order.toSeq shouldBe Seq("x", "y", "z")
  }
}

/** Task-side rendezvous for the cancellation tests: local-mode tasks run
  * in this JVM, so a static map reaches them without capture — the
  * closure serializes only its test's String key and looks the latch up
  * here. Keyed PER TEST (not one shared `var`): a cancelled test's
  * straggler task can still execute its countDown after the next test
  * begins, and on a shared latch that counts the NEXT test's rendezvous
  * down before its own job is airborne — silently degrading the
  * in-flight scenario to cancel-before-submit. */
object ConcurrentStagingSpec {
  val jobStarted =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CountDownLatch]()
}
