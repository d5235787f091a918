package graft.engine

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Concurrent driver-side job submission (optimization guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them sequentially.
  * Operators whose construction runs INDEPENDENT eager work (seeded k-means
  * fits, multi-variant estimator fits, eager checkpoints of disjoint
  * sub-chains) submit the pieces through [[all]]/[[two]] so later jobs'
  * tasks back-fill cores freed by earlier jobs' stragglers instead of
  * waiting for a fully-drained scheduler between every fit.
  *
  * Results are UNCHANGED by construction: every thunk is a pure function of
  * its own (deterministic) input — same data, same layout, same seed — and
  * the default FIFO scheduler only interleaves the independent jobs'
  * stages; no thunk reads another's output. Thread-locals (job
  * descriptions/groups) are per-thread, so concurrent thunks cannot clobber
  * each other's labels either.
  */
object Par {
  // unbounded cached pool: thunks block on Spark actions most of their
  // life, so a fixed pool sized to cores would deadlock nested Par calls
  // (an outer thunk waiting on inner fits would hold a slot the inner fit
  // needs). Daemon threads — never block JVM exit.
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool { r =>
        val t = new Thread(r, "graft-par"); t.setDaemon(true); t
      })

  /** Run every thunk concurrently; return results in input order. */
  def all[T](thunks: Seq[() => T]): Seq[T] = {
    val fs = thunks.map(t => Future(t())(pool))
    fs.map(Await.result(_, Duration.Inf))
  }

  /** Two heterogeneous thunks concurrently. */
  def two[A, B](a: () => A, b: () => B): (A, B) = {
    val fa = Future(a())(pool)
    val fb = Future(b())(pool)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
