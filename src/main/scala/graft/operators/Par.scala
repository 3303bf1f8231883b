package graft.operators

/** Overlap independent Spark jobs (optimization guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. The fixed-overhead-bound store flows (fsck census legs,
  * multi-store fixture builds) are chains of many SMALL jobs whose cost
  * is scheduling latency, not compute; submitting independent chains from
  * a bounded pool lets one chain's jobs back-fill the idle cores of
  * another's tail, collapsing wall time without touching any plan.
  *
  * Determinism: results return in CALL order regardless of completion
  * order, so a caller that concatenates them produces the exact sequence
  * the serial loop produced. Failures propagate: the first thunk
  * exception rethrows (unwrapped) after the pool drains.
  */
object Par {

  def run[A](thunks: Seq[() => A], parallelism: Int = 8): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
  }

  /** Side-effecting variant: run independent units, wait for all. */
  def unit(thunks: (() => Unit)*): Unit = {
    val _ = run[Unit](thunks)
  }
}
