package graft.ops

/** Run INDEPENDENT driver-side Spark actions from a small thread pool
  * (r20 optimization round, guide §2.6 "Overlap independent jobs"):
  * Spark happily schedules several jobs at once inside one application —
  * actions are only sequential because the driver calls them
  * sequentially. A composed turn that commits to several disjoint sinks
  * (the k21 curate/retract/maintain fan-outs) spends much of its wall
  * clock in per-write commit latency and stage tails; 2-3 jobs in
  * flight let the next sink's tasks back-fill executors freed by the
  * current one's tail. FIFO scheduling (the default) is exactly the
  * back-fill behaviour wanted.
  *
  * Results come back in task order. Every submitted task runs to
  * completion (or failure) before this returns; the FIRST failure is
  * then rethrown (its cause, not the ExecutionException wrapper), so a
  * failed turn never leaves detached jobs running — and since each
  * fanned-out family's own operation is crash-atomic and
  * replay-idempotent (their scaladocs' at-least-once arguments), a turn
  * in which some families succeeded and one failed replays exactly like
  * the serial version's partial failure did.
  */
object DriverPool {
  def run[T](tasks: Seq[() => T], parallelism: Int = 3): Seq[T] = {
    if (tasks.isEmpty) return Nil
    if (tasks.size == 1) return Seq(tasks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    try {
      val futs = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[T] { def call(): T = t() }))
      val results = futs.map(f => scala.util.Try(f.get()))
      results.foreach {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException)
          if e.getCause != null => throw e.getCause
        case scala.util.Failure(e) => throw e
        case _ =>
      }
      results.map(_.get)
    } finally pool.shutdown()
  }
}
