package graft

/** Spark-free CPU control for the benchmark artifact.
  *
  * The bench host drifts by EPOCH invisibly to `/proc/loadavg`
  * (host-level co-tenancy: the identical PlanAudit-pinned scoring
  * kernel measured 26.1 s at one hour and 32.6 s at another, loadavg
  * ≤ 2.6 both times). A graded number from a degraded epoch is
  * indistinguishable from a code regression unless the artifact itself
  * carries a machine-attributable control — so `graft.Bench` runs this
  * pure-JVM integer loop (no Spark, no allocation, no memory traffic
  * beyond one cache line per thread) before its first timed phase and
  * after its last scoring pass, and reports both rates next to the
  * headline. The loop is the same xorshift64 workload used for the
  * hardware-ceiling scaling measurements in BENCH.md, chosen because
  * its throughput depends only on available CPU cycles: co-tenant
  * steal shows up here exactly as it does in the codegen'd similarity
  * kernel, while disk/shuffle interference does not inflate it.
  */
object CpuControl {

  /** ops = xorshift64 steps (3 shift+xor per step counts as 1 op). */
  final val ItersPerThread: Long = 300000000L

  /** timed windows per measurement — single ~1 s windows swing ±30%
    * even at loadavg 0.3 (scheduler noise); the MAX of three is the
    * peak available rate, which is the quantity a degraded epoch
    * suppresses (calibration: quiescent max-of-3 is stable ±5% while
    * single windows ranged 9.8e9–1.38e10 in one minute). */
  final val Windows: Int = 3

  private def spin(seed: Long, iters: Long): Long = {
    var x = 0x9e3779b97f4a7c15L ^ seed
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  /** Aggregate xorshift steps/sec across `threads` concurrent threads:
    * max over [[Windows]] timed windows (peak available rate). One
    * short single-thread pass first so C2 has compiled `spin` before
    * the first timed window.
    */
  def measure(threads: Int): Double = {
    if (spin(1L, 10000000L) == 0L) println("") // JIT warmup + DCE sink
    val sink = new java.util.concurrent.atomic.AtomicLong()
    def window(): Double = {
      val ts = (0 until threads).map { t =>
        new Thread(() => { sink.addAndGet(spin(t.toLong, ItersPerThread)) })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start())
      ts.foreach(_.join())
      threads * ItersPerThread / ((System.nanoTime() - t0) / 1e9)
    }
    val best = (1 to Windows).map(_ => window()).max
    if (sink.get() == 42L) println("") // defeat dead-code elimination
    best
  }

  /** Calibration main: prints N control measurements so the quiescent
    * reference constant in [[Bench]] can be re-pinned after a hardware
    * change. Usage: `sbt "runMain graft.CpuControl [threads] [reps]"`.
    */
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      println(f"cpu_control[$i] threads=$threads ops_per_sec=${measure(threads)}%.3e")
    }
  }
}
