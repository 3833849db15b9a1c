package graft

/** Host-contention canary for the bench sweep.
  *
  * Four consecutive rounds the official bench artifact carried rows
  * 2–13× their band that a judge re-measured clean the same day
  * (r12: q147_build 97.7 s vs 10.26 isolated) — host-window CPU
  * contention, which neither in-JVM fences (r11) nor fresh child
  * JVMs (r12) can see, because both only control JVM-internal state.
  * The fix is to MEASURE the host: a pinned, allocation-free CPU
  * workload runs at sweep start and between measurement windows; a
  * window whose bracketing canaries read hot gets its rows re-run
  * once, and rows that still exceed 2× their previously committed
  * value are marked `"suspect"` in BENCH_RESULTS.json instead of
  * silently poisoning the round-over-round diff.
  *
  * The workload: one thread per hardware thread, each spinning a
  * fixed-iteration xorshift mix (zero allocation, zero memory
  * traffic beyond the loop — insensitive to heap state and page
  * cache, which the canary must NOT measure; GC pauses are the
  * child-JVM/fence problem, already solved). Oversubscription from a
  * co-tenant process lowers every thread's share, so wall time
  * scales ~linearly with host load — an 8-thread probe on a 32-core
  * host would read a fully-loaded box at only ~1.25×, under any
  * useful threshold, which is why the probe uses ALL cores.
  *
  * Thresholds: a window reading > [[hotThreshold]] (1.3×) triggers
  * one re-run of its rows (min of old/new kept — the re-run can
  * itself land hot, so the marker logic below still applies);
  * a final value > 2× its previously committed value is `suspect`.
  * Both rules are the r12 verdict's prescription verbatim. */
object BenchCanary {
  @volatile private var sink = 0L // defeats dead-code elimination

  /** Iterations per thread for a ~0.5–1 s probe; fixed, so every
    * sample measures the same work. Calibrated once on the dev host
    * (32 hw threads, ~3 ns/iter effective) — the BASELINE sample
    * normalizes away absolute speed, only ratios matter. */
  val itersPerThread: Long = 200000000L

  val hotThreshold = 1.3
  val suspectFactor = 2.0

  private def burn(n: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  /** One probe: wall seconds for all threads to finish the fixed
    * workload. Thread count defaults to every hardware thread (see
    * scaladoc: partial-width probes under-read co-tenant load). */
  def measureOnce(
      nThreads: Int = Runtime.getRuntime.availableProcessors(),
      iters: Long = itersPerThread): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until nThreads).map { _ =>
      val t = new Thread(() => { sink ^= burn(iters) })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** JIT warm-up: a short untimed burn so the first real sample does
    * not measure compilation. */
  def warm(): Unit = { sink ^= burn(itersPerThread / 20) }

  // ---------------------------------------------------------- pure
  // decision logic, unit-tested in BenchCanarySpec

  /** A window's contention ratio: the hotter of its two bracketing
    * samples over the sweep's running-min baseline. max, not mean —
    * contention starting mid-window shows in only one bracket. */
  def windowRatio(pre: Double, post: Double, baseline: Double): Double = {
    require(baseline > 0, s"baseline must be > 0, got $baseline")
    math.max(pre, post) / baseline
  }

  def needsRerun(ratio: Double): Boolean = ratio > hotThreshold

  /** Suspect = still past 2× the previously committed value after the
    * re-run opportunity. New rows (no committed value) and failed
    * rows (-1 markers, either side) are never suspect — a failure is
    * its own visible marker, and a first measurement has no band. */
  def isSuspect(value: Double, prevCommitted: Option[Double]): Boolean =
    value >= 0 && prevCommitted.exists(p => p > 0 && value > suspectFactor * p)

  /** Parse the committed BENCH_RESULTS.json's `"name": seconds` rows.
    * The file is this repo's own pretty-printer output (one row per
    * line, Locale.ROOT decimals), so a line regex is exact — no JSON
    * library exists on the classpath and none is needed. Returns
    * empty on a missing/unreadable file: first run, no bands. */
  def parseCommitted(path: java.nio.file.Path): Map[String, Double] = {
    if (!java.nio.file.Files.isReadable(path)) return Map.empty
    val row = """^\s*"([^"]+)":\s*(-?\d+(?:\.\d+)?),?\s*$""".r
    scala.util.Using(scala.io.Source.fromFile(path.toFile)) { src =>
      // only rows inside the "queries" object count — the sibling
      // "canary_ratio" object's rows are shaped identically
      var inQueries = false
      val out = Map.newBuilder[String, Double]
      src.getLines().foreach { l =>
        val t = l.trim
        if (t.startsWith("\"queries\"")) inQueries = true
        else if (inQueries && (t == "}" || t == "},")) inQueries = false
        else if (inQueries) t match {
          case row(k, v) => out += (k -> v.toDouble)
          case _ => ()
        }
      }
      out.result()
    }.getOrElse(Map.empty)
  }
}
