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
  * The workload is TWO components, sampled back to back ([[Probe]]):
  *
  *  - ALU: one thread per hardware thread, each spinning a
  *    fixed-iteration xorshift mix (zero allocation, zero memory
  *    traffic beyond the loop — insensitive to heap state and page
  *    cache; GC pauses are the child-JVM/fence problem, already
  *    solved). Oversubscription from a co-tenant process lowers
  *    every thread's share, so wall time scales ~linearly with host
  *    CPU load — an 8-thread probe on a 32-core host would read a
  *    fully-loaded box at only ~1.25×, under any useful threshold,
  *    which is why the probe uses ALL cores.
  *  - BANDWIDTH: the same thread fan-out, each streaming a fixed
  *    number of sequential passes over its own 8 MiB long array
  *    (256 MiB aggregate — far past any LLC, so the passes are
  *    DRAM-bound). The r13 driver sweep proved the ALU probe's
  *    deliberate blindness has a cost: 11 rows inflated 2.4–6.1×
  *    by memory-bandwidth/page-cache contention shipped with every
  *    window ratio ≤1.29 — invisible to a probe with no memory
  *    traffic. The buffers are allocated ONCE and reused, so
  *    repeated samples stay allocation-free (no GC signal leaks in).
  *
  * Thresholds: a window whose HOTTER component reads >
  * [[hotThreshold]] (1.3×) against that component's running-min
  * baseline triggers one re-run of its rows (min of old/new kept —
  * the re-run can itself land hot, so the marker logic below still
  * applies). Independently, a row whose value exceeds
  * [[suspectFactor]] (2×) its previously committed value gets the
  * same single re-run even when every window read cool (the r13
  * blind spot: contention the probes miss but Spark rows feel), and
  * is marked `suspect` only if STILL over after it. */
object BenchCanary {
  @volatile private var sink = 0L // defeats dead-code elimination

  /** One sample of both probe components, wall seconds each. */
  final case class Probe(alu: Double, bw: Double)

  /** Iterations per thread for a ~0.5–1 s ALU probe; fixed, so every
    * sample measures the same work. Calibrated once on the dev host
    * (32 hw threads, ~3 ns/iter effective) — the BASELINE sample
    * normalizes away absolute speed, only ratios matter. */
  val itersPerThread: Long = 200000000L

  /** Bandwidth probe sizing: 8 MiB of longs per thread (256 MiB
    * aggregate on 32 threads — past any LLC, so passes stream DRAM),
    * 48 sequential passes ≈ 12 GiB of traffic ≈ 0.2–0.5 s on a
    * typical server. Fixed work; only ratios matter. */
  val bwBufLongs: Int = 1 << 20
  val bwPasses: Int = 48

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

  // per-thread stream buffers, allocated once and reused: a probe
  // that allocates 256 MiB per sample would MAKE the GC pressure it
  // is supposed to observe from outside
  private val bwBufs = new java.util.concurrent.ConcurrentHashMap[
    Long, Array[Long]]()
  private def stream(slot: Int, passes: Int, bufLongs: Int): Long = {
    val buf = bwBufs.computeIfAbsent(
      (slot.toLong << 32) | bufLongs.toLong, _ => {
      val a = new Array[Long](bufLongs)
      var i = 0
      while (i < a.length) { a(i) = i.toLong * 0x9E3779B97F4A7C15L; i += 1 }
      a
    })
    var acc = 0L
    var p = 0
    while (p < passes) {
      var i = 0
      while (i < buf.length) { acc += buf(i); i += 1 }
      p += 1
    }
    acc
  }

  /** One ALU probe: wall seconds for all threads to finish the fixed
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

  /** One BANDWIDTH probe: wall seconds for all threads to stream
    * their fixed pass count. Same all-cores rationale as the ALU
    * probe; what it adds is sensitivity to the resource the ALU spin
    * deliberately avoids (DRAM bandwidth, and by extension the page
    * cache churn that competes for it). */
  def measureBandwidth(
      nThreads: Int = Runtime.getRuntime.availableProcessors(),
      passes: Int = bwPasses,
      bufLongs: Int = bwBufLongs): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until nThreads).map { slot =>
      val t = new Thread(() => { sink ^= stream(slot, passes, bufLongs) })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Both components, back to back — the sweep's sampling unit. */
  def measureBoth(
      nThreads: Int = Runtime.getRuntime.availableProcessors()): Probe =
    Probe(measureOnce(nThreads), measureBandwidth(nThreads))

  /** JIT warm-up: a short untimed burn of both components so the
    * first real sample measures neither compilation nor the one-time
    * buffer fill. */
  def warm(): Unit = {
    sink ^= burn(itersPerThread / 20)
    measureBandwidth(passes = 2)
  }

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
