package graft

/** Spawn a fresh child JVM running one of this package's mains — the
  * bench-isolation primitive shared by [[Bench]] (chronic sweep rows)
  * and [[BenchSf1]] (scaling-tier rows). A fresh heap per measured
  * row is the only state a fence can actually guarantee: forced-GC
  * fences inside one long sweep JVM demonstrably failed three rounds
  * running (r11: nyc_10x 163 s in-sweep vs 47 s isolated, code
  * identical; r12: q147_triangles x10 flapping 8.6 s vs 31 s between
  * two BenchSf1 sweeps).
  *
  * The child gets the parent's classpath (run/fork:=true hands this
  * JVM a real -cp), the same -Xmx, the JDK-17 --add-opens set Spark
  * needs, the parent's environment (SPARK_GRAFT_* knobs), and any
  * extra -D system properties (the shared artifact-store root).
  * Returns (exit code, captured stdout lines); child stderr is
  * inherited so Spark chatter stays visible in the parent's log.
  */
private[graft] object ChildJvm {
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def spawn(mainClass: String, args: Seq[String],
            props: Map[String, String]): (Int, List[String]) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd: Seq[String] =
      Seq(javaBin) ++ addOpens ++
        Seq(s"-Xmx${Runtime.getRuntime.maxMemory()}",
          "-Dspark.ui.enabled=false") ++
        props.map { case (k, v) => s"-D$k=$v" } ++
        Seq("-cp", System.getProperty("java.class.path"), mainClass) ++
        args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    // read stdout to EOF BEFORE waitFor: the few protocol lines fit
    // any pipe buffer, but draining first makes deadlock impossible
    val out = scala.io.Source.fromInputStream(
      p.getInputStream, "UTF-8").getLines().toList
    (p.waitFor(), out)
  }
}
