package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchCanary's pure decision logic: window ratios, the re-run and
  * suspect thresholds, and the committed-artifact parser the suspect
  * rule reads its bands from. The measurement half (measureOnce) is
  * exercised for shape only — absolute timings are host property,
  * not a unit-testable contract. */
class BenchCanarySpec extends AnyFunSuite {

  test("windowRatio takes the hotter bracket; needsRerun at >1.3x") {
    assert(BenchCanary.windowRatio(1.0, 1.0, 1.0) == 1.0)
    // contention starting mid-window shows in only one bracket
    assert(BenchCanary.windowRatio(1.0, 2.6, 1.0) == 2.6)
    assert(BenchCanary.windowRatio(2.6, 1.0, 1.0) == 2.6)
    assert(math.abs(BenchCanary.windowRatio(0.9, 1.2, 0.8) - 1.5) < 1e-12)
    assert(!BenchCanary.needsRerun(1.3))
    assert(BenchCanary.needsRerun(1.31))
    intercept[IllegalArgumentException] {
      BenchCanary.windowRatio(1.0, 1.0, 0.0)
    }
  }

  test("isSuspect: >2x previous committed; new/failed rows never suspect") {
    assert(BenchCanary.isSuspect(21.0, Some(10.0)))
    assert(!BenchCanary.isSuspect(20.0, Some(10.0))) // exactly 2x: in band
    assert(!BenchCanary.isSuspect(21.0, None)) // first measurement
    assert(!BenchCanary.isSuspect(-1.0, Some(10.0))) // failure marker
    assert(!BenchCanary.isSuspect(5.0, Some(-1.0))) // prev was a failure
    assert(!BenchCanary.isSuspect(5.0, Some(0.0)))
  }

  test("parseCommitted reads only the queries object of our own format") {
    val dir = java.nio.file.Files.createTempDirectory("canary_spec_")
    val f = dir.resolve("BENCH_RESULTS.json")
    java.nio.file.Files.writeString(f,
      """{
        |  "metric": "total",
        |  "value": 455.6,
        |  "unit": "sec",
        |  "sf": "/root/testdata/sf0.1",
        |  "canary_baseline_sec": 0.812,
        |  "suspect": ["q147_build"],
        |  "rerun": [],
        |  "queries": {
        |    "q01_pricing_summary": 0.412,
        |    "q147_build": 10.260,
        |    "zz_failed_row": -1.000
        |  },
        |  "canary_ratio": {
        |    "q01_pricing_summary": 1.02,
        |    "q147_build": 4.20
        |  }
        |}
        |""".stripMargin)
    try {
      val m = BenchCanary.parseCommitted(f)
      assert(m == Map("q01_pricing_summary" -> 0.412,
        "q147_build" -> 10.26, "zz_failed_row" -> -1.0))
      // the ratio object's identically-shaped rows must NOT leak in
      assert(m.get("q147_build").contains(10.26))
      // missing file: empty, not a throw
      assert(BenchCanary.parseCommitted(dir.resolve("nope.json")).isEmpty)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("parseCommitted reads the pre-r13 artifact shape (no canary objects)") {
    val dir = java.nio.file.Files.createTempDirectory("canary_spec_old_")
    val f = dir.resolve("old.json")
    java.nio.file.Files.writeString(f,
      "{\n  \"metric\": \"total\",\n  \"value\": 10.0,\n  \"unit\": \"sec\",\n" +
        "  \"sf\": \"x\",\n  \"queries\": {\n    \"q01\": 1.500,\n" +
        "    \"q02\": 2.000\n  }\n}\n")
    try assert(BenchCanary.parseCommitted(f) ==
      Map("q01" -> 1.5, "q02" -> 2.0))
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("measureOnce returns positive wall seconds for a tiny probe") {
    BenchCanary.warm()
    val s = BenchCanary.measureOnce(nThreads = 2, iters = 1000000L)
    assert(s > 0 && s < 30)
  }

  test("measureBandwidth returns positive wall seconds; buffers reused") {
    // tiny buffers so the unit test doesn't allocate 256 MiB
    val s1 = BenchCanary.measureBandwidth(nThreads = 2, passes = 2,
      bufLongs = 1 << 12)
    val s2 = BenchCanary.measureBandwidth(nThreads = 2, passes = 2,
      bufLongs = 1 << 12)
    assert(s1 > 0 && s1 < 30)
    assert(s2 > 0 && s2 < 30)
  }
}
