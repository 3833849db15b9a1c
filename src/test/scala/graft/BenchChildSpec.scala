package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench <-> BenchChild subprocess protocol: the parent's parser
  * against well-formed rows, interleaved chatter, and the emitter's
  * own output format — the seam a silent parse failure would turn
  * into a phantom -1 bench row. */
class BenchChildSpec extends AnyFunSuite {

  test("parses measured rows and ignores non-protocol lines") {
    val out = Seq(
      "WARN some spark chatter",
      "[bench-child] nyc_10x_gen 9.1234",
      "using builtin-java classes where applicable",
      "[bench-child] nyc_10x_pipeline 36.5000",
      "")
    assert(Bench.parseChildLines(out) ==
      Map("nyc_10x_gen" -> 9.1234, "nyc_10x_pipeline" -> 36.5))
  }

  test("drops malformed lines instead of failing the sweep") {
    val out = Seq(
      "[bench-child] q24_ngram_jaccard_pairs 3.21",
      "[bench-child] missing_value",           // no number
      "[bench-child] bad_number not-a-double", // unparseable
      "[bench-child] too many fields 1.0")     // wrong arity
    assert(Bench.parseChildLines(out) ==
      Map("q24_ngram_jaccard_pairs" -> 3.21))
  }

  test("empty capture parses to the empty map (parent reports -1)") {
    assert(Bench.parseChildLines(Nil).isEmpty)
  }

  test("the emitter's own format round-trips through the parser") {
    // BenchChild prints via String.format(Locale.ROOT, "%.4f") — the
    // exact line the parent must accept, whatever the JVM locale
    val line = String.format(java.util.Locale.ROOT,
      "[bench-child] %s %.4f", "ingest_loop_tick",
      java.lang.Double.valueOf(7.8912))
    assert(Bench.parseChildLines(Seq(line)) ==
      Map("ingest_loop_tick" -> 7.8912))
  }
}
