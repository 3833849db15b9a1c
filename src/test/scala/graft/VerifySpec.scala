package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verify's SPARK_GRAFT_ONLY filter: the iteration workflow's query
  * selector must match on the number-token boundary — an over-match
  * silently runs extra queries and, worse, lets a typo'd filter look
  * like it covered a query it skipped. */
class VerifySpec extends AnyFunSuite {
  private def sel(filter: String, names: String*): Seq[String] = {
    val only = Some(filter.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    names.filter(n => Verify.wanted(only, n))
  }

  test("q16 selects q16_* but never q160-q169") {
    assert(sel("q16", "q16_window", "q160_first_carrier", "q161_x",
      "q166_y", "q1_agg") == Seq("q16_window"))
  }

  test("q1 selects only q1_*, not q10-q19 or q100+") {
    assert(sel("q1", "q1_agg", "q10_weekly", "q100_z", "q19_a",
      "q1_other") == Seq("q1_agg", "q1_other"))
  }

  test("exact full names and comma lists both match") {
    assert(sel("q160_first_carrier,q16", "q16_window",
      "q160_first_carrier", "q165_k") ==
      Seq("q16_window", "q160_first_carrier"))
  }

  test("no filter means everything runs") {
    assert(Verify.wanted(None, "q999_anything"))
  }
}
