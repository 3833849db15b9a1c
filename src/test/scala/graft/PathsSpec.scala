package graft

import java.sql.Timestamp
import graft.ops.Paths

/** ops.Paths: within-session event-type trigram mining. */
class PathsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("trigrams stay inside a session and inside a user") {
    val events = Seq(
      // user 1, one session: view click purchase error
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(10), "click"),
      (1L, 3L, ts(20), "purchase"), (1L, 4L, ts(30), "error"),
      // user 1, later session (gap > 1800): view click  (too short)
      (1L, 5L, ts(5000), "view"), (1L, 6L, ts(5010), "click"),
      // user 2: single event, no trigram
      (2L, 7L, ts(0), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Paths.sessionPathTrigrams(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, String, Long)].collect().toSet
    assert(out == Set(
      ("view", "click", "purchase", 1L),
      ("click", "purchase", "error", 1L)))
  }

  test("a session break between steps kills the straddling trigram") {
    val events = Seq(
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(10), "click"),
      (1L, 3L, ts(10 + 1801), "purchase") // new session
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Paths.sessionPathTrigrams(events, "user_id", "ts",
      "event_id", "event_type")
    assert(out.isEmpty)
  }

  test("counts aggregate across users; output bounded by |types|^3") {
    val events = (1L to 10L).flatMap(u => Seq(
      (u, u * 10 + 1, ts(0), "view"), (u, u * 10 + 2, ts(5), "click"),
      (u, u * 10 + 3, ts(9), "purchase")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Paths.sessionPathTrigrams(events, "user_id", "ts",
        "event_id", "event_type")
      .as[(String, String, String, Long)].collect()
    assert(out.toSeq == Seq(("view", "click", "purchase", 10L)))
  }
}
