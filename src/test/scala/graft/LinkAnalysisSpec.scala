package graft

import graft.ops.LinkAnalysis

/** ops.LinkAnalysis: fixed-point integer PageRank (q123). */
class LinkAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed two-round ranks on a path graph") {
    // 1 - 2 - 3: deg 1,2,1
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // round 1: r(1) = r(3) = 150000 + 85*(1000000 div 2) div 100 = 575000
    //          r(2) = 150000 + 85*(1000000 + 1000000) div 100 = 1850000
    val r1 = LinkAnalysis.pageRankFixed(pairs, rounds = 1)
      .as[(Long, Long)].collect().toSet
    assert(r1 == Set((1L, 575000L), (2L, 1850000L), (3L, 575000L)))
    // round 2: r(2) = 150000 + 85*(575000 + 575000) div 100 = 1127500
    //          r(1) = r(3) = 150000 + 85*(1850000 div 2) div 100 = 936250
    val r2 = LinkAnalysis.pageRankFixed(pairs, rounds = 2)
      .as[(Long, Long)].collect().toSet
    assert(r2 == Set((1L, 936250L), (2L, 1127500L), (3L, 936250L)))
  }

  test("rank is partition-independent and hub-dominant") {
    // star: hub 0 linked to 1..5 plus an isolated pair 8-9
    val pairs = ((1L to 5L).map(i => (0L, i)) :+ (8L, 9L))
      .toDF("id_a", "id_b")
    val base = LinkAnalysis.pageRankFixed(pairs, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val rep = LinkAnalysis.pageRankFixed(pairs.repartition(7), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(base == rep)
    assert((1L to 5L).forall(i => base(0L) > base(i)))
    assert(base(8L) == base(9L))
  }
}
