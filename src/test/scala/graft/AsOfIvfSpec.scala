package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf
import graft.sim.Ann

/** ops.AsOf + Ann.ivfTopK: point-in-time joins and IVF ANN. */
class AsOfIvfSpec extends SparkTestBase {
  import spark.implicits._

  test("lastObservation carries the latest at-or-before value forward") {
    val df = Seq(
      (1L, 1L, 10, "obs", 100.0),
      (1L, 2L, 20, "x", 0.0),
      (1L, 3L, 30, "obs", 300.0),
      (1L, 4L, 40, "x", 0.0),
      (2L, 5L, 15, "x", 0.0) // user with no observation → null
    ).toDF("user", "id", "t", "kind", "v")
    val out = AsOf.lastObservation(df, Seq(col("user")), col("t"), col("id"),
      col("kind") === "obs", "last_v" -> col("v"))
      .select("id", "last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out(1L) == 100.0 && out(2L) == 100.0)
    assert(out(3L) == 300.0 && out(4L) == 300.0)
    assert(out(5L) == null)
  }

  test("lastObservation attaches a same-timestamp observation regardless of tiebreak") {
    val df = Seq(
      (1L, 5L, 10, "x", 0.0),    // same t as the obs, SMALLER tiebreak
      (1L, 9L, 10, "obs", 42.0), // the tie observation
      (1L, 12L, 11, "x", 0.0),
      (2L, 20L, 10, "obs", 7.0),
      (2L, 21L, 10, "obs", 8.0), // two obs at one t: greatest tiebreak wins
      (2L, 22L, 10, "x", 0.0)
    ).toDF("user", "id", "t", "kind", "v")
    val out = AsOf.lastObservation(df, Seq(col("user")), col("t"), col("id"),
      col("kind") === "obs", "last_v" -> col("v"))
      .select("id", "last_v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(5L) == 42.0)  // ASOF t >= obs_t includes the tie
    assert(out(12L) == 42.0)
    assert(out(20L) == 8.0 && out(21L) == 8.0 && out(22L) == 8.0)
  }

  test("lastObservation propagates a NULL value from the latest observation row") {
    // the per-column carry mixed rows here: last_v came from the older
    // observation while last_t came from the newer one
    val df = Seq(
      (1L, 1L, 10, "obs", Some(100.0)),
      (1L, 2L, 20, "obs", None), // latest observation holds a NULL value
      (1L, 3L, 30, "x", Some(0.0))
    ).toDF("user", "id", "t", "kind", "v")
    val r = AsOf.lastObservation(df, Seq(col("user")), col("t"), col("id"),
      col("kind") === "obs", "last_v" -> col("v"), "last_t" -> col("t"))
      .filter(col("id") === 3L).head()
    assert(r.isNullAt(r.fieldIndex("last_v")), "NULL must come through")
    assert(r.getInt(r.fieldIndex("last_t")) == 20, "ts from the same obs row")
  }

  test("ivfTopK sims are exact for returned pairs and recall is sane") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 6)
    val bf = Ann.bruteForceTopK(e, q, k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(e, q, k = 5, nCentroids = 8, nProbe = 4)
    val got = ivf.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall=$recall") // random vectors; probing half the lists
    // returned sims must equal the exact cosine (IVF only restricts candidates)
    val bfSims = Ann.bruteForceTopK(e, q, k = 200)
      .select("qid", "vec_id", "sim").as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => ((a, b), s) }.toMap
    ivf.select("qid", "vec_id", "sim").as[(Long, Long, Double)].collect()
      .foreach { case (a, b, s) =>
        bfSims.get((a, b)).foreach(exact => assert(exact == s))
      }
  }
}
