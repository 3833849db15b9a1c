package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization — the memory
  * lever for embedding stores at corpus scale: 100 TB of float32
  * embeddings is 25 TB as int8 + one float scale per vector, which is
  * the difference between an ANN index that fits executor memory and
  * one that spills. Each vector quantizes independently
  * (`scale = maxAbs/127`, `q_i = round(x_i/scale)`), so quantization
  * is a narrow per-row map — no shuffle, no corpus statistics, and
  * any slice of the corpus can be (de)quantized without the rest.
  *
  * Everything here is bit-deterministic across engines: max/abs are
  * exact, one IEEE division per element feeds one ties-away-from-zero
  * round (Spark's HALF_UP and DuckDB's round both tie away from
  * zero), so the q75 oracle hash-compares every quantized value. An
  * all-zero vector has scale 0 and quantizes to zeros rather than
  * dividing by it.
  */
object Quantize {
  /** scale = maxAbs/127 of a double array column. */
  private def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** (id, scale, q: array<int>) — int elements rather than tinyint so
    * the frame round-trips parquet/JSONL/oracles without sign-byte
    * surprises; a production sink would pack to bytes at write time. */
  def int8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Vectors.asDouble(col(vecCol))
    val s = scaleOf(v)
    emb.select(col(idCol), s.as("scale"),
      when(s === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => round(x / s).cast("int")))
        .as("q"))
  }

  /** [[int8]] exploded to one row per (vector, dimension) — the
    * scalar-row shape the q75 oracle hash-compares (array cells do
    * not survive the gate's pandas canonicalization), with the exact
    * per-element reconstruction error in 1e-6 integer units (error
    * magnitudes are < scale/2 ≈ 0.004 here, so micro-units keep the
    * column integral and the hash exact). */
  def int8Rows(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Vectors.asDouble(col(vecCol))
    val exploded = emb
      .select(col(idCol), v.as("v"))
      .select(col(idCol), scaleOf(col("v")).as("scale"),
        posexplode(col("v")).as(Seq("dim", "x")))
    exploded.select(col(idCol), col("dim"), col("scale"),
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(col("x") / col("scale")).cast("int")).as("qval"),
        col("x"))
      .withColumn("err_1e6",
        round((col("x") - col("qval") * col("scale")) * lit(1e6)).cast("long"))
      .drop("x")
  }

  /** Exact int8 brute-force top-k — [[Ann.bruteForceTopK]] over the
    * QUANTIZED corpus. The approximate cosine needs NO scales at all:
    * cos(c, q) ≈ (s_c·s_q·dot_int) / (s_c·|cq| · s_q·|qq|), and the
    * per-vector scales cancel — the score is the plain cosine of the
    * INTEGER vectors, an all-integer inner loop plus one divide (the
    * arithmetic an int8-SIMD kernel runs; keeping a stray scale
    * factor in would bias the ranking toward large-scale candidates,
    * a bug the recall measurement caught immediately). Recall vs the
    * float ranking is measured in docs/RECALL.md — only
    * neighbor-boundary pairs whose cosine gap is below the
    * quantization noise can flip. */
  def bruteForceTopKInt8(emb: DataFrame, queries: DataFrame, k: Int,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    // no numeric-id guard: ties break by plain ascending id (any
    // orderable type), same as the float twin Ann.bruteForceTopK —
    // only the -id-encoding operators need NumericType
    // exact long-of-int-products math, as one codegen'd kernel call per
    // pair instead of an interpreted aggregate(zip_with(...)) per
    // element (the rerank loop is candidates × dim — the hot spot)
    import graft.functions.exprs.dot_product_l
    def intNorm(c: Column): Column =
      sqrt(dot_product_l(c, c).cast("double"))
    val corpus = int8(emb, idCol, vecCol)
      .select(col(idCol).as("id"), col("q").as("cq"))
    val q = int8(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("q").as("qq"))
    val dotInt = dot_product_l(col("cq"), col("qq"))
    val denom = intNorm(col("cq")) * intNorm(col("qq"))
    val scored = corpus.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("sim",
        when(denom === 0.0, lit(-2.0)) // zero vector sorts last
          .otherwise(dotInt.cast("double") / denom))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id").as(idCol), col("sim"), col("rank"))
  }
}
