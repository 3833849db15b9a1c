package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT rank windows for low-cardinality partitions.
  *
  * `Window.partitionBy(seg)` funnels each segment's entire population
  * through ONE reducer's sort — correct, but with 5 market segments at
  * 100 TB that is five reducers doing all the work (the q38 caveat in
  * SCALE.md). This operator computes the SAME ranks two-phase:
  *
  *  1. a mergeable quantile sketch (`percentile_approx`, map-side
  *     combinable, tiny result) splits each segment's value range into
  *     `nBuckets` contiguous buckets — broadcast back;
  *  2. per-(segment, bucket) counts (a second tiny aggregate) turn
  *     into cumulative row offsets via a window over the BUCKET frame
  *     (|segments|·nBuckets rows — driver-scale, whatever the corpus);
  *  3. the per-row rank is the bucket's offset plus the row's rank
  *     within its (segment, bucket) window — parallelism is now
  *     |segments|·nBuckets, and each sort handles ~1/nBuckets of a
  *     segment. Raise nBuckets as data grows; the sketch and count
  *     frames stay tiny.
  *
  * Ranks are EXACT, not approximate: the sketch only places bucket
  * BOUNDARIES, and any boundary placement yields correct ranks —
  * bucket membership is by value comparison, so ties always land in
  * the same bucket and `offset + rank-within-bucket` telescopes to the
  * global rank. A skewed sketch only unbalances bucket sizes, never
  * results. `orderCols` must be a total order (tie-free) within a
  * segment — the same requirement q38's window form has for
  * deterministic output; ntile over a non-total order is
  * underdetermined in ANY engine.
  */
object Quantiles {
  /** Row number (1-based) of each row within its `segCol` partition
    * under `orderCols`, plus the partition size — the primitives every
    * distribution statistic (ntile, percent_rank, cume_dist) derives
    * from. Output adds `__rn` and `__n` to `df`'s columns. */
  private[graft] def segmentedRowNumber(df: DataFrame, segCol: String,
                                        valCol: String, orderCols: Seq[Column],
                                        nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // 1. boundary sketch: one map-combinable agg, |segments| rows out.
    // The aggregate side's key is renamed so the joins below can use
    // null-SAFE equality (<=>): a null segment is a real partition to
    // the window form (Window.partitionBy groups nulls together), so
    // the two-phase form must rank it too, not drop it on null != null.
    val bounds = df.groupBy(col(segCol).as("__seg"))
      .agg(percentile_approx(col(valCol), typedLit(probs), lit(1000))
        .as("__bnds"))
    // 2. bucket = number of boundaries strictly below the value; equal
    // values always share a bucket, so earlier buckets hold strictly
    // smaller values and offsets compose with within-bucket ranks.
    // A segment whose values are ALL null sketches to a null __bnds —
    // coalesce those rows into bucket 0 (one bucket = the window form).
    val bucketed = df.join(broadcast(bounds), col(segCol) <=> col("__seg"))
      .withColumn("__bkt",
        coalesce(
          aggregate(col("__bnds"), lit(0),
            (acc, b) => acc + when(b < col(valCol), 1).otherwise(0)),
          lit(0)))
      .drop("__bnds", "__seg")
    // 3. per-bucket counts -> cumulative offsets. The window here runs
    // over the COUNT frame (|segments|*nBuckets rows), not the data.
    val wOff = Window.partitionBy(col("__oseg")).orderBy(col("__obkt"))
    val offsets = bucketed
      .groupBy(col(segCol).as("__oseg"), col("__bkt").as("__obkt"))
      .agg(count(lit(1)).as("__c"))
      .select(col("__oseg"), col("__obkt"),
        (sum(col("__c")).over(wOff) - col("__c")).as("__off"),
        sum(col("__c")).over(Window.partitionBy(col("__oseg"))).as("__n"))
    // 4. rank within the (segment, bucket) window + bucket offset =
    // exact global rank; parallelism |segments|*nBuckets
    val wIn = Window.partitionBy(col(segCol), col("__bkt"))
      .orderBy(orderCols: _*)
    bucketed.join(broadcast(offsets),
        col(segCol) <=> col("__oseg") && col("__bkt") === col("__obkt"))
      .withColumn("__rn", col("__off") + row_number().over(wIn))
      .drop("__bkt", "__off", "__oseg", "__obkt")
  }

  /** Scale-safe EXACT per-segment running sum of `weightCol` under a
    * total order — the weighted sibling of [[segmentedRowNumber]],
    * and the primitive behind budget cuts ("take documents in hash
    * order until the domain's token budget is reached",
    * [[Mixture.tokenBudget]]). Same three-phase shape: boundary
    * sketch on `orderNumCol`, per-(segment, bucket) weight sums with
    * prefix offsets over the tiny bucket frame, then a within-bucket
    * running sum — so no segment ever funnels through one reducer.
    *
    * `orderCols` must be a tie-free total order that REFINES
    * `orderNumCol` (equal `orderNumCol` values may order freely
    * within their shared bucket, but a row ordered earlier must never
    * have a larger `orderNumCol`) — otherwise bucket offsets and
    * within-bucket ranks would disagree about which rows precede
    * which. Output adds `__cum` (inclusive running sum, LongType) to
    * `df`'s columns. `weightCol` must be non-negative integral. */
  private[graft] def segmentedPrefixSum(df: DataFrame, segCol: String,
                                        weightCol: String, orderNumCol: String,
                                        orderCols: Seq[Column],
                                        nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bounds = df.groupBy(col(segCol).as("__seg"))
      .agg(percentile_approx(col(orderNumCol), typedLit(probs), lit(1000))
        .as("__bnds"))
    val bucketed = df.join(broadcast(bounds), col(segCol) <=> col("__seg"))
      .withColumn("__bkt",
        coalesce(
          aggregate(col("__bnds"), lit(0),
            (acc, b) => acc + when(b < col(orderNumCol), 1).otherwise(0)),
          lit(0)))
      .drop("__bnds", "__seg")
    val wOff = Window.partitionBy(col("__oseg")).orderBy(col("__obkt"))
    val offsets = bucketed
      .groupBy(col(segCol).as("__oseg"), col("__bkt").as("__obkt"))
      .agg(sum(col(weightCol)).cast("long").as("__w"))
      .select(col("__oseg"), col("__obkt"),
        (sum(col("__w")).over(wOff) - col("__w")).as("__woff"))
    val wIn = Window.partitionBy(col(segCol), col("__bkt"))
      .orderBy(orderCols: _*)
    bucketed.join(broadcast(offsets),
        col(segCol) <=> col("__oseg") && col("__bkt") === col("__obkt"))
      .withColumn("__cum",
        col("__woff") + sum(col(weightCol)).over(wIn).cast("long"))
      .drop("__bkt", "__woff", "__oseg", "__obkt")
  }

  /** Spark's ntile(t) from a known row number and partition size: the
    * first n%t tiles get ceil(n/t) rows, the rest floor(n/t). */
  private def ntileOf(t: Int, rn: Column, n: Column): Column = {
    val q = (n / t).cast("long") // floor
    val r = n % t
    val bigRows = (q + 1) * r // rows covered by the larger tiles
    when(r > 0 && rn <= bigRows, ((rn - 1) / (q + 1)).cast("int") + 1)
      .otherwise(((rn - 1 - bigRows) / q).cast("int") + lit(1) + r.cast("int"))
  }

  /** The scale-safe twin of q38's distribution windows: per-segment
    * ntile quartiles and percent_rank over a tie-free ordering,
    * bit-identical to the `Window.partitionBy(seg)` form (it carries
    * q38's own DuckDB oracle as q52) but with |segments|·nBuckets-way
    * parallel sorts instead of one reducer per segment. */
  def distribution(df: DataFrame, segCol: String, valCol: String,
                   tieCol: String, nTiles: Int = 4,
                   nBuckets: Int = 32): DataFrame = {
    val ranked = segmentedRowNumber(df, segCol, valCol,
      Seq(col(valCol).asc, col(tieCol).asc), nBuckets)
    ranked
      .withColumn("balance_quartile", ntileOf(nTiles, col("__rn"), col("__n")))
      .withColumn("balance_pct_rank",
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("__rn") - 1).cast("double") / (col("__n") - 1)))
      .drop("__rn", "__n")
  }

  /** EQUI-DEPTH histogram of one column — `nTiles` buckets holding
    * (as near as NTILE allows) the same row count, each reported with
    * its exact [lo, hi] value span and population. The profiler
    * complement of [[graft.ops.Profiler.profile]]'s scalar stats: an
    * equi-WIDTH histogram of a skewed column wastes every bucket on
    * the empty range, while equal-depth boundaries ARE the quantiles
    * an optimizer, a partitioner, or a drift monitor wants. Ranks are
    * exact order statistics from [[segmentedRowNumber]] over one
    * constant segment (the [[GlobalOrder]] trick — never one global
    * window task); the bucket assignment is the same integer NTILE
    * arithmetic q38/q52 pin; `lo`/`hi` are raw column values, no
    * arithmetic touches them. */
  /** WEIGHTED lower median per segment: the smallest `valCol` whose
    * cumulative `weightCol` (ordered by value, ties by `tieCol`)
    * reaches ⌈W/2⌉ — "the median TOKEN lives in a document of length
    * X", the mass-weighted statistic packing and curriculum decisions
    * read where the row median misleads (one 100k-token doc outweighs
    * a thousand stubs). All-integer: exact running weights from
    * [[segmentedPrefixSum]] (two-phase, no per-segment window), the
    * crossing row selected by `cum ≥ ⌈W/2⌉ ∧ cum − w < ⌈W/2⌉` —
    * exactly one row per segment with any positive weight
    * (zero-weight rows can never cross; an all-zero segment emits
    * nothing). Output: (segCol, w_median, total_weight). */
  def weightedLowerMedian(df: DataFrame, segCol: String, valCol: String,
                          weightCol: String, tieCol: String,
                          nBuckets: Int = 32): DataFrame = {
    val cum = segmentedPrefixSum(df, segCol, weightCol, valCol,
      Seq(col(valCol).asc, col(tieCol).asc), nBuckets)
    val tot = df.groupBy(col(segCol).as("__tseg"))
      .agg(sum(col(weightCol)).cast("long").as("total_weight"))
    val half = floor((col("total_weight") + 1) / lit(2.0)).cast("long")
    cum.join(tot, col(segCol) <=> col("__tseg")).drop("__tseg")
      .filter(col("__cum") >= half
        && col("__cum") - col(weightCol) < half)
      .select(col(segCol), col(valCol).as("w_median"),
        col("total_weight"))
  }

  def equiDepthHistogram(df: DataFrame, valCol: String, tieCol: String,
                         nTiles: Int, nBuckets: Int = 32): DataFrame = {
    require(nTiles >= 1, s"histogram needs >= 1 tiles: $nTiles")
    val tagged = df.filter(col(valCol).isNotNull).withColumn("__g", lit(0))
    segmentedRowNumber(tagged, "__g", valCol,
        Seq(col(valCol).asc, col(tieCol).asc), nBuckets)
      .withColumn("bucket", ntileOf(nTiles, col("__rn"), col("__n")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }

  /** Quantile normalization: replace each row's value with the POOLED
    * distribution's value at the row's within-segment relative rank —
    * the distribution-alignment transform ("make every source's
    * length profile look like the corpus's") that curriculum and
    * mixture weighting want before comparing across sources. The
    * mapping is the exact integer position `pos = (r·N) div n_seg`
    * (r = within-segment rank, N = pooled size), so two engines — or
    * two partitionings — produce byte-identical output; ties break on
    * the id in both rankings.
    *
    * Scale: both rankings are [[segmentedRowNumber]] (boundary
    * sketch + parallel per-bucket windows — the pooled ranking's
    * "one segment" still fans out across buckets), and the value
    * lookup is an equi-join on the rank. One bounded driver action
    * fetches N (a scalar, the watermark discipline). */
  def quantileNormalize(df: DataFrame, segCol: String, valCol: String,
                        idCol: String, nBuckets: Int = 64): DataFrame = {
    val base = df.select(col(segCol), col(idCol), col(valCol))
    val nTotal = base.count()
    val within = segmentedRowNumber(base, segCol, valCol,
        Seq(col(valCol), col(idCol)), nBuckets)
      .select(col(segCol), col(idCol), col(valCol),
        col("__rn").as("r"), col("__n").as("n_seg"))
      // r·N through DECIMAL(38,0): long·long wraps silently past 2^63
      // (reachable at ~3e9 pooled rows with a dominant segment); the
      // decimal product is exact to 10^38 and `div` stays integral
      .withColumn("pos",
        expr(s"(CAST(r AS DECIMAL(38,0)) * ${nTotal}) div n_seg"))
    val pooled = segmentedRowNumber(
        base.select(col(idCol).as("__pid"), col(valCol),
          lit(0).as("__pool")),
        "__pool", valCol, Seq(col(valCol), col("__pid")), nBuckets)
      .select(col("__rn").as("pos"), col(valCol).as("norm_value"))
    within.join(pooled, Seq("pos"))
      .select(col(segCol), col(idCol), col(valCol), col("pos"),
        col("norm_value"))
  }
}
