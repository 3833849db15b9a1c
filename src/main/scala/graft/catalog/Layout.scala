package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout control for write paths: cluster rows so the files a
  * table is made of carry narrow, (near-)disjoint min/max spans on
  * the columns queries filter by.
  *
  * At 100 TB the scan you avoid is the cheapest scan: parquet stores
  * per-row-group min/max statistics, and a pushed-down range or point
  * predicate skips every row group whose span excludes it — but only
  * if the writer CLUSTERED the data. A table written from an
  * arbitrary shuffle has every file spanning the whole key domain
  * (every row group overlaps every predicate, nothing skips); the
  * same rows range-partitioned and sorted on the filter column yield
  * spans that tile the domain, so a selective predicate reads a
  * handful of row groups no matter how large the table is. Pair with
  * `partitionBy` on a coarse column (e.g. month) for directory-level
  * partition pruning above the row-group skip, and with
  * [[TableCatalog.replacePartitions]]-style maintenance the layout
  * survives incremental rewrites.
  *
  * `repartitionByRange` samples the data to place balanced cut
  * points (handling skew that fixed-width ranges would not), and the
  * within-partition sort keeps every row group inside a file narrow
  * too — the sort is per-partition, never a global order-by. */
object Layout {
  /** Overwrite `table` with `df` laid out as `numFiles` range-disjoint,
    * internally-sorted files on `clusterCols`. */
  def overwriteClustered(catalog: TableCatalog, df: DataFrame,
                         table: String, numFiles: Int,
                         clusterCols: Seq[String],
                         partitionBy: Seq[String] = Nil): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    // partition directories first, cluster columns within them: rows
    // of one directory land together, range-split numFiles ways
    val keys = (partitionBy ++ clusterCols).map(col)
    val arranged = df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
    catalog.overwrite(arranged, table, partitionBy)
  }
}
