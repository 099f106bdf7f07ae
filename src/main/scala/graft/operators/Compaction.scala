package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance primitive every
  * 100 TB pipeline runs: streaming ingest and over-partitioned jobs
  * leave thousands of tiny parquet files, and scan throughput collapses
  * under per-file open costs and footer reads (a 128 MB-target file is
  * one task-sized split; a 100 KB file is the same scheduling overhead
  * for 0.1% of the work).
  *
  * The output file count is derived from the ACTUAL on-disk byte size
  * (not row count — row width varies wildly across tables), and the
  * rewrite uses `coalesce` (narrow, no exchange): compaction does not
  * need a particular row order, so paying a shuffle to get one would be
  * pure waste. Callers that also want co-location bucket the write
  * instead (see ScaleSpec's bucketed-join test).
  */
object Compaction {

  /** Rewrite `inDir`'s parquet into ~`targetBytes` files at `outDir`;
    * returns the output file count. */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(inDir)).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    n
  }
}
