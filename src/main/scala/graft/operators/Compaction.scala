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
    * returns the file count actually written.
    *
    * `outDir` must differ from `inDir`: mode("overwrite") truncates the
    * target BEFORE the lazy scan of the same path executes, so an
    * in-place call would destroy its own input. Compact to a sibling dir
    * and swap atomically at the metastore/manifest layer.
    *
    * The returned count is measured from the output listing, not the
    * requested `n`: `coalesce` can only LOWER a partition count, so when
    * the scan bin-packs the small files into fewer splits than `n`
    * (maxPartitionBytes ≫ file size), fewer — larger — files come out,
    * which still satisfies the ≥`targetBytes` goal. */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val out = new Path(outDir)
    val fs = in.getFileSystem(hconf)
    val inQ = fs.makeQualified(in)
    val outQ = out.getFileSystem(hconf).makeQualified(out)
    require(inQ != outQ,
      s"compact() cannot run in place ($inQ): overwrite truncates the " +
        "target before the lazy scan reads it — write to a sibling dir and swap")
    val totalBytes = fs.getContentSummary(in).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n).write.mode("overwrite").parquet(outDir)
    outQ.getFileSystem(hconf).listStatus(outQ)
      .count(f => f.getPath.getName.startsWith("part-"))
  }
}
