package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev-only: an optional 3rd arg restricts to a comma-separated query
    // subset for fast single-query iteration (driver passes two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // size-aware wide initial — derivation and evidence in [[Tuning]]
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tuning.initialShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only, like BenchOne: SPARK_GRAFT_CONF=k=v,... runtime confs
    // (e.g. a non-default dedup tau for the 100x slice checks)
    Tuning.applyEnvConf(spark)
    new java.io.File(outDir).mkdirs()
    // the ann_ivf/bpe-family oracles embed fixture-keyed export paths;
    // pin every dump default to THIS run's fixture so a subset run that
    // skips those queries never dumps SQL naming another machine's path
    // (one pin point — new fixture-keyed families register there)
    graft.queries.OracleFixturePin.pin(sfDir)
    // Oracle-pinned knobs (round-9 advice): some operator knobs are
    // recomputed by their DuckDB oracle from the DATA (derived rules),
    // but an explicit runtime override changes the ENGINE result while
    // the oracle keeps checking the pinned/derived value — a spurious
    // hash mismatch that looks like a correctness bug. So when
    // SPARK_GRAFT_CONF overrides one of these knobs, the affected
    // queries' oracle SQL is withheld from the dump (the driver then
    // records the weaker rows-only check) and the downgrade is logged.
    // Knobs NOT listed here are either harness-level (stage.dir,
    // streaming.*) or oracle-transparent (ann.kmeansIters: the oracle
    // consumes the exported trained centroids, whatever the iteration
    // count was).
    val oraclePinnedKnobs: Map[String, Seq[String]] = Map(
      // dedup_semantic blocks on the same derived hyperplane buckets
      "spark.graft.ann.bitsPerBand" -> Seq("ann_lsh", "dedup_embedding", "dedup_semantic"),
      "spark.graft.ann.probeHamming" -> Seq("ann_lsh"),
      "spark.graft.ann.nprobe" -> Seq(
        "ann_ivf", "ann_filtered", "ann_ivfpq_residual", "ann_filtered_pq"),
      "spark.graft.dedup.embTau" -> Seq("dedup_embedding"),
      "spark.graft.dedup.semTau" -> Seq("dedup_semantic"),
      "spark.graft.dedup.levMaxLen" -> Seq("dedup_levenshtein", "dedup_lev_blocked"),
      "spark.graft.mm.nearTau" -> Seq("mm_dedup_near"),
      "spark.graft.mm.bitsPerBand" -> Seq("mm_dedup_near"),
      "spark.graft.serving.shards" -> Seq("pipeline_pack", "data_shuffle_global"),
      "spark.graft.chunk.width" -> Seq("pipeline_chunk"),
      "spark.graft.chunk.stride" -> Seq("pipeline_chunk"),
      "spark.graft.segment.budget" -> Seq("text_segment"),
      // pipeline_token_budget scores via the same unigramScores vocab
      // (its oracle hardcodes the derived cap), so it pins the knob too
      "spark.graft.vocab.topK" -> Seq(
        "text_unigram_logprob", "pipeline_ppl_sample", "pipeline_token_budget"),
      "spark.graft.streaming.statePartitions" -> Seq(), // parallelism only
      "spark.graft.streaming.stateStore" -> Seq(), // provider only
      "spark.graft.stage.dir" -> Seq(), // storage location only
      "spark.graft.ann.kmeansIters" -> Seq(), // oracle reads exported centroids
      // oracle-transparent like kmeansIters: the centroid export is
      // content-addressed by nlist and the recall grid is captured at
      // run time, so the dumped SQL always replays the built index
      "spark.graft.ann.nlist" -> Seq()
    )
    val overriddenKeys = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2)(0).trim).filter(_.startsWith("spark.graft."))
    // validated BEFORE the (multi-minute at big fixtures) query loop, so
    // an unknown knob fails in milliseconds instead of after the dump
    val downgraded: Set[String] = overriddenKeys.flatMap { k =>
      oraclePinnedKnobs.get(k) match {
        case Some(qs) =>
          if (qs.nonEmpty) System.err.println(
            s"[verify] $k overridden — downgrading ${qs.mkString(", ")} to rows-only")
          qs
        case None =>
          // an UNKNOWN graft knob may pin an oracle this table doesn't
          // know about — refuse to guess, fail loudly instead of
          // letting the driver record a mystery hash mismatch
          sys.error(s"[verify] unknown spark.graft knob '$k' in " +
            "SPARK_GRAFT_CONF — add it to oraclePinnedKnobs (with its " +
            "oracle-affected queries, or Seq() if oracle-transparent)")
      }
    }.toSet
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filterNot { case (k, _) => downgraded.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
