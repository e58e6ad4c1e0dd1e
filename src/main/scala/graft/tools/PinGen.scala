package graft.tools

import org.apache.spark.sql.SparkSession

import graft.PinnedOracles

/** Capture tool for pinned-literal oracles (see [[graft.PinnedOracles]]).
  *
  * Runs each pin-candidate query at every SF tier and emits the
  * generated `PinnedOracleData.scala` to the path in arg 0 (or a
  * plain per-query dump to stdout with `--dump`, for stability
  * diffing). Capture procedure: run twice — once with
  * SPARK_GRAFT_CPUS=4 and once with 32 — and diff the outputs; a
  * query whose rendering differs across parallelism is NOT pinnable
  * (fold-order-sensitive beyond its rounding) and must stay spec-only.
  */
object PinGen {

  /** tier → SF dir (must match PinnedOracles.tierSql's thresholds). */
  val tiers: Seq[(Int, String)] = Seq(
    1 -> "/root/testdata/sf0.001",
    2 -> "/root/testdata/sf0.01",
    3 -> "/root/testdata/sf0.1")

  /** Queries whose outputs are deterministic by construction.
    * knn_ivf's pin captures the DEFAULT index knobs — running the
    * driver with SPARK_GRAFT_IVF_CLUSTERS/_NPROBE set changes the
    * query output and would (correctly) fail its pinned oracle. */
  val targets: Seq[String] = Seq(
    "bpe_train", "hmm_random_model", "hmm_model_from_distributions",
    "hmm_stationary", "approx_stats",
    "knn_ivf", "knn_pq", "knn_ivf_pq", "pq_quantize", "kmeans_clusters",
    // round-10 second wave: per-sequence DP dumps from the supervised
    // (integer-count ⇒ deterministic) model, exact-integer BPE encode,
    // and the cell-bounded semantic dedup
    "hmm_forward", "hmm_backward", "hmm_likelihood",
    "hmm_predict", "hmm_decode_events", "bpe_apply", "semantic_dedup",
    // round-11: digest companions — the full viterbi/posterior/nbest/
    // session-window row sets stay unpinnable by artifact size
    // (10k-30k rows per tier), but their 1-row RelationDigest
    // companions pin at ~zero cost and carry the same exact-content
    // signal (order-independent combiners, see RelationDigest docs)
    "hmm_viterbi_digest", "hmm_posterior_digest", "hmm_nbest_digest",
    "stream_session_window_digest",
    // round-11 second wave: the soft-EM/IRLS trainers accumulate in
    // 2^-36 fixed point (HmmSuffStats/NewtonAcc) — exact associative
    // sums make the training trajectory bitwise partitioning-
    // independent, retiring the old "treeAggregate fold order" pin
    // exclusion. Determinism is spec-proved (DeterministicTrainingSpec)
    // AND empirically re-verified by the local[4]/local[32] dump diff.
    "hmm_baumwelch", "hmm_viterbi_train", "hmm_train_cli",
    "hmm_checkpoint_resume", "quality_lr")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val captured: Seq[(String, Seq[(String, String)], Map[Int, Seq[String]])] =
      targets.map { name =>
        val fn = graft.SparkEntry.queries(name)
        var cols: Seq[(String, String)] = Nil
        val byTier = tiers.map { case (tier, dir) =>
          val df = fn(spark, dir)
          cols = df.schema.fields.toSeq.map(f => f.name -> PinnedOracles.duckType(f.dataType))
          val rows = df.collect().map(r => PinnedOracles.renderRow(r, df.schema)).toSeq
          System.err.println(s"[pingen] $name tier $tier: ${rows.size} rows")
          tier -> rows
        }.toMap
        // corpus-independent results (seeded models) collapse to one tier
        val collapsed =
          if (byTier.values.toSet.size == 1) Map(1 -> byTier(1)) else byTier
        (name, cols, collapsed)
      }.filter { case (name, _, rows) =>
        // size guard: a pinned VALUES relation beyond ~8000 rows / 400 KB
        // per tier stops being a reasonable oracle artifact
        val maxRows = rows.values.map(_.size).max
        val maxChars = rows.values.map(_.map(_.length + 8).sum).max
        val tooBig = maxRows > 8000 || maxChars > 400000
        System.err.println(f"[pingen] $name%-30s maxRows=$maxRows%5d maxKB=${maxChars / 1024}%4d${if (tooBig) "  SKIP (too big to pin)" else ""}")
        !tooBig
      }

    args.headOption match {
      case Some("--dump") | None =>
        // data rows use the same Sep character as the resource format so
        // the stability-diff filter (^(###|\d+\x1f)) matches them — a tab
        // here made the local[4]-vs-local[32] diff compare headers only
        captured.foreach { case (name, cols, rows) =>
          println(s"### $name ${cols.map { case (n, t) => s"$n:$t" }.mkString(",")}")
          rows.toSeq.sortBy(_._1).foreach { case (tier, rs) =>
            rs.foreach(r => println(s"$tier${PinnedOracles.Sep}$r"))
          }
        }
      case Some(out) =>
        // resource format parsed by PinnedOracleData (see its docs)
        val sb = new StringBuilder
        captured.foreach { case (name, cols, rows) =>
          sb ++= s"#Q $name ${cols.map { case (n, t) => s"$n:$t" }.mkString(",")}\n"
          rows.toSeq.sortBy(_._1).foreach { case (tier, rs) =>
            rs.foreach(r => sb ++= s"$tier${graft.PinnedOracles.Sep}$r\n")
          }
        }
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
        println(s"[pingen] wrote $out (${sb.length / 1024} KB)")
    }
    spark.stop()
  }
}
