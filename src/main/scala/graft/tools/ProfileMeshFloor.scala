package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes the q-family's per-query cost (the ~0.15-0.2 s "mesh floor")
  * into its driver phases, to size an analysis-plan cache before building
  * it (guide §1.1 first-principles + §1.2 measure first):
  *
  *   A  = fn(spark, dir) WITHOUT an action — view re-asserts +
  *        SqlValidator.preprocess (bridged forms) + parse + analysis;
  *   A' = same, after a ViewEpoch shadow bump (the bench's real
  *        interleaving: every mesh query bumps, so SqlSurface queries
  *        re-assert the raw + entity views);
  *   B  = df.count() on a PRE-BUILT DataFrame — optimize + physical plan
  *        + AQE scheduling + execution (what a plan cache cannot remove);
  *   C  = the full fn().count() as the bench times it (sanity: ≈ A' + B).
  *
  * A/A' is the slice an analyzed-plan cache removes. Run single-purpose,
  * same session conf as Bench. */
object ProfileMeshFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.wire.quiet") = "1"

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q3_tpch_q1_mesh", "q11_window_funcs", "q16_scalar_funcs",
      "q25_grouping_sets_cube", "q33_tpch_q18_join", "q39_quantified_anyall",
      "q42_eq_quantifiers", "q43_compound_quantifiers", "q9_wire_federation")
    val reps = 8

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm everything (JIT, codegen cache, parquet footers)
      fn(spark, sfDir).count(): Unit
      val a = med((1 to reps).map(_ => time(fn(spark, sfDir))))
      val aPrime = med((1 to reps).map { _ =>
        graft.mesh.ViewEpoch.noteShadow()
        time(fn(spark, sfDir))
      })
      val df = fn(spark, sfDir)
      val b = med((1 to reps).map(_ => time(df.count())))
      // D: count over a frame wrapping the PRE-OPTIMIZED plan — what an
      // optimized-plan-level cache would make every later action pay
      // (re-optimizing an already-collapsed tree + physical plan + exec)
      val dfOpt = org.apache.spark.sql.graft.ColumnBridge
        .ofRows(spark, df.queryExecution.optimizedPlan)
      val dEq = dfOpt.count() == df.count()
      val d = med((1 to reps).map(_ => time(dfOpt.count())))
      val c = med((1 to reps).map(_ => time(fn(spark, sfDir).count())))
      println(f"PROF $name%-28s A=$a%.4f A'=$aPrime%.4f B=$b%.4f D=$d%.4f C=$c%.4f rowsEq=$dEq (s)")
    }
    spark.stop()
  }
}
