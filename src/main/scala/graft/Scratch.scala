package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Throwaway measurement harness for the optimization round — times
  * experimental variants of hot query bodies against the current ones
  * (noop sink, min of N) without touching SparkEntry. Deleted or inert
  * by round close; never part of the driver contract. */
object Scratch {
  def time(df: => DataFrame, reps: Int = 3): Double = {
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = args.headOption.getOrElse("pagerank")
    which match {
      case "pagerank" => pagerank(spark, sfDir)
      case "prof" => prof(spark, sfDir, args(1))
      case "aqeoffcache" =>
        // capture the cached edges plan with AQE off so InMemoryRelation
        // exposes hashpartitioning(src, 32) to consumers
        def variantAqeOff(): DataFrame = {
          val Iters = operators.Graph.Iters
          val Base = operators.Graph.Base
          val TopK = operators.Graph.TopK
          val li = t(spark, sfDir, "lineitem")
            .select((col("l_partkey") * 2).as("a"),
              (col("l_suppkey") * 2 + 1).as("b"))
            .distinct()
          val key = "spark.sql.adaptive.enabled"
          val prev = spark.conf.get(key)
          spark.conf.set(key, "false")
          val edges = graft.CacheRegistry.cached(
            li.select(col("a").as("src"), col("b").as("dst"))
              .union(li.select(col("b").as("src"), col("a").as("dst")))
              .repartition(col("src")))
          val deg = graft.CacheRegistry.cached(
            edges.groupBy(col("src").as("node"))
              .agg(count(lit(1)).as("deg")))
          spark.conf.set(key, prev)
          val n1 = deg.agg(count(lit(1)).as("n"))
          var ranks = deg.crossJoin(n1)
            .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
          for (_ <- 1 to Iters) {
            val sums = ranks.hint("shuffle_hash")
              .join(edges, col("node") === col("src"))
              .select(col("dst"), expr("r div deg").as("c"))
              .groupBy("dst").agg(sum(col("c")).as("sc"))
            ranks = deg.join(sums, col("node") === col("dst"), "left")
              .crossJoin(n1)
              .select(col("node"), col("deg"),
                (expr(s"(15 * $Base) div (100 * n)") +
                  expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
          }
          ranks
            .select(col("node"),
              when(pmod(col("node"), lit(2)) === 0, lit("part"))
                .otherwise(lit("supplier")).as("kind"),
              col("deg"), col("r").as("rank_mass"))
            .orderBy(col("rank_mass").desc, col("node"))
            .limit(TopK)
        }
        val df = variantAqeOff()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        val exch = "\\bExchange hashpartitioning".r.findAllIn(txt).size
        val w = time(variantAqeOff())
        println(f"[aqeoffcache] plan-exchanges=$exch warm=$w%.3f s")
        val curRows = operators.Graph.queries("q128_pagerank")(spark, sfDir)
          .collect().map(_.toString).toSeq
        val newRows = variantAqeOff().collect().map(_.toString).toSeq
        println(s"[aqeoffcache] rows equal: ${curRows == newRows}")
      case "cacheconf" =>
        Seq("true", "false").foreach { v =>
          spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v)
          graft.CacheRegistry.release(spark)
          spark.sharedState.cacheManager.clearCache()
          val df = pagerankVariant(spark, sfDir, Some("shuffle_hash"))
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
          val exch = "\\bExchange hashpartitioning".r
            .findAllIn(txt).size
          val w = time(pagerankVariant(spark, sfDir, Some("shuffle_hash")))
          println(f"[cacheconf] canChange=$v plan-exchanges=$exch warm=$w%.3f s")
        }
      case "plan" =>
        val df =
          if (args(1) == "q128hint") pagerankVariant(spark, sfDir, Some("shuffle_hash"))
          else SparkEntry.queries(args(1))(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case other => sys.error(s"unknown experiment $other")
    }
    spark.stop()
  }

  /** Stage-level profile of one warm run of a SparkEntry query: per-stage
    * wall (submission→completion), task time sum, shuffle bytes. */
  def prof(s: SparkSession, d: String, name: String): Unit = {
    import scala.collection.mutable
    case class St(name: String, submitted: Long, completed: Long,
        taskMs: Long, shufRead: Long, shufWrite: Long, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[St]
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages += St(i.name.takeWhile(_ != '\n').take(60),
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead,
          i.taskMetrics.shuffleWriteMetrics.bytesWritten, i.numTasks)
      }
    })
    if (sys.env.contains("SCRATCH_STORAGE")) {
      SparkEntry.queries(name)(s, d).write.format("noop").mode("overwrite").save()
      s.sparkContext.getRDDStorageInfo.foreach { i =>
        println(f"[storage] id=${i.id} mem=${i.memSize/1e6}%.1f MB disk=${i.diskSize/1e6}%.1f MB parts=${i.numCachedPartitions}/${i.numPartitions} ${i.name.take(120)}")
      }
      return
    }
    val fn: (SparkSession, String) => DataFrame =
      if (name == "q128hint") ((ss, dd) => pagerankVariant(ss, dd, Some("shuffle_hash")))
      else if (name == "q128aqeoff") ((ss, dd) => pagerankAqeOff(ss, dd))
      else SparkEntry.queries(name)
    fn(s, d).write.format("noop").mode("overwrite").save() // warm
    stages.clear()
    val t0 = System.nanoTime()
    fn(s, d).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[prof] $name warm wall: $wall%.3f s, ${stages.size} stages, " +
      f"${stages.map(_.tasks).sum} tasks, taskCpu ${stages.map(_.taskMs).sum / 1e3}%.1f s, " +
      f"shufWrite ${stages.map(_.shufWrite).sum / 1e6}%.1f MB, " +
      f"shufRead ${stages.map(_.shufRead).sum / 1e6}%.1f MB")
    val total = stages.map(st => st.completed - st.submitted).sum
    println(f"[prof] sum of stage walls: ${total / 1e3}%.3f s")
    stages.sortBy(st => -(st.completed - st.submitted)).take(25).foreach { st =>
      println(f"[prof]  ${(st.completed - st.submitted) / 1e3}%7.3f s wall ${st.taskMs / 1e3}%8.3f s task ${st.tasks}%4d tasks ${st.shufRead / 1e6}%7.1f MB in ${st.shufWrite / 1e6}%7.1f MB out  ${st.name}")
    }
  }

  /** q128 with AQE-off cache capture + shuffle_hash hint. */
  def pagerankAqeOff(s: SparkSession, d: String): DataFrame = {
    val Iters = operators.Graph.Iters
    val Base = operators.Graph.Base
    val TopK = operators.Graph.TopK
    val li = t(s, d, "lineitem")
      .select((col("l_partkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    val edges = graft.CacheRegistry.cached(
      li.select(col("a").as("src"), col("b").as("dst"))
        .union(li.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src")))
    val deg = graft.CacheRegistry.cached(
      edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")))
    s.conf.set(key, prev)
    val n1 = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(n1)
      .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
    for (_ <- 1 to Iters) {
      val sums = ranks.hint("shuffle_hash")
        .join(edges, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      ranks = deg.join(sums, col("node") === col("dst"), "left")
        .crossJoin(n1)
        .select(col("node"), col("deg"),
          (expr(s"(15 * $Base) div (100 * n)") +
            expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
    }
    ranks
      .select(col("node"),
        when(pmod(col("node"), lit(2)) === 0, lit("part"))
          .otherwise(lit("supplier")).as("kind"),
        col("deg"), col("r").as("rank_mass"))
      .orderBy(col("rank_mass").desc, col("node"))
      .limit(TopK)
  }

  /** q128 body with an optional join hint on the ranks side. */
  def pagerankVariant(s: SparkSession, d: String,
      hint: Option[String]): DataFrame = {
    val Iters = operators.Graph.Iters
    val Base = operators.Graph.Base
    val TopK = operators.Graph.TopK
    val li = t(s, d, "lineitem")
      .select((col("l_partkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = graft.CacheRegistry.cached(
      li.select(col("a").as("src"), col("b").as("dst"))
        .union(li.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src")))
    val deg = graft.CacheRegistry.cached(
      edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")))
    val n1 = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(n1)
      .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
    for (_ <- 1 to Iters) {
      val rr = hint.map(ranks.hint(_)).getOrElse(ranks)
      val sums = rr
        .join(edges, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
      ranks = deg.join(sums, col("node") === col("dst"), "left")
        .crossJoin(n1)
        .select(col("node"), col("deg"),
          (expr(s"(15 * $Base) div (100 * n)") +
            expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
    }
    ranks
      .select(col("node"),
        when(pmod(col("node"), lit(2)) === 0, lit("part"))
          .otherwise(lit("supplier")).as("kind"),
        col("deg"), col("r").as("rank_mass"))
      .orderBy(col("rank_mass").desc, col("node"))
      .limit(TopK)
  }

  /** Variant A: current q128 body (via SparkEntry). Variant B: ranks
    * localCheckpoint per iteration. Variant C: B + shuffle_hash hint. */
  def pagerank(s: SparkSession, d: String): Unit = {
    val cur = time(operators.Graph.queries("q128_pagerank")(s, d))
    println(f"[scratch] q128 current: $cur%.3f s")
    graft.CacheRegistry.release(s)

    def variant(hint: Option[String], ckpt: Boolean): DataFrame = {
      val Iters = operators.Graph.Iters
      val Base = operators.Graph.Base
      val TopK = operators.Graph.TopK
      val li = t(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = graft.CacheRegistry.cached(
        li.select(col("a").as("src"), col("b").as("dst"))
          .union(li.select(col("b").as("src"), col("a").as("dst")))
          .repartition(col("src")))
      val deg = graft.CacheRegistry.cached(
        edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")))
      val n1 = deg.agg(count(lit(1)).as("n"))
      var ranks = deg.crossJoin(n1)
        .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
      if (ckpt) ranks = ranks.localCheckpoint()
      for (_ <- 1 to Iters) {
        val rr = hint.map(ranks.hint(_)).getOrElse(ranks)
        val sums = rr
          .join(edges, col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        ranks = deg.join(sums, col("node") === col("dst"), "left")
          .crossJoin(n1)
          .select(col("node"), col("deg"),
            (expr(s"(15 * $Base) div (100 * n)") +
              expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
        if (ckpt) ranks = ranks.localCheckpoint()
      }
      ranks
        .select(col("node"),
          when(pmod(col("node"), lit(2)) === 0, lit("part"))
            .otherwise(lit("supplier")).as("kind"),
          col("deg"), col("r").as("rank_mass"))
        .orderBy(col("rank_mass").desc, col("node"))
        .limit(TopK)
    }

    // Variant D: broadcast the O(V) rank vector into the edge join each
    // iteration (edges never move), broadcast sums into the deg join.
    def variantD(): DataFrame = {
      val Iters = operators.Graph.Iters
      val Base = operators.Graph.Base
      val TopK = operators.Graph.TopK
      val li = t(s, d, "lineitem")
        .select((col("l_partkey") * 2).as("a"),
          (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
      val edges = graft.CacheRegistry.cached(
        li.select(col("a").as("src"), col("b").as("dst"))
          .union(li.select(col("b").as("src"), col("a").as("dst"))))
      val deg = graft.CacheRegistry.cached(
        edges.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")))
      val n1 = deg.agg(count(lit(1)).as("n"))
      var ranks = deg.crossJoin(broadcast(n1))
        .select(col("node"), col("deg"), expr(s"$Base div n").as("r"))
      for (_ <- 1 to Iters) {
        val sums = edges
          .join(broadcast(ranks), col("node") === col("src"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("sc"))
        ranks = deg.join(broadcast(sums), col("node") === col("dst"), "left")
          .crossJoin(broadcast(n1))
          .select(col("node"), col("deg"),
            (expr(s"(15 * $Base) div (100 * n)") +
              expr("(85 * coalesce(sc, 0)) div 100")).as("r"))
      }
      ranks
        .select(col("node"),
          when(pmod(col("node"), lit(2)) === 0, lit("part"))
            .otherwise(lit("supplier")).as("kind"),
          col("deg"), col("r").as("rank_mass"))
        .orderBy(col("rank_mass").desc, col("node"))
        .limit(TopK)
    }
    val dv = time(variantD())
    println(f"[scratch] q128 broadcast-ranks: $dv%.3f s")
    graft.CacheRegistry.release(s)
    // planning-only probe: how much of the warm rep is driver-side
    // plan construction + optimization (executedPlan forces planning)?
    locally {
      time(variant(Some("shuffle_hash"), ckpt = false)) // warm caches
      val t0 = System.nanoTime()
      variant(Some("shuffle_hash"), ckpt = false).queryExecution.executedPlan
      println(f"[scratch] q128 hint planning only: ${(System.nanoTime()-t0)/1e9}%.3f s")
      graft.CacheRegistry.release(s)
      time(variant(None, ckpt = false))
      val t1 = System.nanoTime()
      variant(None, ckpt = false).queryExecution.executedPlan
      println(f"[scratch] q128 current-shape planning only: ${(System.nanoTime()-t1)/1e9}%.3f s")
      graft.CacheRegistry.release(s)
    }
    val e = time(variant(Some("shuffle_hash"), ckpt = false))
    println(f"[scratch] q128 shuffle_hash only: $e%.3f s")
    graft.CacheRegistry.release(s)
    // cross-check identical results current vs variants
    val curRows = operators.Graph.queries("q128_pagerank")(s, d)
      .collect().map(_.toString).toSeq
    val newRows = variantD()
      .collect().map(_.toString).toSeq
    println(s"[scratch] rows equal: ${curRows == newRows} (${curRows.size})")
  }
}
