package graft

import org.apache.spark.sql.functions._

/** The storage-layout techniques that matter at 100 TB, proven on the plan:
  * bucketing removes the shuffle from a fact-fact join entirely, and
  * partitioned layout + partition pruning turns a full scan into a
  * directory-subset scan. These are layout decisions, not query decisions —
  * exactly the knobs a 1000-executor deployment turns first.
  */
class ScaleTechniquesSpec extends SparkSpec {

  private lazy val wh = tempDir("graft_wh").toString

  test("bucketed tables join with zero Exchange in the plan") {
    val s = spark // warehouse dir set to a temp dir in SparkSpec (static conf)
    val li = s.read.parquet(s"$sf0001/lineitem.parquet")
    val o = s.read.parquet(s"$sf0001/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    // disable broadcast so the join would otherwise need a shuffle
    val prior = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_bucketed")
        .join(s.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        "bucketed-by-join-key tables must co-locate: no shuffle allowed")
      // and the answer is still right
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == direct)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("partitioned parquet layout prunes partitions under a filter") {
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$wh/events_parted")
    val scan = spark.read.parquet(s"$wh/events_parted")
      .filter(col("event_type") === "purchase")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "event_type filter must prune at the directory level, not post-scan")
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(scan.count() == expected)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // static pruning (above) handles literal predicates; DPP handles the
    // 100 TB star-join shape where the partition keys to keep are only
    // known after filtering the DIMENSION — Spark plans a subquery over
    // the broadcast dim and injects its result as a partition filter on
    // the fact scan, so the fact side reads only the matching directories
    // instead of all of them.
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$wh/events_dpp")
    // the dim must be file-backed with the selective predicate on a
    // NON-join column — a literal/in-memory dim constant-folds into a
    // static partition filter, which is the previous test, not DPP
    import spark.implicits._
    Seq(("purchase", 1L), ("click", 0L), ("view", 0L)).toDF("t", "flag")
      .write.mode("overwrite").parquet(s"$wh/dim_dpp")
    val dim = spark.read.parquet(s"$wh/dim_dpp").filter(col("flag") === 1L)
    val fact = spark.read.parquet(s"$wh/events_dpp")
    val joined = fact.join(dim, col("event_type") === col("t"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      "the fact scan must carry a runtime partition filter fed by the dim")
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(joined.collect().map(r => r.getLong(1)).sum == expected)
  }

  test("range-partitioned sorted parquet skips row groups under a ts filter") {
    // the third layout lever after bucketing and directory partitioning:
    // repartitionByRange + sortWithinPartitions gives each output file a
    // tight [min, max] on the sort key, so parquet row-group statistics let
    // a pushed time predicate skip most of the data without reading it —
    // at 100 TB this is the difference between scanning a day and a year.
    val dir = s"$wh/events_sorted"
    val src = Tables.events(spark, sf0001)
    // Spark's default parquet timestamp encoding is INT96, which carries NO
    // min/max statistics — with it, NOTHING can skip, no matter how well
    // sorted the layout is. INT64 micros is the layout a deployment must
    // write for time-pruned scans.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val priorTs = spark.conf.get(tsKey)
    try {
      spark.conf.set(tsKey, "TIMESTAMP_MICROS")
      src.repartitionByRange(4, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(dir)
    } finally spark.conf.set(tsKey, priorTs)
    val all = spark.read.parquet(dir)
    val total = all.count()
    // cutoff at the ~25th percentile of ts: the filter lands in 1 of the 4
    // range files, so row-group stats must prune the other 3
    val cut = all.select(col("ts")).orderBy("ts")
      .limit((total / 4).toInt).agg(max("ts")).head.getTimestamp(0)
    val q = spark.read.parquet(dir).filter(col("ts") <= lit(cut))
    val matched = q.count()
    assert(matched == src.filter(col("ts") <= lit(cut)).count())
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    assert(q.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(ts), LessThanOrEqual(ts"),
      "ts predicate must reach the parquet scan")
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned <= total / 2,
      s"sorted layout must row-group-skip: scanned $scanned of $total rows")
  }

  test("z-order layout prunes row groups on EITHER filter dimension") {
    // the fourth layout lever: range-partition + sort clusters ONE
    // column (the previous test) — a filter on any other column still
    // scans everything. Interleaving the bits of two columns into a
    // z-value and sorting by THAT gives every file a bounded range in
    // BOTH dimensions, so row-group statistics prune either predicate —
    // at 100 TB this is how a (user, time) log store serves both
    // per-user and per-window queries without duplicate layouts.
    import org.apache.spark.sql.Column
    val src = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val mm = src.agg(min("user_id"), max("user_id"), min("us"), max("us")).head
    val (uMin, uMax, tMin, tMax) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    def scale8(c: Column, lo: Long, hi: Long): Column =
      ((c - lit(lo)) * 255 / lit(hi - lo)).cast("long")
    def bit(c: Column, i: Int): Column = shiftright(c, i).bitwiseAND(lit(1L))
    val z = (0 until 8).map(i =>
      shiftleft(bit(col("u8"), i), 2 * i + 1) +
        shiftleft(bit(col("t8"), i), 2 * i)).reduce(_ + _)
    val keyed = src
      .withColumn("u8", scale8(col("user_id"), uMin, uMax))
      .withColumn("t8", scale8(col("us"), tMin, tMax))
      .withColumn("z", z)
    val zDir = s"$wh/events_zorder"
    val linDir = s"$wh/events_linear"
    keyed.repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .select("event_id", "user_id", "us")
      .write.mode("overwrite").parquet(zDir)
    keyed.repartitionByRange(8, col("user_id")).sortWithinPartitions("user_id")
      .select("event_id", "user_id", "us")
      .write.mode("overwrite").parquet(linDir)
    val total = src.count()
    // 1/8-of-domain slices in each dimension, away from the edges
    val uPred = col("user_id").between(
      uMin + 3 * (uMax - uMin) / 8, uMin + 4 * (uMax - uMin) / 8)
    val tPred = col("us").between(
      tMin + 3 * (tMax - tMin) / 8, tMin + 4 * (tMax - tMin) / 8)
    def scanned(dir: String, pred: Column): Long = {
      val q = spark.read.parquet(dir).filter(pred)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    // z-order: BOTH dimensions prune
    assert(scanned(zDir, uPred) <= 3 * total / 4,
      "z-order must row-group-skip on the user dimension")
    assert(scanned(zDir, tPred) <= 3 * total / 4,
      "z-order must row-group-skip on the time dimension")
    // linear user-sort: user prunes hard, time cannot prune at all —
    // the asymmetry z-ordering exists to remove
    assert(scanned(linDir, uPred) <= total / 4)
    assert(scanned(linDir, tPred) >= 9 * total / 10,
      "a user-sorted layout has no time locality; if this starts " +
        "pruning, the generator changed and the contrast claim must move")
  }

  test("q141: every z-bucket's box is bounded in BOTH dimensions") {
    // top-5-bit buckets fix sk's top 3 scaled bits and pk's top 2
    // (z interleaves sk into odd bits, pk into even), so each bucket's
    // value box spans at most 1/4 of the pk domain and 1/8 of the sk
    // domain — the property that lets row-group stats prune either
    // predicate. +2 slack absorbs the integer-rescale rounding.
    val li = graft.Tables.t(spark, sf0001, "lineitem")
    val mm = li.agg(max("l_partkey"), max("l_suppkey")).head
    val (pmax, smax) = (mm.getLong(0), mm.getLong(1))
    val rows = graft.operators.Layout
      .queries("q141_zorder_key")(spark, sf0001).collect()
    assert(rows.length > 1, "rescaled z-key must spread across buckets")
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= pmax / 4 + 2,
        s"bucket ${r.getLong(0)} pk box too wide")
      assert(r.getLong(5) - r.getLong(4) <= smax / 8 + 2,
        s"bucket ${r.getLong(0)} sk box too wide")
    }
  }

  test("ORC and JSON sources agree with parquet (cross-format parity)") {
    val gen = graft.onebrc.OneBrc.generate(spark, 20000L)
    gen.write.mode("overwrite").orc(s"$wh/m_orc")
    gen.write.mode("overwrite").json(s"$wh/m_json")
    val fromOrc = graft.onebrc.OneBrc.brcAgg(
      spark.read.orc(s"$wh/m_orc")).collect().toSeq
    val fromJson = graft.onebrc.OneBrc.brcAgg(
      spark.read.schema(graft.onebrc.OneBrc.schema).json(s"$wh/m_json"))
      .collect().toSeq
    assert(fromOrc == fromJson)
    assert(fromOrc == graft.onebrc.OneBrc.brcAgg(gen).collect().toSeq)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    import spark.implicits._
    val s = spark
    // a fact-fact join where 90% of the left rows share one hot key — the
    // shape that strands a single reducer at 100 TB. AQE's skew-join must
    // split the oversized partition at runtime. Thresholds are lowered so
    // the local[4] replica trips the same code path a cluster would.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> s.conf.get(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // payload must be high-entropy and row-dependent: a literal pad
      // constant-folds out of the shuffle, and repetitive bytes compress
      // under the skew-detection threshold in the shuffle writer
      val pad = repeat(md5(col("id").cast("string")), 4)
      val left = s.range(0, 300000)
        .select(when(col("id") < 270000, 0L).otherwise(col("id") % 997 + 1)
          .as("k"), pad.as("payload"))
      val right = s.range(0, 1001).select(col("id").as("k"), pad.as("rpad"))
      // global agg downstream (not grouped on k): a groupBy(k) above the
      // join would REQUIRE the join's hash distribution and legitimately
      // veto the split — splitting there would re-introduce a shuffle.
      // length(payload) keeps the fat column flowing through the shuffle.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect()
      assert(rows.head.getLong(0) == 300000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition for skew split, plan:\n$plan")
    } finally prior.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("shingle df-cap bounds the dedup pair space under adversarial skew") {
    import spark.implicits._
    val op = operators.Dedup
    // 200 documents that all open with the same boilerplate 5-gram (the
    // hot-shingle worst case: one stopword shingle shared corpus-wide)
    // followed by a unique tail — uncapped, the shingle equi-join would
    // emit 200*199/2 = 19900 pairs through that single hot key.
    val hotDocs = (0 until 200).map(i =>
      (i.toLong, s"terms of service apply here unique$i tail$i body$i end$i"))
    val dir = tempDir("graft_skew").toString
    hotDocs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sh = op.shingles(spark, dir)
    // the boilerplate shingle (df=200 > cap=64) must be gone (shingles are
    // carried as 64-bit md5-prefix keys, so check for its hash)...
    val hotKey = spark.sql(
      "SELECT substring(md5('terms of service apply here'), 1, 16)")
      .head.getString(0)
    assert(sh.filter(col("s") === hotKey).count() == 0)
    // ...while per-document shingles containing a unique token survive
    assert(sh.count() == 200L * 4, "4 unique-tail shingles per doc remain")
    val a = sh.select(col("doc_id").as("i"), col("s"))
    val b = sh.select(col("doc_id").as("j"), col("s"))
    val pairs = a.join(b, "s").where(col("i") < col("j")).count()
    assert(pairs == 0,
      s"df-capped shingle join must not explode through hot keys, got $pairs")
    // and any surviving shingle can contribute at most cap^2/2 pairs by
    // construction: df <= ShingleDfCap after the anti-join
    val maxDf = sh.groupBy("s").count().agg(max("count")).head.getLong(0)
    assert(maxDf <= op.ShingleDfCap)
  }

  test("runtime bloom filter from a filtered dim prunes fact rows pre-shuffle") {
    // the row-level sibling of dynamic partition pruning: when the fact
    // side is NOT partitioned on the join key, Spark can still build a
    // bloom filter from the filtered dim at runtime and apply it to the
    // fact scan BEFORE the shuffle — at 100 TB that turns a full-fact
    // shuffle into a shuffle of only might-match rows. Thresholds are
    // lowered so the local replica takes the same path a cluster would.
    val s = spark
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val fact = s.read.parquet(s"$sf0001/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = s.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_totalprice") > 500000.0) // selective: builds the filter
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter must be injected on the fact side, plan:\n$optimized")
      // and the result is unaffected by the filter (it only skips non-matches)
      val n = joined.head.getLong(0)
      val expected = fact.join(
        s.read.parquet(s"$sf0001/orders.parquet")
          .filter(col("o_totalprice") > 500000.0).select(col("o_orderkey")).hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("schema evolution: mergeSchema unifies old and new parquet layouts") {
    // 100 TB corpora are written over months — columns get added. A reader
    // must unify an old layout (no `quality` column) with a new one
    // without rewriting history: mergeSchema=true unions the schemas and
    // null-fills the missing column for old files, and predicates on the
    // NEW column still push down to the scan (old files prune entirely on
    // row-group stats since a missing column is all-null).
    import spark.implicits._
    val dir = s"$wh/evolving"
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2))
      .toDF("doc_id", "text", "quality")
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val all = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(all.schema.fieldNames.toSet == Set("doc_id", "text", "quality", "batch"))
    assert(all.count() == 4)
    assert(all.filter(col("quality").isNull).count() == 2, "old files null-fill")
    val q = all.filter(col("quality") > 0.5)
    assert(q.count() == 1)
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(quality), GreaterThan(quality"),
      "predicate on the evolved column must still reach the scan")
  }

  test("window operator spills to disk under memory pressure, result unchanged") {
    // the spill-awareness property 100 TB operation depends on: when an
    // operator's buffer exceeds its memory budget it must DEGRADE (spill
    // to disk), not fail or corrupt — and the spilled run must produce
    // the bit-identical result. The window buffer's row spill thresholds
    // make this deterministic locally: buffers go external past 16 rows,
    // spill to disk past 32, and must match the in-memory run bit for bit.
    val s = spark
    // BOTH knobs: the window buffer only goes external past the in-memory
    // row threshold (default 4096 — more rows than any per-supplier
    // partition here), and only spills past the spill threshold
    val keys = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "32")
    val q31 = () => operators.Relational.queries("q31_window_running")(s, sf0001)
    val inMem = q31().collect()
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          spilled.addAndGet(e.taskMetrics.diskBytesSpilled)
    }
    val prior = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    s.sparkContext.addSparkListener(listener)
    try {
      keys.foreach { case (k, v) => s.conf.set(k, v) }
      val underPressure = q31().collect()
      // listener delivery is async; poll briefly instead of touching the
      // private listenerBus
      val deadline = System.nanoTime() + 10e9.toLong
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spilled.get() > 0L,
        "the 32-row threshold must force the window buffers to disk")
      assert(underPressure.sameElements(inMem),
        "a spilled run must produce the bit-identical result")
    } finally {
      s.sparkContext.removeSparkListener(listener)
      prior.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }

  test("packBatches cumsum spills on a single-source skewed frame, result unchanged") {
    // q88/q77's packing shards its cumsum window by `source` — so ONE
    // giant source is the worst case: that source's whole doc list lands
    // in a single window partition on a single task. The defense is the
    // same spill path as q31's running sum: the window buffer degrades to
    // disk instead of OOMing, bit-identically. Proven here on a frame
    // with ALL rows in one source (the shape a crawl-dump corpus takes
    // when one domain dominates).
    import spark.implicits._
    val s = spark
    val skewed = (1L to 20000L).map(i => ("the_one_source", i, 40L + i % 7))
      .toDF("source", "doc_id", "n_tokens")
    val keys = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "32")
    val inMem = operators.TextAnalysis.packBatches(skewed).collect()
    assert(inMem.length > 300, "the skewed source must pack into many batches")
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          spilled.addAndGet(e.taskMetrics.diskBytesSpilled)
    }
    val prior = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    s.sparkContext.addSparkListener(listener)
    try {
      keys.foreach { case (k, v) => s.conf.set(k, v) }
      val underPressure = operators.TextAnalysis.packBatches(skewed).collect()
      val deadline = System.nanoTime() + 10e9.toLong
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(spilled.get() > 0L,
        "the one-source window partition must go to disk, not OOM")
      assert(underPressure.sameElements(inMem),
        "a spilled packing run must produce the bit-identical batches")
      // and the two-pass prefix-sum form (q108) reproduces the same
      // batches on this worst case WITHOUT any unbounded partition:
      // its widest window is one doc_id-range shard, not the source
      assert(operators.TextAnalysis.packBatchesSharded(skewed)
        .collect().sameElements(inMem),
        "sharded two-pass packing must equal the one-pass cumsum")
    } finally {
      s.sparkContext.removeSparkListener(listener)
      prior.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }

  test("property: sharded two-pass packing equals one-pass on random frames") {
    // the prefix correction must hold for ANY frame, not just the skew
    // case: seeded random frames with multiple sources, doc_ids that
    // straddle shard boundaries (ids drawn around multiples of the
    // 1000-wide shard), sparse shards, and token counts spanning
    // fractions of the pack budget
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val nSrc = 1 + rnd.nextInt(3)
      val rows = (0 until 200 + rnd.nextInt(300)).map { _ =>
        val src = s"s${rnd.nextInt(nSrc)}"
        // cluster ids near shard boundaries to exercise the handoff
        val id = rnd.nextInt(8) * 1000L + rnd.nextInt(20) - 10 match {
          case v if v < 0 => -v
          case v => v
        }
        (src, id, 1L + rnd.nextInt(3000))
      }.distinct
        // one row per (source, doc_id): duplicate ids would make the
        // within-shard cumsum order-ambiguous in BOTH forms
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = rows.toDF("source", "doc_id", "n_tokens")
      val a = operators.TextAnalysis.packBatches(df).collect()
      val b = operators.TextAnalysis.packBatchesSharded(df).collect()
      assert(a.sameElements(b), s"trial $trial: sharded != one-pass")
    }
    // degenerate frames
    val empty = Seq.empty[(String, Long, Long)].toDF("source", "doc_id", "n_tokens")
    assert(operators.TextAnalysis.packBatchesSharded(empty).collect().isEmpty)
    val one = Seq(("s", 999L, 5L)).toDF("source", "doc_id", "n_tokens")
    assert(operators.TextAnalysis.packBatchesSharded(one).collect()
      .sameElements(operators.TextAnalysis.packBatches(one).collect()))
  }

  test("q111 bloom prefilter: metrics prove the map-side row cut before the join") {
    // the selectivity claim, measured: the might_contain filter must pass
    // only true eval-gram hits plus the bounded false-positive sliver —
    // at 100 TB this is the difference between shuffling the whole train
    // gram table into the join and shuffling a contaminated sliver
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    val df = graft.operators.Dedup
      .queries("q111_bloom_decontaminate")(spark, sf0001)
    df.collect()
    // AQE wraps materialized stages in QueryStageExec LEAVES — a plain
    // collect() stops at the stage boundary, so flatten through them
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val filters = flatten(df.queryExecution.executedPlan).collect {
      case f: FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, "bloom prefilter FilterExec not found")
    val passed = filters.map(_.metrics("numOutputRows").value).sum
    // denominator measured independently: all train-side grams
    val trainGrams = graft.Tables.t(spark, sf0001, "documents")
      .filter(!col("source").isin("src0", "src1", "src2"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(split(col("text"), " ")) - 7),
        i => substring(md5(concat_ws(" ",
          slice(split(col("text"), " "), i, lit(8)))), 1, 16))).as("s"))
      .distinct().count()
    // true contamination on this corpus is a sliver; 1% FP default makes
    // anything above a quarter of the table a broken prefilter
    assert(passed < trainGrams / 4,
      s"bloom passed $passed of $trainGrams train grams — no real cut")
    // and nothing true is lost: every exact hit survived the prefilter
    val hits = df.agg(sum(col("n_grams_hit"))).head.getLong(0)
    assert(passed >= hits,
      s"prefilter passed $passed rows but the exact join found $hits hits")
  }

  test("Observation collects pipeline metrics with no extra pass") {
    // at 100 TB the difference between df.observe and a separate
    // metrics query is a full corpus scan: observe piggybacks exact
    // counters on the one pass the pipeline already makes
    val obs = new org.apache.spark.sql.Observation("pre_filter_metrics")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .observe(obs, count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .filter(length(col("text")) >= 100)
    val kept = docs.count()
    val m = obs.get
    val total = m("n_docs").asInstanceOf[Long]
    assert(total > 0 && kept < total,
      "metrics must cover the PRE-filter corpus, count() the filtered one")
    assert(m("n_chars").asInstanceOf[Long] > 0)
  }
}
