package graft.operators

import graft.SparkSpec
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

/** q143 (IVF + PQ + exact rerank) must earn its keep on BOTH axes the
  * composition exists for: recall no worse than q127 (which ADC-scans the
  * whole corpus) while ADC-scoring a strictly bounded fraction of it.
  */
class IvfPqSpec extends SparkSpec {

  private def top10(name: String): Map[Long, Set[Long]] =
    graft.SparkEntry.queries(name)(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("q143: recall vs brute force >= q127's, at a fraction of the ADC scan") {
    VectorExpressions.register(spark)
    val e = graft.Tables.t(spark, sf0001, "embeddings")
    val n = e.count()
    // exact ground truth: brute-force cosine top-10 per query
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val brute = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).toSet }
    // keys.toSeq, NOT keys.map: mapping the key SET would dedupe equal
    // per-query recalls (three 0.5s collapse to one) before the sum
    def recall(got: Map[Long, Set[Long]]): Double =
      brute.keys.toSeq.map { k =>
        (got.getOrElse(k, Set.empty) & brute(k)).size.toDouble / brute(k).size
      }.sum / brute.size
    val r127 = recall(top10("q127_ann_rerank"))
    val r143 = recall(top10("q143_ivf_pq_rerank"))
    assert(r143 >= r127,
      s"cell-restricted ADC must not lose recall here: q143=$r143 q127=$r127")
    // the trained quantizer itself: probed cells must CONTAIN the true
    // neighbors (this is what the Lloyd-trained cells buy over the
    // label-centroid strawman, which measured 0.07 here)
    val cand = Similarity.ivfCandidates(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).toSet }
    assert(recall(cand) >= 0.85,
      s"probed cells must hold the true top-10: cell-recall=${recall(cand)}")
    // scan metric: q127 ADC-scores all 3(n-1) pairs; q143 only the
    // candidates from probed cells — with nprobe=2 of 8 trained cells
    // this must be well under half the corpus per query
    val scanned = cand.values.map(_.size.toLong).sum
    val full = 3L * (n - 1)
    assert(scanned < full / 2,
      s"probed-cell ADC must scan a strict fraction: $scanned vs $full")
    info(f"recall q127=$r127%.3f q143=$r143%.3f cell=${recall(cand)}%.3f; " +
      f"ADC pairs ${scanned} / ${full} (${scanned * 100.0 / full}%.1f%%)")
  }

  test("q327: per-subspace Lloyd strictly reduces quantization error; recall measured") {
    VectorExpressions.register(spark)
    val sfdir = "/root/testdata/sf0.01"
    val e = graft.Tables.t(spark, sfdir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val brute = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).toSet }
    def recall(got: Map[Long, Set[Long]]): Double =
      brute.keys.toSeq.map { k =>
        (got.getOrElse(k, Set.empty) & brute(k)).size.toDouble / brute(k).size
      }.sum / brute.size
    def top10b(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sfdir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val standIn = recall(top10b("q100_pq_ann"))
    val trained = recall(top10b("q327_pq_trained"))
    // What training GUARANTEES — and what this corpus showed. Lloyd's
    // monotone quantity is quantization error: pinned strictly below
    // the stand-in, with no codebook collapse (all 64 (m,k) codes in
    // use). Recall@10 is pinned only as a floor and REPORTED, because
    // on THIS corpus it measured 0.333 (stand-in) vs 0.233 (trained)
    // at sf0.01: the embeddings are isotropic md5-derived unit vectors
    // - structureless by construction - so a 31%-lower-MSE codebook
    // has no cluster geometry to spend its precision on, while the
    // stand-in's actual-data-point anchors act as a locality-sensitive
    // net for top-k ranking. PQ training pays off exactly when the
    // corpus has learnable structure; the q327 scaladoc and README
    // carry the same verdict.
    val (standMse, standUsed, trainMse, trainUsed) =
      Similarity.pqMse(spark, sfdir)
    assert(trainMse < standMse,
      s"Lloyd must strictly reduce quantization error: $trainMse vs $standMse")
    assert(standUsed == 64 && trainUsed == 64,
      s"codebook collapse: stand-in used $standUsed, trained used $trainUsed of 64")
    assert(trained >= 0.15 && standIn >= 0.15,
      s"recall floor: trained=$trained stand-in=$standIn")
    info(f"recall@10: stand-in=$standIn%.3f trained=$trained%.3f; " +
      s"mse stand-in=$standMse trained=$trainMse (both all-64-codes)")
  }

  test("q327: on CLUSTERED data both quantizers recover the structure — measured") {
    // The completion of the honest verdict above, measured rather than
    // assumed: plant a corpus with real cluster structure (400 centers
    // × 10 members, deviations at 1/3 amplitude) and run the SAME
    // training/serving bodies. MEASURED RESULT: both land recall@10 =
    // 0.9 — at cluster granularity the coarse geometry is preserved by
    // data-point anchors AND trained centroids alike, so training
    // neither wins nor loses here (the structureless corpus above is
    // where they diverge, in the stand-in's favor); what the spec pins
    // is that the trained codebook NEVER loses once structure exists,
    // and that both sit at the high recall the structure affords. The
    // fine-grained MSE gain shows up in ranking only over far more
    // queries than the suite's fixed three — the q327 scaladoc carries
    // the same verdict.
    VectorExpressions.register(spark)
    import org.apache.spark.sql.functions._
    val dir = tempDir("pq_clustered").toString
    spark.range(4000).selectExpr(
      "id AS vec_id",
      "id % 400 AS ctr",
      "CAST(id % 10 AS INT) AS label")
      .selectExpr("vec_id", "label",
        "transform(sequence(0, 63), j -> " +
          "CAST(conv(substring(md5(concat('c_', CAST(ctr AS STRING), '_', " +
          "CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2001 - 1000 + " +
          "(CAST(conv(substring(md5(concat('d_', CAST(vec_id AS STRING), '_', " +
          "CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT) % 667 - 333)) AS raw")
      .selectExpr("vec_id", "label",
        "sqrt(aggregate(raw, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x)) AS nrm",
        "raw")
      .selectExpr("vec_id",
        "transform(raw, x -> CAST(CAST(x AS DOUBLE) / nrm AS FLOAT)) AS embedding",
        "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = graft.Tables.t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val brute = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).toSet }
    def recall(got: Map[Long, Set[Long]]): Double =
      brute.keys.toSeq.map { k =>
        (got.getOrElse(k, Set.empty) & brute(k)).size.toDouble / brute(k).size
      }.sum / brute.size
    def top10c(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q2, rs) => q2 -> rs.map(_._2).toSet }
    val standIn = recall(top10c("q100_pq_ann"))
    val trained = recall(top10c("q327_pq_trained"))
    assert(trained >= standIn,
      s"with planted cluster structure, training must never lose: " +
        s"trained=$trained stand-in=$standIn")
    assert(trained >= 0.85 && standIn >= 0.85,
      s"cluster structure must be recoverable: trained=$trained stand-in=$standIn")
    info(f"clustered corpus recall@10: stand-in=$standIn%.3f trained=$trained%.3f")
  }

  test("q150: staged serving is bit-identical to q143 and reads the stage") {
    val composed = graft.SparkEntry
      .queries("q143_ivf_pq_rerank")(spark, sf0001).collect().toSeq
    val served = graft.SparkEntry
      .queries("q150_staged_ann")(spark, sf0001)
    assert(served.collect().toSeq == composed,
      "staged index must serve exactly the composed pipeline's answer")
    // the serving plan's ADC side scans the CELL-PARTITIONED staged codes
    // (FileScan truncates long paths in the plan string, so match the
    // stage ROOT prefix rather than the full md5-keyed dir)
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("graft-stage-"),
      s"ADC stage must read the staged index:\n$p")
    // single-flight: a second build call is a no-op (memo already set)
    assert(graft.Staging.isStaged(Similarity.annStageDir(sf0001)))
    // the staged layout is physically partitioned by cell — nprobe cell
    // dirs is all a query's ADC scan would list at cluster scale
    val dirs = new java.io.File(Similarity.annStageDir(sf0001) + "/codes")
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("cell=")) == Similarity.LloydK,
      s"stage must be hive-partitioned on cell: ${dirs.toSeq}")
  }
}
