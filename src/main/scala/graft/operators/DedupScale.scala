package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-scale proof for the dedup flagship (the BrcScale twin for the
  * LLM-pipeline side): generate an N-document corpus (default 1e6 — 200×
  * the largest test SF), run the STAGED MinHash-LSH pipeline (q105's
  * deployment shape) and near-dup clustering (q69) end to end, and check
  * the result against the planted ground truth.
  *
  * The corpus is deterministic and partition-invariant (every token is a
  * pure function of (doc_id, position) through xxhash64 — the OneBrc
  * generator's trick): 50 tokens per doc from a 10k-word vocabulary, and
  * every doc_id ≡ 7 (mod 100) is a planted near-dup of its predecessor
  * (same token stream, last FIVE tokens swapped → 5 of 46 shingles
  * differ per side → Jaccard = 41/51 ≈ 0.804, just above the 0.8
  * threshold: the corpus deliberately sits at the LSH design point, not
  * in the easy high-J regime). Ground truth is pure doc_id arithmetic:
  *  - precision MUST be 1.0 — the verify step admits only true
  *    candidates, and unrelated docs share ~no 5-grams at this vocab;
  *  - recall is the banding probability, not 1.0: at J ≈ 0.804 with 16
  *    hashes / 4 bands, P[some band matches] = 1-(1-J⁴)⁴ ≈ 0.89 — the
  *    run asserts ≥ 0.80 and prints the measured value.
  *
  * Usage: runMain graft.operators.DedupScale [nDocs] [workDir] [--skip-gen]
  */
object DedupScale {

  val VocabSize = 10000L
  val DocTokens = 50
  val DupMod = 100L
  val DupRem = 7L

  /** Deterministic corpus: token k of doc i derives from xxhash64(seed, k)
    * where seed collapses a planted dup onto its predecessor; the last
    * five tokens of a planted dup are swapped so the pair lands at
    * J ≈ 0.804 — NEAR, not exact, and at the threshold. */
  def generate(spark: SparkSession, n: Long): DataFrame = {
    val isDup = (col("id") % DupMod) === DupRem
    val seed = when(isDup, col("id") - 1).otherwise(col("id"))
    val toks = transform(sequence(lit(1), lit(DocTokens)), k =>
      concat(lit("w"),
        pmod(xxhash64(seed, k), lit(VocabSize)).cast("string")))
    val tail = array((0 until 5).map(k => lit(s"zz$k")): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        when(isDup, concat(slice(toks, 1, DocTokens - 5), tail))
          .otherwise(toks)).as("text"))
  }

  val VecDim = 64
  val VecDupMod = 50L
  val VecDupRem = 3L

  /** Deterministic embedding corpus for the semantic-dedup gate: each
    * component uniform-ish in [-1, 1] from xxhash64(seed, dim); every
    * vec_id ≡ VecDupRem (mod VecDupMod) is a planted NEAR-dup of its
    * predecessor — same base vector plus a per-dup ±0.1 component
    * perturbation, which lands the pair at cos ≈ 0.995 (near, not
    * exact) while two independent 64-dim vectors sit at |cos| ~ 1/8
    * (3.6σ below the 0.45 threshold). */
  def generateEmbeddings(spark: SparkSession, n: Long): DataFrame = {
    val isDup = (col("id") % VecDupMod) === VecDupRem
    val seed = when(isDup, col("id") - 1).otherwise(col("id"))
    val base = transform(sequence(lit(1), lit(VecDim)), k =>
      (pmod(xxhash64(seed, k), lit(2000001L)) - 1000000L).cast("double") / 1e6)
    val noise = transform(sequence(lit(1), lit(VecDim)), k =>
      when(isDup,
        (pmod(xxhash64(col("id"), k, lit(7)), lit(2001L)) - 1000L)
          .cast("double") / 1e4)
        .otherwise(lit(0.0)))
    spark.range(n).select(
      col("id").as("vec_id"),
      zip_with(base, noise, (b, e) => (b + e).cast("float")).as("embedding"),
      lit(0).as("label"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val work = args.drop(1).headOption.filterNot(_.startsWith("--"))
      .getOrElse("/tmp/graft_dedup_scale")
    val skipGen = args.contains("--skip-gen")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](phase: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"phase":"$phase","sec":$sec%.2f,"n_docs":$n}""")
      r
    }

    val corpusDir = s"$work/corpus"
    if (!skipGen) timed("gen") {
      generate(spark, n).repartition(64)
        .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    }

    // the q105 deployment shape: stage the df-capped shingle table once,
    // then signatures → banded candidates → verified pairs off the stage
    val stage = s"$work/stage"
    timed("stage_shingles") {
      Dedup.shingles(spark, corpusDir)
        .write.mode("overwrite").parquet(s"$stage/shingles")
    }
    val pairs = timed("lsh_pairs") {
      val p = graft.CacheRegistry.cached(
        Dedup.minhashLshFrom(spark.read.parquet(s"$stage/shingles")))
      p.count()
      p
    }
    val labels = timed("clusters") {
      val l = graft.CacheRegistry.cached(
        Dedup.clustersFromPairs(pairs.select(col("i"), col("j"))))
      l.count()
      l
    }
    val nClusters = labels.filter(col("doc_id") =!= col("keeper")).count()

    // q120's split rule at full scale: hash the cluster ROOT, never the
    // doc — zero near-dup pairs may cross the train/eval boundary, and
    // the md5 cutoff must land the eval fraction near its 64/256 design
    // point even though cluster roots are a biased (min-id) id sample.
    timed("cluster_split") {
      val split = graft.CacheRegistry.cached(
        spark.range(n).select(col("id").as("doc_id"))
          .join(labels.select(col("doc_id").as("l_doc"), col("keeper")),
            col("doc_id") === col("l_doc"), "left")
          .withColumn("root", coalesce(col("keeper"), col("doc_id")))
          .select(col("doc_id"),
            (substring(md5(col("root").cast("string")), 1, 2) <= "3f")
              .as("is_eval")))
      val nEval = split.filter(col("is_eval")).count()
      val crossing = pairs.select(col("i"), col("j"))
        .join(split.select(col("doc_id").as("i"), col("is_eval").as("ei")), "i")
        .join(split.select(col("doc_id").as("j"), col("is_eval").as("ej")), "j")
        .filter(col("ei") =!= col("ej")).count()
      val frac = nEval.toDouble / n
      println(f"""{"check":"cluster_split","eval_frac":$frac%.4f,"crossing_pairs":$crossing}""")
      require(crossing == 0L,
        s"$crossing near-dup pairs cross the train/eval split")
      require(frac > 0.23 && frac < 0.27,
        s"eval fraction drifted from the 25%% design point: $frac")
      split.unpersist()
    }

    // ground truth by doc_id arithmetic: planted pair = (i, i+1) with
    // (i+1) % DupMod == DupRem (doc 0's predecessor does not exist)
    val planted = (0L until n).count(id => id % DupMod == DupRem && id > 0)
    val found = pairs.count()
    val truePos = pairs
      .filter(col("j") === col("i") + 1 && (col("j") % DupMod) === DupRem)
      .count()
    val precision = if (found == 0) 1.0 else truePos.toDouble / found
    val recall = if (planted == 0) 1.0 else truePos.toDouble / planted
    println(f"""{"check":"planted_pairs","planted":$planted,"found":$found,"precision":$precision%.4f,"recall":$recall%.4f,"dup_docs_clustered":$nClusters}""")
    require(precision == 1.0,
      s"verify step admitted a non-planted pair: precision=$precision")
    require(recall >= 0.80,
      s"LSH recall collapsed below the 16/4 design point: $recall")

    // q109 substring spans at full scale — and unlike the probabilistic
    // LSH gate, this one is EXACT: a planted dup shares tokens 1..45 with
    // its predecessor (the swapped 5-token tail breaks every window that
    // crosses position 41), so window starts 1..36 duplicate on both
    // sides and the island merge must recover exactly ONE span of
    // 36 + (W-1) = 45 tokens covering 0.9 of each 50-token doc — for the
    // planted doc AND its predecessor, and for nobody else (independent
    // xxhash64 token streams over a 10k vocab share no 10-token window).
    timed("substring_spans") {
      val spans = Dedup.queries("q109_substring_spans")(spark, corpusDir)
      val agg = spans.agg(
        count(lit(1)).as("docs"),
        sum(when(col("n_spans") === 1L && col("dup_tokens") === 45L &&
          col("n_tokens") === 50L && col("dup_frac6") === 0.9, 0L)
          .otherwise(1L)).as("bad")).head()
      val (docs, bad) = (agg.getLong(0), agg.getLong(1))
      println(s"""{"check":"planted_spans","expected_docs":${2 * planted},"got_docs":$docs,"malformed":$bad}""")
      require(docs == 2 * planted,
        s"span detection must flag each planted doc + its predecessor: got $docs, want ${2 * planted}")
      require(bad == 0, s"$bad docs deviate from the exact [1,45] span")
    }

    // the rolling-hash twin at the scale where hashing dominates: same
    // exact gate, one O(bytes+windows) Rabin-Karp pass instead of
    // re-hashing every token W times through md5(concat_ws(slice))
    timed("substring_spans_rolling") {
      val spans = Dedup.queries("q113_spans_rolling")(spark, corpusDir)
      val agg = spans.agg(
        count(lit(1)).as("docs"),
        sum(when(col("n_spans") === 1L && col("dup_tokens") === 45L &&
          col("n_tokens") === 50L && col("dup_frac6") === 0.9, 0L)
          .otherwise(1L)).as("bad")).head()
      require(agg.getLong(0) == 2 * planted && agg.getLong(1) == 0,
        s"rolling twin diverged: docs=${agg.getLong(0)} bad=${agg.getLong(1)}")
    }

    // q114 removal at full scale — EXACT, like the span gate: the
    // canonical (predecessor) side of every planted pair keeps all 50
    // tokens; the planted doc loses exactly the shared [1,45] span and
    // keeps only its 5-token zz-tail, whose cleaned fingerprint is ONE
    // constant md5 across all planted docs; every other doc is untouched.
    timed("span_removal") {
      val zzFp = java.security.MessageDigest.getInstance("MD5")
        .digest("zz0 zz1 zz2 zz3 zz4".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val rm = Dedup.queries("q114_span_removal")(spark, corpusDir)
      val agg = rm.agg(
        count(lit(1)).as("rows"),
        sum(when(col("removed_tokens") === 0L, 1L).otherwise(0L)).as("untouched"),
        sum(when(col("n_spans_removed") === 1L && col("removed_tokens") === 45L &&
          col("kept_tokens") === 5L && col("clean_fp") === zzFp, 1L)
          .otherwise(0L)).as("cut"))
        .head()
      val (rows, untouched, cut) =
        (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      println(s"""{"check":"span_removal","rows":$rows,"untouched":$untouched,"cut":$cut,"planted":$planted}""")
      require(rows == n, s"removal must report every doc: $rows != $n")
      require(cut == planted,
        s"exactly the planted docs lose their [1,45] span: cut=$cut planted=$planted")
      require(untouched == n - planted,
        s"everyone else keeps every token: untouched=$untouched")
    }

    // semantic dedup at scale: 100k vectors (or n/10 capped), K ≈ √n
    // cells — the paper's sizing, vs the test tables' fixed SemK=32. The
    // gate is probabilistic like the LSH one: over a random codebook many
    // cells score within a near-tie of a vector's best, so even a
    // cos ≈ 0.995 pair ranks different cells first a measurable fraction
    // of the time — measured 0.155 of planted pairs at 100k vectors /
    // 316 cells (single-probe recall 0.845). THAT is the recall q115's
    // second probe exists to recover: measured multi-probe recall 0.9935
    // here (1.00 at 10k/100). Floors are set under the measured values
    // (0.70 / 0.90), and multi-probe must never lose a pair single-probe
    // finds.
    val nVec = math.min(100000L, math.max(n / 10L, 10000L))
    val semDir = s"$work/semantic"
    if (!skipGen) timed("gen_embeddings") {
      generateEmbeddings(spark, nVec).repartition(32)
        .write.mode("overwrite").parquet(s"$semDir/embeddings.parquet")
    }
    timed("semantic_dedup") {
      val k = math.sqrt(nVec.toDouble).toInt
      val plantedV =
        (0L until nVec).count(id => id % VecDupMod == VecDupRem && id > 0)
      def plantedFound(probes: Int): Long =
        Similarity.semanticPairs(spark, semDir, probes, k)
          .filter(col("j") === col("i") + 1 &&
            (col("j") % VecDupMod) === VecDupRem)
          .count()
      val f1 = plantedFound(1)
      val f2 = plantedFound(2)
      val (r1, r2) = (f1.toDouble / plantedV, f2.toDouble / plantedV)
      println(f"""{"check":"semantic_planted","n_vec":$nVec,"cells":$k,"planted":$plantedV,"recall_probe1":$r1%.4f,"recall_probe2":$r2%.4f}""")
      require(r2 >= r1,
        s"multi-probe must never lose recall: $r2 < $r1")
      require(r1 >= 0.70 && r2 >= 0.90,
        s"near-identical pairs must rendezvous: probe1=$r1 probe2=$r2")
    }

    // q199's global line dedup at full scale, against pure-arithmetic
    // ground truth: docs are 50 tokens = 5 ten-token lines; a planted
    // dup (id ≡ 7 mod 100) shares lines 1-4 with its predecessor
    // (identical token stream) while line 5 stays unique (its tokens
    // 41-45 differ per doc; only the constant zz tail is shared, and a
    // full 10-token line never collides across unrelated docs at this
    // vocab). So keep-first must leave every dup doc EXACTLY 1 line,
    // its predecessor and everyone else all 5 — total kept lines
    // 5n − 4·planted, every doc surviving.
    timed("line_dedup_gate") {
      val out = graft.CacheRegistry.cached(
        Dedup.lineDedup(spark.read.parquet(s"$corpusDir/documents.parquet")))
      val docs = out.count()
      val keptLines = out.agg(sum(col("n_lines_kept"))).head().getLong(0)
      val planted = (0L until n).count(i => i % DupMod == DupRem && i > 0)
      val dupWrong = out
        .filter((col("doc_id") % DupMod === DupRem) && col("doc_id") > 0 &&
          col("n_lines_kept") =!= 1)
        .count()
      val restWrong = out
        .filter(!(col("doc_id") % DupMod === DupRem && col("doc_id") > 0) &&
          col("n_lines_kept") =!= 5)
        .count()
      println(s"""{"check":"line_dedup","n_docs":$docs,""" +
        s""""kept_lines":$keptLines,"planted":$planted,""" +
        s""""dup_wrong":$dupWrong,"rest_wrong":$restWrong}""")
      require(docs == n, s"every doc must keep at least one line: $docs")
      require(keptLines == 5 * n - 4 * planted,
        s"kept lines $keptLines != ${5 * n - 4 * planted}")
      require(dupWrong == 0L && restWrong == 0L,
        s"per-doc kept-line counts off: dup=$dupWrong rest=$restWrong")
    }

    // q198's URL/domain gate at full scale, against pure-arithmetic
    // ground truth: ~n/3 canonical URL groups (3 surface forms each),
    // every 50th group on ONE heavy domain (thousands of keepers, far
    // over the cap), the rest spread across 60k .org domains. Expected
    // kept count is recomputed WITHOUT URLs (sum of min(keepers, cap)
    // per domain over the group-id range), and the output must show
    // zero over-cap domains, the heavy domain cut to exactly the cap,
    // and only group-min keepers surviving.
    timed("url_domain_gate") {
      val docs = spark.range(n).select(col("id").as("doc_id"))
        .withColumn("g", expr("doc_id div 3"))
        .withColumn("dom", expr("CASE WHEN g % 50 = 0 THEN 'heavy.com' " +
          "ELSE 'site' || CAST(g % 60000 AS STRING) || '.org' END"))
        .withColumn("f", expr("doc_id % 3"))
        .withColumn("url", expr(
          """CASE f
            |  WHEN 0 THEN 'https://' || dom || '/p/' || g ||
            |              '?id=' || (g % 97)
            |  WHEN 1 THEN 'http://www.' || upper(dom) || ':80/p/' || g ||
            |              '/?id=' || (g % 97) || '&utm_source=x'
            |  ELSE 'https://' || dom || '/p/' || g ||
            |       '?utm_a=1&id=' || (g % 97) || '#frag'
            |END""".stripMargin))
      val out = graft.CacheRegistry.cached(
        Dedup.urlDedupCapped(spark, docs.select(col("doc_id"), col("url"))))
      val kept = out.count()
      val nGroups = (n + 2) / 3
      val expected = spark.range(nGroups)
        .select(expr("CASE WHEN id % 50 = 0 THEN 'heavy.com' " +
          "ELSE 'site' || CAST(id % 60000 AS STRING) || '.org' END").as("dom"))
        .groupBy(col("dom")).count()
        .select(sum(least(col("count"), lit(Dedup.DomainCap.toLong))))
        .head().getLong(0)
      val overCap = out.groupBy(col("domain")).count()
        .filter(col("count") > Dedup.DomainCap).count()
      val heavy = out.filter(col("domain") === "heavy.com").count()
      val badKeeper = out.filter(col("doc_id") % 3 =!= 0).count()
      println(s"""{"check":"url_domain_cap","n_docs":$n,"kept":$kept,""" +
        s""""expected":$expected,"heavy_kept":$heavy,""" +
        s""""over_cap_domains":$overCap,"bad_keepers":$badKeeper}""")
      require(kept == expected,
        s"kept $kept != expected $expected (per-domain min(keepers, cap))")
      require(overCap == 0L, s"$overCap domains exceed the cap")
      require(heavy == Dedup.DomainCap.toLong,
        s"heavy domain must be cut to exactly the cap, got $heavy")
      require(badKeeper == 0L,
        "every survivor must be its group's min doc_id")
    }
    spark.stop()
  }
}
