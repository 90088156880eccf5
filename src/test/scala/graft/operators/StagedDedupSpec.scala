package graft.operators

import graft.SparkSpec

/** The staged-pipeline shape for LSH dedup: materialize the shingle table
  * once, run the signature + verify phase against the stage. At 100 TB the
  * one-shot formulation's N plan-level re-derivations of the shingle
  * pipeline each re-scan the raw corpus; the stage costs one extra write
  * of the (much smaller) shingle table and caps raw-corpus passes at one.
  */
class StagedDedupSpec extends SparkSpec {

  test("staged minhash-LSH equals the one-shot query, without re-scanning documents") {
    val work = tempDir("graft_stage").toString
    val oneShot = Dedup.queries("q63_minhash_lsh")(spark, sf0001).collect().toSeq
    val staged = Dedup.minhashLshStaged(spark, sf0001, work)
    assert(staged.collect().toSeq == oneShot)
    // the join phase reads ONLY the stage: zero scans of the raw corpus
    val p = staged.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      "staged phase must not touch the raw documents table")
    assert(p.contains("shingles"), "staged phase reads the materialized stage")
    // and the one-shot plan shows why staging matters: every use site
    // re-derives the pipeline from the raw table
    val oneShotPlan = Dedup.queries("q63_minhash_lsh")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("documents\\.parquet".r.findAllIn(oneShotPlan).length >= 4)
  }

  test("q105 first-class staged query equals q63 and stages under the JVM temp root") {
    val q63 = Dedup.queries("q63_minhash_lsh")(spark, sf0001).collect().toSeq
    val q105 = Dedup.queries("q105_staged_dedup")(spark, sf0001)
    assert(q105.collect().toSeq == q63, "staging must not change a bit")
    // the stage landed under the per-JVM root (removed on JVM exit) and
    // the verify phase reads it, not the raw corpus
    val stage = new java.io.File(Dedup.stageDir(sf0001), "shingles")
    assert(stage.isDirectory && stage.listFiles.nonEmpty)
    val p = q105.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"))
  }
}
