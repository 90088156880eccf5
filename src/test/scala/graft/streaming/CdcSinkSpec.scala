package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q172's exactly-once sink protocol: marker-gated idempotent batches,
  * checkpoint restart without double-apply, and LWW convergence under a
  * different batch split.
  */
class CdcSinkSpec extends SparkSpec {

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).sortBy(_.getName)

  private def expected() =
    graft.SparkEntry.queries("q172_stream_cdc_sink")(spark, sf0001)
      .collect().toSeq

  test("q172: a re-delivered batch is a committed no-op (marker gate)") {
    val src = Streaming.cdcStreamDir(spark, sf0001)
    val root = tempDir("cdc-redeliver").toString
    val batch = spark.read.parquet(partFiles(src).head.getAbsolutePath)
    Streaming.applyCdcBatch(root, sf0001)(batch, 0L)
    val v0 = new java.io.File(s"$root/v0")
    val sig = v0.listFiles.map(f => (f.getName, f.length, f.lastModified)).toSet
    // redelivery with the same id — the restart path — must not rewrite
    Streaming.applyCdcBatch(root, sf0001)(batch, 0L)
    assert(v0.listFiles.map(f => (f.getName, f.length, f.lastModified)).toSet
      == sig, "re-delivered batch must leave committed output untouched")
  }

  test("q172: checkpoint restart resumes mid-log without double-applying") {
    val fullSrc = Streaming.cdcStreamDir(spark, sf0001)
    val files = partFiles(fullSrc)
    assert(files.length == 4)
    val src = tempDir("cdc-restart-src").toString
    val root = tempDir("cdc-restart-root").toString
    val ckpt = tempDir("cdc-restart-ckpt").toString
    def copyIn(fs: Seq[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, f.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // phase 1: half the log arrives, stream runs to quiescence and stops
    copyIn(files.take(2))
    Streaming.runCdcStream(spark, src, root, ckpt, sf0001, wipe = false)
    val phase1 = new java.io.File(root).listFiles
      .filter(_.getName.endsWith(".committed"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(phase1.nonEmpty, "phase 1 must commit at least one batch")
    // phase 2: the rest arrives, a NEW query resumes from the checkpoint
    copyIn(files.drop(2))
    Streaming.runCdcStream(spark, src, root, ckpt, sf0001, wipe = false)
    val phase2 = new java.io.File(root).listFiles
      .filter(_.getName.endsWith(".committed"))
      .map(f => f.getName -> f.lastModified).toMap
    assert(phase2.size > phase1.size, "restart must process the new files")
    phase1.foreach { case (n, m) =>
      assert(phase2(n) == m, s"restart re-committed batch $n")
    }
    val got = Streaming.serveCdcState(spark, root, sf0001).collect().toSeq
    assert(got == expected(),
      "state after a mid-log restart must equal the uninterrupted run")
  }

  test("q172: LWW converges under a different batch split") {
    val fullSrc = Streaming.cdcStreamDir(spark, sf0001)
    val src = tempDir("cdc-resplit-src").toString
    // 2 files instead of 4 — different batch boundaries, same log
    spark.read.parquet(fullSrc).repartition(2)
      .write.mode("overwrite").parquet(src)
    val root = tempDir("cdc-resplit-root").toString
    val ckpt = tempDir("cdc-resplit-ckpt").toString
    Streaming.runCdcStream(spark, src, root, ckpt, sf0001, wipe = false)
    val got = Streaming.serveCdcState(spark, root, sf0001).collect().toSeq
    assert(got == expected(),
      "final state must be independent of the batch split")
  }
}
