package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The oracle proves content; this spec pins the LAYOUT facts the oracle
  * cannot see — that compaction actually reduced the file count to the
  * planned number and the outputs respect the size target. */
class CompactionStageSpec extends SparkSpec {

  test("q158: fragment debris compacts to the planned file count and size") {
    // run the query once so both stages exist
    val out = CompactionStage.queries("q158_compaction")(spark, sf0001).collect()
    assert(out.nonEmpty)

    def parts(dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(_.getPath.getName.startsWith("part-"))
    }
    val frag = parts(CompactionStage.fragDir(sf0001))
    val comp = parts(CompactionStage.compactDir(sf0001))
    val (bytes, planned) = CompactionStage.plan(spark, CompactionStage.fragDir(sf0001))

    // the debris layout really is debris
    assert(frag.length == CompactionStage.FragmentFiles,
      s"expected ${CompactionStage.FragmentFiles} fragment files, got ${frag.length}")
    // compaction hit the plan and actually helped
    assert(comp.length == planned, s"expected $planned files, got ${comp.length}")
    assert(comp.length < frag.length / 4,
      s"compaction barely reduced the file count: ${frag.length} -> ${comp.length}")
    // size discipline: no output file wildly above the target (2x slack —
    // parquet encodes row-group dictionaries differently when rows
    // concentrate, and the last file carries the remainder)
    comp.foreach { f =>
      assert(f.getLen <= CompactionStage.TargetBytes * 2,
        s"${f.getPath.getName} is ${f.getLen} B > 2x target")
    }
    assert(bytes > 0)

    // row-level equality of the two layouts (the oracle already binds
    // compacted-vs-originals; this binds compacted-vs-fragmented directly)
    val a = spark.read.parquet(CompactionStage.fragDir(sf0001))
      .orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(CompactionStage.compactDir(sf0001))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "compaction changed the data")
  }
}
