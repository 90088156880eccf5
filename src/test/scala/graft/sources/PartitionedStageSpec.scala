package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** q130: the partition-key filter must become pruning, not a row filter —
  * the scan reads ONE of the five lang directories and the predicate
  * never reaches the parquet row groups (there is nothing left to
  * filter: directory selection already applied it).
  */
class PartitionedStageSpec extends SparkSpec {

  test("q130: lang filter prunes to one hive partition") {
    val df = PartitionedStage.queries("q130_partitioned_scan")(spark, sf0001)
    df.collect() // finalize AQE so the physical scan is materialized
    // AQE nests the scan inside query stages, which are not `children` —
    // recurse through them explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("expected a FileSourceScan over the staged layout"))
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang predicate must be a PARTITION filter: ${scan.partitionFilters}")
    // exactly one of the five lang=<v>/ directories is selected
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.selectedPartitions.partitionCount}")
    // every surviving file lives under the en directory
    assert(scan.selectedPartitions.toPartitionArray
      .forall(_.urlEncodedPath.contains("lang=en")),
      "pruned scan must only read lang=en files")
    // and the result still matches the unpartitioned originals
    val viaStage = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val direct = graft.Tables.t(spark, sf0001, "documents")
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        sum(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long"))
          .as("content_sig"))
      .orderBy("source").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaStage.sameElements(direct),
      "partitioned roundtrip diverged from the unpartitioned truth")
  }

  test("q130 stage: five lang directories exist, data columns keep schema") {
    val dir = PartitionedStage.stage(spark, sf0001)
    val langDirs = new java.io.File(s"$dir/docs").listFiles
      .filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.sameElements(
      Array("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh")))
    val schema = PartitionedStage.readPartitioned(spark, dir).schema
    assert(schema.fieldNames.contains("lang"), "partition col discovered")
    assert(schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType, "data cols keep parquet types")
  }
}
