package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q176: the brc connector's write half — row-exact roundtrip, overwrite
  * truncation, append accumulation, and the serializer's domain guard.
  */
class BrcSinkSpec extends SparkSpec {

  private def golden = graft.onebrc.OneBrc.readMeasurementsV2(
    spark, graft.Fixtures.path("measurements_golden.csv"))

  private def writeTo(dir: String, mode: String): Unit =
    golden.write.format("graft.sources.BrcDataSource")
      .mode(mode).option("path", dir).save()

  test("q176: V2 write → V2 read round-trips every row exactly") {
    val dir = tempDir("brc-sink").toString
    writeTo(dir, "overwrite")
    val back = spark.read.format("graft.sources.BrcDataSource").load(dir)
    // full multiset equality of (station, t) — stronger than the agg
    val a = golden.groupBy("station", "t").count()
    val b = back.groupBy("station", "t").count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "written lines must parse back to the identical row multiset")
    assert(back.count() == golden.count())
  }

  test("q176: overwrite truncates, append accumulates") {
    val dir = tempDir("brc-sink-modes").toString
    writeTo(dir, "overwrite")
    val n = golden.count()
    writeTo(dir, "overwrite")
    assert(spark.read.format("graft.sources.BrcDataSource").load(dir)
      .count() == n, "overwrite must clear prior files")
    writeTo(dir, "append")
    assert(spark.read.format("graft.sources.BrcDataSource").load(dir)
      .count() == 2 * n, "append must keep prior files")
  }

  test("q176: crashed-writer orphans are invisible to reads, swept on overwrite") {
    // the commit protocol: tasks stream into a dot-prefixed
    // `.*.inprogress` staging name and PUBLISH via rename at task
    // commit — so an executor dying mid-write (abort never runs) leaves
    // only a hidden orphan. Simulate one and prove (a) reads skip it,
    // (b) a truncate-mode write sweeps it.
    val dir = tempDir("brc-sink-crash").toString
    writeTo(dir, "overwrite")
    val n = golden.count()
    val orphan = new java.io.File(dir, ".part-9-999.brc.inprogress")
    java.nio.file.Files.writeString(orphan.toPath,
      "Halfwr") // a torn line, no terminator — poison if ever read
    assert(spark.read.format("graft.sources.BrcDataSource").load(dir)
      .count() == n, "hidden in-progress files must never be read")
    val csvBack = spark.read.schema("station STRING, temp STRING")
      .option("sep", ";").csv(dir)
    assert(csvBack.count() == n,
      "built-in sources must skip the orphan too (hidden-file rule)")
    writeTo(dir, "overwrite")
    assert(!orphan.exists, "truncate-mode job setup must sweep orphans")
  }

  test("q176: serializer hard-errors outside the 1BRC 999.9 domain") {
    import spark.implicits._
    val dir = tempDir("brc-sink-domain").toString
    val bad = Seq(("X", 10000L)).toDF("station", "t")
    val e = intercept[org.apache.spark.SparkException] {
      bad.write.format("graft.sources.BrcDataSource")
        .mode("overwrite").option("path", dir).save()
    }
    assert(e.getMessage.contains("999.9 domain") ||
      Option(e.getCause).exists(_.getMessage.contains("999.9 domain")))
  }
}
