package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Two passes: an untimed warmup pass (JIT + codegen compilation dominate
  * sub-second queries on a cold JVM — the first query otherwise pays ~4s of
  * compiler time and the per-query numbers are noise), then the timed pass.
  */
object Bench {
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(name: String): Long = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1L
      }
      System.nanoTime() - t0
    }
    names.foreach(run) // warmup pass (untimed)
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1" else (v / 1e9).toString)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v / 1e9 }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The bench result must survive sbt's log chatter (round 1 lost it:
    // BENCH_r01.json "parsed": null because "[success] Total time..." was
    // the last stdout line). Belt and braces:
    //  1. write the bare JSON line to a file — SPARK_GRAFT_BENCH_OUT if
    //     set, else bench_out.json in the working directory;
    //  2. print it to stdout LAST (after spark.stop()), with build.sbt's
    //     `showSuccess := false` suppressing the trailing [success] line,
    //     so a naive last-line / last-JSON-line extractor finds it.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
