package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The production streaming shape the memory-sink demos (q95–q97) don't
  * exercise: a watermarked windowed aggregation writing APPEND mode to a
  * parquet file sink with a checkpointLocation, killed mid-stream and
  * restarted. The checkpoint must make the restart (a) skip already-
  * committed input files (exactly-once input), (b) restore the window
  * state so a window whose rows span the restart still aggregates to the
  * exact batch answer, and (c) never re-emit a window already written to
  * the sink (exactly-once output).
  */
class CheckpointRestartSpec extends SparkSpec {

  private val evSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType)))

  /** write df as a single parquet FILE at dst (file source tracks files). */
  private def dumpOne(df: DataFrame, dst: java.nio.file.Path): Unit = {
    val tmp = tempDir("graft_dump")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("checkpointed file-sink stream resumes exactly-once across restart") {
    val root = tempDir("graft_ckpt")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // time-ordered thirds of the event stream: file boundaries are time
    // boundaries, so nothing ever arrives later than the watermark and
    // every emitted window holds its complete, final count
    val ev = graft.Tables.events(spark, sf0001).select(col("ts"), col("event_type"))
    val cuts = ev.select(col("ts").cast("long")).orderBy("ts").collect().map(_.getLong(0))
    val (t40, t70) = (cuts((cuts.length * 2) / 5), cuts((cuts.length * 7) / 10))
    dumpOne(ev.filter(col("ts").cast("long") < t40), src.resolve("f1.parquet"))

    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      def start() = spark.readStream.schema(evSchema).parquet(src.toString)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

      // phase 1: only f1 exists; process it fully, then KILL the query
      val q1 = start(); q1.processAllAvailable(); q1.stop()

      // phase 2: the rest of the stream arrives while the query is down
      dumpOne(ev.filter(col("ts").cast("long").between(t40, t70 - 1)),
        src.resolve("f2.parquet"))
      dumpOne(ev.filter(col("ts").cast("long") >= t70), src.resolve("f3.parquet"))
      val q2 = start(); q2.processAllAvailable()
      val phase2Input = q2.recentProgress.map(_.numInputRows).sum
      q2.stop()

      // (a) exactly-once input: the restart read only f2+f3, never f1
      val n1 = ev.filter(col("ts").cast("long") < t40).count()
      assert(phase2Input == ev.count() - n1,
        s"restart must skip checkpoint-committed f1: read $phase2Input rows")

      val sink = spark.read.parquet(out)
      // (c) exactly-once output: no window emitted twice across the restart
      assert(sink.groupBy("ws", "event_type").count()
        .filter(col("count") > 1).count() == 0)
      // (b) every emitted window equals the batch answer exactly — including
      // the window straddling the restart, whose phase-1 rows lived only in
      // the restored state store
      val batch = ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_b"))
        .select(col("window.start").as("ws"), col("event_type"), col("n_b"))
      val mismatched = sink.join(batch, Seq("ws", "event_type"), "left")
        .filter(col("n_b").isNull || col("n") =!= col("n_b")).count()
      assert(mismatched == 0, "every emitted window must hold its final count")
      val boundary = sink.filter(
        (col("ws").cast("long") <= t40) && (lit(t40) < col("ws").cast("long") + 3600))
      assert(boundary.count() > 0,
        "the window spanning the restart must be emitted from restored state")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("foreachBatch CDC merge maintains a keyed snapshot across restart") {
    // the streaming form of q39's SCD-1 merge: a change stream applied to
    // a keyed snapshot via foreachBatch — the no-lakehouse upsert loop a
    // 100 TB deployment runs continuously. foreachBatch is at-least-once
    // (a batch can replay after a crash), so the merge must be IDEMPOTENT:
    // latest-wins replace-by-key is — replaying the same updates against
    // the already-merged snapshot changes nothing. The checkpoint makes
    // the restart skip the committed batch entirely.
    val root = tempDir("graft_cdc")
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString
    import spark.implicits._

    // initial snapshot: keys 0..9
    @volatile var snapPath = root.resolve("snap_v0").toString
    (0L until 10L).map(k => (k, k * 1000L)).toDF("custkey", "cents")
      .write.mode("overwrite").parquet(snapPath)

    val updSchema = StructType(Seq(
      StructField("custkey", LongType), StructField("cents", LongType),
      StructField("seq", LongType)))
    def mergeBatch(batch: DataFrame, id: Long): Unit = {
      val s = batch.sparkSession
      // per-key latest within the batch (a replayed/bundled batch can
      // carry several updates for one key): max seq wins, exact longs
      val latest = batch.groupBy(col("custkey"))
        .agg(max(struct(col("seq"), col("cents"))).as("u"))
        .select(col("custkey"), col("u.cents").as("new_cents"))
      val merged = s.read.parquet(snapPath)
        .join(latest, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          coalesce(col("new_cents"), col("cents")).as("cents"))
      val next = root.resolve(s"snap_v${id + 1}").toString
      merged.write.mode("overwrite").parquet(next)
      snapPath = next // publish AFTER the write commits (crash-safe order)
    }
    def start() = spark.readStream.schema(updSchema).parquet(src.toString)
      .writeStream.foreachBatch(mergeBatch _)
      .option("checkpointLocation", ckpt).start()

    // phase 1: update keys 0-4, insert key 100
    dumpOne(((0L to 4L).map(k => (k, k * 1000L + 7L, 1L)) :+ ((100L, 555L, 1L)))
      .toDF("custkey", "cents", "seq"), src.resolve("u1.parquet"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()

    // phase 2 arrives while the query is down: keys 3-7 again (seq 2), +101
    dumpOne(((3L to 7L).map(k => (k, k * 1000L + 99L, 2L)) :+ ((101L, 777L, 2L)))
      .toDF("custkey", "cents", "seq"), src.resolve("u2.parquet"))
    val q2 = start(); q2.processAllAvailable()
    val phase2Input = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()
    assert(phase2Input == 6, s"restart must skip committed u1, read $phase2Input")

    val fin = spark.read.parquet(snapPath).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ((0L until 10L).map(k => k -> (k * 1000L)).toMap
      ++ (0L to 4L).map(k => k -> (k * 1000L + 7L)) + (100L -> 555L)
      ++ (3L to 7L).map(k => k -> (k * 1000L + 99L)) + (101L -> 777L))
    assert(fin == expected, s"snapshot after both batches must equal $expected")
  }
}
