package graft.onebrc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §5 items 2/5: cross-format parity (the rebuild's analog of the
  * reference's N-engines-one-answer cross-validation) and the P1-vs-R2
  * schema split (Polars infers the measure dtype, the Rust engine declares
  * it — both must agree).
  */
class FormatParitySpec extends SparkSpec {

  private lazy val work = java.nio.file.Files
    .createTempDirectory("graft_fmt").toString

  test("CSV scan and Parquet scan of the same rows aggregate identically") {
    val gen = OneBrc.generate(spark, 20000L)
    gen.write.mode("overwrite").option("sep", ";").option("header", "false")
      .csv(s"$work/m_csv")
    gen.write.mode("overwrite").parquet(s"$work/m_parquet")
    val fromCsv = OneBrc.brcAgg(
      OneBrc.readMeasurements(spark, s"$work/m_csv")).collect().toSeq
    val fromParquet = OneBrc.brcAgg(
      spark.read.parquet(s"$work/m_parquet")).collect().toSeq
    assert(fromCsv == fromParquet)
  }

  test("inferred-schema scan (P1 style) agrees with explicit schema (R2 style)") {
    val golden = "/root/repo/fixtures/measurements_golden.csv"
    val inferred = spark.read
      .option("sep", ";").option("header", "false").option("inferSchema", "true")
      .csv(golden)
      .toDF("station", "measure")
    assert(inferred.schema("measure").dataType ==
      org.apache.spark.sql.types.DoubleType) // inference lands on double
    val a = OneBrc.brcAgg(inferred).collect().toSeq
    val b = OneBrc.brcAgg(OneBrc.readMeasurements(spark, golden)).collect().toSeq
    assert(a == b)
  }

  test("fast text+split scan agrees with the CSV datasource scan") {
    val golden = "/root/repo/fixtures/measurements_golden.csv"
    assert(
      OneBrc.brcAgg(OneBrc.readMeasurementsFast(spark, golden)).collect().toSeq ==
        OneBrc.brcAgg(OneBrc.readMeasurements(spark, golden)).collect().toSeq)
  }

  test("turbo single-pass parser agrees with the CSV datasource scan") {
    val golden = "/root/repo/fixtures/measurements_golden.csv"
    assert(
      OneBrc.brcAgg(OneBrc.readMeasurementsTurbo(spark, golden)).collect().toSeq ==
        OneBrc.brcAgg(OneBrc.readMeasurements(spark, golden)).collect().toSeq)
    // malformed lines -> null station/measure (not errors)
    val bad = java.nio.file.Files.createTempFile("brct", ".csv")
    java.nio.file.Files.writeString(bad,
      // trailing-dot and 3-integer-digit measures are outside the 1BRC
      // domain and must null out, not silently coerce
      "Oslo;1.5\nnonsense\nOslo;x.y\nOslo;-12.3\nOslo;12.\nOslo;123.4\nOslo;.5\n")
    val parsed = OneBrc.readMeasurementsTurbo(spark, bad.toString).collect()
    assert(parsed.count(r => !r.isNullAt(1)) == 2)
    assert(parsed.exists(r => !r.isNullAt(1) && r.getDouble(1) == -12.3))
  }

  test("split-expression tenths path agrees with the CSV datasource scan") {
    val golden = "/root/repo/fixtures/measurements_golden.csv"
    assert(
      OneBrc.brcAggTenths(OneBrc.readMeasurementsTenths(spark, golden))
        .collect().toSeq ==
        OneBrc.brcAgg(OneBrc.readMeasurements(spark, golden)).collect().toSeq)
    // malformed measures -> null tenths; missing ';' -> null station too
    val bad = java.nio.file.Files.createTempFile("brcs", ".csv")
    java.nio.file.Files.writeString(bad,
      "Oslo;1.5\nnonsense\nOslo;x.y\nOslo;-12.3\nOslo;12.\nOslo;123.4\n")
    val parsed = OneBrc.readMeasurementsTenths(spark, bad.toString).collect()
    assert(parsed.count(r => !r.isNullAt(1)) == 2)
    assert(parsed.count(r => r.isNullAt(0)) == 1, "only the ';'-less line")
    assert(parsed.exists(r => !r.isNullAt(1) && r.getLong(1) == -123L))
  }

  test("integer-tenths aggregation (R4/R5) agrees with double path on 1-dp data") {
    // fixed-point and float paths coincide exactly when inputs are 1-decimal
    val gen = OneBrc.generate(spark, 20000L)
    val viaTenths = gen
      .select(col("station"), (graft.Tables.tenths(col("measure")) / 10.0)
        .cast("double").as("measure"))
    assert(OneBrc.brcAgg(viaTenths).collect().toSeq ==
      OneBrc.brcAgg(gen).collect().toSeq)
  }
}
