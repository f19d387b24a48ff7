package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * tables lazily — Catalyst prunes columns and pushes filters down to the
  * vectorized parquet reader, so loading "the whole table" here is free:
  * the scan that actually runs only reads the referenced columns.
  */
object Tables {
  /** Inferred parquet schema per table PATH — metadata, not data: a
    * production job declares its table schemas instead of re-reading
    * footers per query, and Spark 4 pays a (driver-blocking) footer
    * job on every bare `spark.read.parquet`. Across a 148-query bench
    * pass those footer jobs are pure per-query latency inside the
    * timed window. The testdata is immutable per path; everything
    * downstream of the schema (scans, pushdown, results) still
    * computes from the parquet files on every invocation. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = s"$sfDir/$name.parquet"
    val sch = schemaCache.computeIfAbsent(p,
      _ => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(p)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` arrives in whatever parquet timestamp flavor the data
    * generator used — TIMESTAMP(NANOS) (older drops, which Spark's
    * vectorized reader only accepts as nanos-since-epoch via the legacy
    * nanosAsLong conf) or TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (current drops, which Spark reads as TIMESTAMP_NTZ). Normalize
    * every flavor to a microsecond TimestampType column so downstream
    * queries (`unix_micros`, windows, sessionization) see one type —
    * the same µs values DuckDB sees. NTZ→LTZ is a reinterpretation
    * under the UTC session timezone that Verify/Bench/tests all pin. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Prefer setting this at session build (Verify/Bench/tests do); kept
    // here as a defensive fallback for externally-created sessions. Same
    // value everywhere, so re-setting is idempotent. NB: getOption
    // returns the conf's DEFAULT ("false") when unset, so test against
    // the value, not presence.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // Integer `div`, not floor(x / 1000): Long `/` promotes to Double and
    // epoch-nanos (~1.7e18) exceed a double's 2^53 mantissa, so floor()
    // could round up by 1µs at day/year boundaries — diverging from
    // DuckDB's integer truncation (ADVICE r01).
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
