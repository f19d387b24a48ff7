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
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects by default. Read it as nanos-since-epoch (legacy
    * conf, runtime-settable) and convert to a microsecond TimestampType
    * column — same value DuckDB sees at µs precision. */
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
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    // Integer `div`, not floor(x / 1000): Long `/` promotes to Double and
    // epoch-nanos (~1.7e18) exceed a double's 2^53 mantissa, so floor()
    // could round up by 1µs at day/year boundaries — diverging from
    // DuckDB's integer truncation (ADVICE r01).
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
