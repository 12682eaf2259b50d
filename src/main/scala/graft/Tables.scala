package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver testdata tables.
  *
  * Explicit, schema-on-read parquet scans: at 100 TB the scan is the
  * dominant cost, so every query projects/filters as early as possible and
  * relies on parquet column pruning + predicate pushdown (verified via
  * `.explain` — `ReadSchema` / `PushedFilters`).
  *
  * Mirrors the reference's ingest surface (alsyefs/notion
  * backend/fetch_pages.py:590-620 reads/writes a CSV cache + JSON export);
  * here the cache is columnar parquet, the Spark-native choice.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and we normalize here to a microsecond TimestampType via exact
    * integer division (`div`, not `/` — double division would lose
    * precision at 1e18-ns epochs), matching DuckDB's ns→µs truncation.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.parquet(p(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))
}
