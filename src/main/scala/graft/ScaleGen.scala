package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Synthetic scale-up generator: inflates a driver testdata SF directory by
  * an integer factor, preserving the workload's *shape* so per-query timings
  * compare 1:1 across scales (the empirical evidence behind the 100× design
  * claims — see README "Scaling evidence").
  *
  * What "same shape, bigger" means here:
  *  - FK consistency: every entity key is shifted by `k · (max_key + 1)` per
  *    copy `k`, and the SAME shift is applied to every referencing fact
  *    column — joins match exactly as often per row as at 1×.
  *  - Dimension tables (nation, region) are NOT inflated: dimensions don't
  *    grow with fact volume, and inflating them would turn broadcast joins
  *    into shuffle joins — a different workload, not a bigger one.
  *  - documents: copy k>0 suffixes every token with `c<k>` — token sets
  *    across copies are DISJOINT, so the duplicate/near-dup structure
  *    within each copy is preserved (dup clusters scale linearly) and no
  *    cross-copy near-dup pairs appear (which would scale the LSH pair
  *    output quadratically — a different problem, not 10× the same one).
  *    `n_chars` is recomputed from the perturbed text.
  *  - embeddings: copy k>0 gets deterministic per-element jitter (~1e-3),
  *    keeping the vector distribution while avoiding 10 exact copies of
  *    every vector (which would make every ANN result a tie pile-up).
  *  - events: timestamps are left alone — the time RANGE of a stream is a
  *    property of the clock, not the traffic; 10× events in the same
  *    windows is what a 10× cluster actually sees.
  *
  * Copy 0 is byte-identical to the source, so the inflated directory
  * contains the original data as a subset.
  *
  * Usage: `runMain graft.ScaleGen <srcDir> <outDir> <factor> [tables]`
  * where `tables` is an optional comma-separated subset (e.g.
  * `documents,embeddings` for a corpus-only inflation at factors where
  * inflating the TPC-H facts would just burn disk the dedup/ANN scale
  * runs never read).
  */
object ScaleGen {

  private def copies(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__k", explode(sequence(lit(0L), lit(factor - 1L))))

  /** max(key)+1 — the per-copy shift that keeps key spaces disjoint. */
  private def shiftOf(df: DataFrame, key: String): Long =
    df.agg(coalesce(max(col(key)), lit(0L)).cast("long")).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcDir> <outDir> [factor]")
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, "factor must be >= 1")
    val onlyTables: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    def wanted(name: String): Boolean =
      onlyTables.isEmpty || onlyTables(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String) = Tables.load(spark, src, name)
    def save(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // entity shifts, each read once from its owning table — lazy so a
    // table-subset run never scans tables it won't write
    lazy val ordShift  = shiftOf(load("orders"), "o_orderkey")
    lazy val custShift = shiftOf(load("customer"), "c_custkey")
    lazy val partShift = shiftOf(load("part"), "p_partkey")
    lazy val suppShift = shiftOf(load("supplier"), "s_suppkey")

    def bump(c: String, shift: Long) = col(c) + col("__k") * lit(shift)

    // dimensions: pass through unchanged
    if (wanted("nation")) save(load("nation"), "nation")
    if (wanted("region")) save(load("region"), "region")

    if (wanted("customer")) save(copies(load("customer"), factor)
      .withColumn("c_custkey", bump("c_custkey", custShift))
      .drop("__k"), "customer")

    if (wanted("supplier")) save(copies(load("supplier"), factor)
      .withColumn("s_suppkey", bump("s_suppkey", suppShift))
      .drop("__k"), "supplier")

    if (wanted("part")) save(copies(load("part"), factor)
      .withColumn("p_partkey", bump("p_partkey", partShift))
      .drop("__k"), "part")

    if (wanted("orders")) save(copies(load("orders"), factor)
      .withColumn("o_orderkey", bump("o_orderkey", ordShift))
      .withColumn("o_custkey", bump("o_custkey", custShift))
      .drop("__k"), "orders")

    if (wanted("lineitem")) save(copies(load("lineitem"), factor)
      .withColumn("l_orderkey", bump("l_orderkey", ordShift))
      .withColumn("l_partkey", bump("l_partkey", partShift))
      .withColumn("l_suppkey", bump("l_suppkey", suppShift))
      .drop("__k"), "lineitem")

    if (wanted("documents")) {
      val docShift = shiftOf(load("documents"), "doc_id")
      save(copies(load("documents"), factor)
        .withColumn("doc_id", bump("doc_id", docShift))
        .withColumn("text", when(col("__k") === 0L, col("text"))
          // `$0c<k>`: whole-match backreference + copy tag — every token of
          // copy k ends in an alphanumeric tag no other copy's tokens carry
          .otherwise(regexp_replace(col("text"), lit("\\S+"),
            concat(lit("$0c"), col("__k").cast("string")))))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__k"), "documents")
    }

    if (wanted("embeddings")) {
      val vecShift = shiftOf(load("embeddings"), "vec_id")
      save(copies(load("embeddings"), factor)
        .withColumn("vec_id", bump("vec_id", vecShift))
        .withColumn("embedding",
          when(col("__k") === 0L, col("embedding"))
            // the cast back to float matters: float arithmetic widens to
            // double in Spark, and a silently-double embedding column would
            // break every Array[Float] consumer downstream
            .otherwise(zip_with(col("embedding"),
              transform(sequence(lit(0), size(col("embedding")) - 1), i =>
                ((pmod(hash(col("vec_id"), col("__k"), i), lit(1000)) - 500)
                  .cast("float") / lit(500000.0f))),
              (x, j) => (x + j).cast("float"))))
        .drop("__k"), "embeddings")
    }

    if (wanted("events")) {
      val evShift = shiftOf(load("events"), "event_id")
      val userShift = shiftOf(load("events"), "user_id")
      save(copies(Tables.load(spark, src, "events"), factor)
        .withColumn("event_id", bump("event_id", evShift))
        .withColumn("user_id", bump("user_id", userShift))
        .drop("__k"), "events")
    }

    println(s"""{"scalegen":"done","src":"$src","out":"$out","factor":$factor}""")
    spark.stop()
  }
}
