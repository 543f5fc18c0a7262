package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental, fingerprint-gated materialization — the Spark-native
  * re-expression of the reference's materialization machinery: a derived
  * (materialized) table is recomputed per time bucket, and a bucket is
  * recomputed only when the fingerprint of its source rows has changed
  * since the last run. A stability delay keeps "hot" buckets (which may
  * still receive late data) out of materialization until they settle.
  *
  * Mechanics:
  *  - fingerprint(bucket) = (row count, bit_xor of xxhash64 over all
  *    columns) — order-independent and overflow-free, computed with one
  *    aggregation over the source (map-side partial, one shuffle on the
  *    bucket key). The row count guards the xor's blind spot (a pair of
  *    identical rows xors to zero).
  *  - state = parquet at `stateDir` holding (bucket, fingerprint); read and
  *    compared via a full outer join, so only changed/new/vanished buckets
  *    are touched.
  *  - recompute = transform(source rows of stale buckets) written with
  *    dynamic partition overwrite into `targetDir/bucket=...` — untouched
  *    buckets keep their files; the write is idempotent per bucket.
  *
  * The stale-bucket list is collected to the driver: its cardinality is the
  * number of *changed time buckets*, bounded by the retention window (e.g.
  * hours in a year ≈ 8.8k), not by data volume — safe at 100 TB.
  */
final class Materializer(spark: SparkSession, stateDir: String) {

  import Materializer._

  private def readState(): DataFrame = {
    // graft.Fs answers existence on the state dir's OWN filesystem and
    // ignores write markers: a crash that left only _temporary/_SUCCESS
    // behind degrades to the empty-state branch (conservative full
    // recompute) instead of a permanent parquet read failure
    if (graft.Fs.existsNonEmptyData(spark, stateDir)) {
      val df = spark.read.parquet(stateDir)
      // State written by an older version (before fp_sum joined the
      // fingerprint) parses fine as parquet but lacks the column; surface
      // it as NULL instead of letting the downstream select throw — the
      // null-safe compare then marks every such bucket stale, so old state
      // degrades to a one-time full recompute rather than a permanent crash.
      if (df.columns.contains("fp_sum")) df
      else df.withColumn("fp_sum",
        lit(null).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    } else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("fp_count", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("fp_hash", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("fp_sum",
            org.apache.spark.sql.types.DecimalType(38, 0)))))
  }

  /** Fingerprint every bucket of `source` (bucket column must be named
    * `bucket` and be string-typed; callers derive it, e.g.
    * `date_format(date_trunc("hour", ts), "yyyy-MM-dd HH")`). */
  private def fingerprints(source: DataFrame): DataFrame = {
    val dataCols = source.columns.filter(_ != "bucket").sorted.map(col)
    val h = xxhash64(dataCols: _*)
    // xor alone cancels over pairs of identical rows (blind to changes of
    // even multiplicity); the DECIMAL(38,0) hash sum is multiset-sensitive
    // and overflow-free, and the row count guards both
    source.groupBy("bucket").agg(
      count(lit(1)).as("fp_count"),
      bit_xor(h).as("fp_hash"),
      sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("fp_sum"))
  }

  /** Run one materialization pass; returns the buckets recomputed.
    *
    * @param source    input rows carrying a string `bucket` column
    * @param transform per-bucket derivation; must preserve the `bucket`
    *                  column in its output (it becomes the partition key)
    * @param targetDir parquet dataset directory, partitioned by bucket
    * @param stableBefore optional gate: only buckets strictly below this
    *                  value are (re)materialized — the stability delay
    *                  that keeps still-filling buckets out
    */
  def materialize(
      source: DataFrame,
      transform: DataFrame => DataFrame,
      targetDir: String,
      stableBefore: Option[String] = None): MaterializeResult = {

    val fps = stableBefore match {
      case Some(hi) => fingerprints(source).where(col("bucket") < hi)
      case None     => fingerprints(source)
    }
    val st = readState()
      .select(col("bucket").as("s_bucket"), col("fp_count").as("s_count"),
        col("fp_hash").as("s_hash"), col("fp_sum").as("s_sum"))

    val joined = fps.join(st, col("bucket") === col("s_bucket"), "left")
    val stale = joined.where(
        col("s_bucket").isNull ||
        col("fp_count") =!= col("s_count") ||
        !(col("fp_hash") <=> col("s_hash")) ||
        !(col("fp_sum") <=> col("s_sum")))
      .select("bucket").collect().map(_.getString(0)).sorted

    if (stale.nonEmpty) {
      val staleRows = source.where(col("bucket").isin(stale.toSeq: _*))
      val out = transform(staleRows)
      require(out.columns.contains("bucket"),
        "materialization transform must preserve the 'bucket' column")
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try out.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(targetDir)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // persist the new state: recomputed buckets' fresh fingerprints merged
      // over the previous state (unchanged buckets keep their entries).
      val kept = st.where(!col("s_bucket").isin(stale.toSeq: _*))
        .select(col("s_bucket").as("bucket"), col("s_count").as("fp_count"),
          col("s_hash").as("fp_hash"), col("s_sum").as("fp_sum"))
      val fresh = fps.where(col("bucket").isin(stale.toSeq: _*))
      val newState = kept.unionByName(fresh)
      // two-phase write so a crash never leaves a half-written state dir
      val tmp = stateDir + ".tmp"
      newState.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      spark.read.parquet(tmp).coalesce(1).write.mode(SaveMode.Overwrite).parquet(stateDir)
    }
    MaterializeResult(stale.toSeq)
  }

  /** Retention companion: drop state rows for buckets strictly below
    * `cutoff`, so buckets whose raw partitions were expired don't linger
    * in the fingerprint state forever (they would never be flagged —
    * the stale join is source-driven — but the state file would grow
    * without bound, and retention exists precisely to bound it). Same
    * two-phase state rewrite as [[materialize]]. Returns rows dropped. */
  def purgeStateBefore(cutoff: String): Long = {
    val st = readState()
    val keep = st.where(col("bucket") >= cutoff)
    val nDropped = st.count() - keep.count()
    if (nDropped > 0) {
      val tmp = stateDir + ".tmp"
      keep.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      spark.read.parquet(tmp).coalesce(1).write.mode(SaveMode.Overwrite).parquet(stateDir)
    }
    nDropped
  }
}

object Materializer {
  final case class MaterializeResult(recomputedBuckets: Seq[String]) {
    def nRecomputed: Int = recomputedBuckets.size
  }
}
