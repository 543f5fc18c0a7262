package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, fingerprint-committed index artifacts (r12, r11 VERDICT #1).
  *
  * Every ANN-family key used to rebuild its index INSIDE the key — the
  * harness's self-containment convention, but not the production shape: a
  * serving system builds the index once, commits it, and every query path
  * reads the committed artifact. This object is that lifecycle, assembled
  * from the store layer's existing primitives (the `store_time_travel`
  * manifest machinery + the Materializer's fingerprint gate):
  *
  *   1. a (algoVersion, count, bit_xor(xxhash64(row))) FINGERPRINT of the
  *      index's input relation decides validity — order-free exact
  *      integers, the Materializer discipline, so any row change (and any
  *      algorithm change, via the version string) invalidates;
  *   2. the built index is written as parquet and committed by a
  *      `_manifests/v1.txt` file listing + the fingerprint control file,
  *      WRITTEN LAST — a crash mid-build leaves a stale/absent fingerprint
  *      and the next caller rebuilds (never serves a half-written index);
  *   3. every subsequent call with a matching fingerprint serves the
  *      manifest's file list directly — zero build work, metadata-sized
  *      read path, exactly the Delta/Iceberg snapshot-read shape.
  *
  * Determinism makes this safe: the index builders in this repo are
  * md5-seeded and total-ordered, so the committed artifact is bit-identical
  * to a fresh build — a serve key reading the artifact hash-matches the
  * same key rebuilding in place, which is what the `store_index_persist`
  * oracle proves end to end.
  *
  * At 100 TB the fingerprint pass is one map-side-partial aggregation over
  * the input (the price of content-addressed invalidation; a deployment
  * with versioned inputs passes the version as `algoVersion` and skips the
  * scan), the build happens once per corpus version, and every serve
  * afterwards is a manifest read. In-JVM concurrency is serialized per
  * artifact dir; cross-process coordination is the catalog's job, as in
  * every lakehouse.
  */
object IndexStore {

  /** Audit/test hook: number of artifact BUILDS this JVM performed
    * (a serve from a committed artifact does not increment). */
  val builds = new java.util.concurrent.atomic.AtomicLong(0)

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Content fingerprint of `input` under algorithm version `algoVersion`:
    * row count + bit_xor of per-row xxhash64 over every column (order- and
    * partitioning-free), prefixed by the version string so an algorithm
    * change invalidates even on identical data. */
  def fingerprint(algoVersion: String, input: DataFrame): String = {
    val row = input
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(input.columns.map(col).toIndexedSeq: _*)).as("x"))
      .head()
    val x = if (row.isNullAt(1)) 0L else row.getLong(1)
    s"$algoVersion|${row.getLong(0)}|$x"
  }

  /** Serve the artifact at `dir` if its committed fingerprint matches the
    * current input; otherwise run `build`, commit, and serve the committed
    * files. `build` returns the DataFrame to persist plus any spent
    * intermediate frames to checkpoint-free once the write completes.
    * The returned DataFrame always reads FROM THE COMMITTED FILES (via the
    * manifest, never a directory listing) — both branches serve the
    * identical physical artifact, so callers hold no checkpoints. */
  def orBuild(spark: SparkSession, dir: String, algoVersion: String,
              input: DataFrame)
             (build: () => (DataFrame, Seq[DataFrame])): DataFrame = {
    val lock = locks.computeIfAbsent(dir, _ => new Object)
    lock.synchronized {
      val fp = fingerprint(algoVersion, input)
      val fpFile = s"$dir/_fingerprint.txt"
      val manifestFile = s"$dir/_manifests/v1.txt"
      val committed: Option[Seq[String]] =
        if (graft.Fs.readUtf8(spark, fpFile).contains(fp))
          graft.Fs.readUtf8(spark, manifestFile)
            .map(_.split("\n").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
        else None
      val files = committed.getOrElse {
        builds.incrementAndGet()
        val (result, spent) = build()
        // overwrite drops any previous artifact INCLUDING its fingerprint
        // and manifest, so a crash between here and the control-file
        // writes reads as "no artifact" — rebuild, never a torn serve
        result.write.mode("overwrite").parquet(dir)
        spent.foreach(graft.ops.Checkpoints.freeAll)
        val listed = graft.Fs.listDataFiles(spark, dir)
        graft.Fs.writeUtf8(spark, manifestFile, listed.mkString("\n"))
        graft.Fs.writeUtf8(spark, fpFile, fp) // commit point: written last
        listed
      }
      spark.read.parquet(files: _*)
    }
  }
}
