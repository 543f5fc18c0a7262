package graft.store

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet datasets — the maintenance operation
  * that keeps long-lived stores scannable (a trend store appended every 15
  * minutes accumulates thousands of tiny files; scan parallelism and
  * footer overhead degrade long before capacity does).
  */
object Compaction {

  /** Rewrite `srcDir` into `dstDir` with approximately `rowsPerFile` rows
    * per output file (repartitioned by range on `sortCols` when given, so
    * files stay clustered for pruning). Returns (files before, files
    * after). The rewrite is out-of-place: callers swap directories after
    * validating, which keeps the operation crash-safe. */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                rowsPerFile: Long, sortCols: Seq[String] = Nil): (Int, Int) = {
    val df = spark.read.parquet(srcDir)
    val n = df.count()
    val target = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val out =
      if (sortCols.nonEmpty) df.repartitionByRange(target, sortCols.map(col): _*)
      else df.repartition(target)
    out.write.mode(SaveMode.Overwrite).parquet(dstDir)
    // committed data files only, on the dataset's own filesystem
    // (graft.Fs skips _temporary leftovers that would skew the ratio)
    (graft.Fs.countDataFiles(spark, srcDir, ".parquet"),
      graft.Fs.countDataFiles(spark, dstDir, ".parquet"))
  }
}
