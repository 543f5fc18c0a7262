package graft

import org.apache.spark.sql.functions._

/** graft.store.IndexStore — the build-once/serve-many artifact lifecycle:
  * a second call with unchanged input performs ZERO builds and leaves the
  * committed bytes untouched; a data change, an algorithm-version change,
  * or a missing commit rebuilds; the serve path reads the MANIFEST's file
  * list, never the directory. */
class IndexStoreSpec extends SparkSpec {
  import graft.store.IndexStore

  private def input(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
  }

  private def artifact(dir: String, version: String, in: org.apache.spark.sql.DataFrame) =
    IndexStore.orBuild(spark, dir, version, in) { () =>
      (in.select(col("id"), length(col("payload")).as("f")).coalesce(1), Seq.empty)
    }

  test("build once, serve many: second call is a pure manifest read") {
    val dir = s"${tmpDir("idx_once")}/art"
    val before = IndexStore.builds.get()
    val first = artifact(dir, "algo-v1", input(10)).collect().toSet
    assert(IndexStore.builds.get() == before + 1)
    val committed = Fs.listDataFiles(spark, dir)
    assert(committed.nonEmpty)
    val mtimes = committed.map(f => f ->
      java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(
        new java.net.URI(f).getPath match { case "" => f; case p => p })).toMillis).toMap
    val second = artifact(dir, "algo-v1", input(10)).collect().toSet
    assert(IndexStore.builds.get() == before + 1, "serve must never rebuild")
    assert(second == first)
    committed.foreach { f =>
      val p = new java.net.URI(f).getPath match { case "" => f; case p => p }
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)).toMillis == mtimes(f),
        s"artifact file rewritten on serve: $f")
    }
  }

  test("data change and algorithm change both invalidate; stale artifact never served") {
    val dir = s"${tmpDir("idx_inval")}/art"
    val before = IndexStore.builds.get()
    assert(artifact(dir, "algo-v1", input(5)).count() == 5)
    assert(IndexStore.builds.get() == before + 1)
    // one more row -> fingerprint differs -> rebuild with the new content
    assert(artifact(dir, "algo-v1", input(6)).count() == 6)
    assert(IndexStore.builds.get() == before + 2)
    // same data, bumped algorithm version -> rebuild
    assert(artifact(dir, "algo-v2", input(6)).count() == 6)
    assert(IndexStore.builds.get() == before + 3)
    // and the bumped version now serves without building
    assert(artifact(dir, "algo-v2", input(6)).count() == 6)
    assert(IndexStore.builds.get() == before + 3)
  }

  test("a torn commit (fingerprint missing) rebuilds instead of serving") {
    val dir = s"${tmpDir("idx_torn")}/art"
    val before = IndexStore.builds.get()
    artifact(dir, "algo-v1", input(4)).collect()
    assert(IndexStore.builds.get() == before + 1)
    // simulate a crash between data write and fingerprint commit
    val (fs, fp) = Fs.fileSystem(spark, s"$dir/_fingerprint.txt")
    fs.delete(fp, false)
    assert(artifact(dir, "algo-v1", input(4)).count() == 4)
    assert(IndexStore.builds.get() == before + 2, "uncommitted artifact must rebuild")
  }

  test("fingerprint is partitioning-free and content-sensitive") {
    val a = input(8)
    val fp1 = IndexStore.fingerprint("v1", a)
    assert(IndexStore.fingerprint("v1", a.repartition(7)) == fp1)
    assert(IndexStore.fingerprint("v1", input(9)) != fp1)
    assert(IndexStore.fingerprint("v2", a) != fp1)
  }
}
