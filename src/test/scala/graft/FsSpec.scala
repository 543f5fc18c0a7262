package graft

/** graft.Fs: the shared filesystem facade's hidden-entry semantics — a
  * directory holding only write markers must read as empty, and leftover
  * `_temporary` trees must not count as data. */
class FsSpec extends SparkSpec {

  test("a dir with only write markers counts as empty data") {
    val root = tmpDir("fs_markers")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "_SUCCESS"), "")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_temporary", "0"))
    assert(Fs.exists(spark, root))
    assert(!Fs.existsNonEmptyData(spark, root))
    // one committed file flips it
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "part-0.parquet"), "x")
    assert(Fs.existsNonEmptyData(spark, root))
  }

  test("countDataFiles skips hidden subtrees and hidden files") {
    val root = tmpDir("fs_count")
    val tmp = java.nio.file.Paths.get(root, "_temporary", "attempt0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.writeString(tmp.resolve("part-9.parquet"), "uncommitted")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "part-0.parquet"), "a")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "part-1.parquet"), "b")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, ".hidden.parquet"), "c")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(root, "notes.txt"), "d")
    assert(Fs.countDataFiles(spark, root, ".parquet") == 2)
  }

  test("utf8 control-file round trip and overwrite") {
    val root = tmpDir("fs_utf8")
    val f = s"$root/state._fingerprint"
    assert(Fs.readUtf8(spark, f).isEmpty)
    Fs.writeUtf8(spark, f, "a:1")
    assert(Fs.readUtf8(spark, f).contains("a:1"))
    Fs.writeUtf8(spark, f, "b:2")
    assert(Fs.readUtf8(spark, f).contains("b:2"))
  }
}
