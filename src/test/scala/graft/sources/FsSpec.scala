package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class FsSpec extends SparkSpec {

  test("ls / exists / rm round-trip") {
    val dir = Files.createTempDirectory("graft_fs").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "hello")
    Files.writeString(java.nio.file.Paths.get(dir, "b.txt"), "world!")
    val entries = Fs.ls(spark, dir)
    assert(entries.map(_.name) === Seq("a.txt", "b.txt"))
    assert(entries.find(_.name == "b.txt").get.size === 6L)
    assert(Fs.exists(spark, s"$dir/a.txt"))
    assert(Fs.rm(spark, s"$dir/a.txt"))
    assert(!Fs.exists(spark, s"$dir/a.txt"))
    assert(Fs.rm(spark, dir, recursive = true))
    assert(!Fs.exists(spark, dir))
  }

  test("mkdirs creates nested dirs for a clean landing zone") {
    val base = Files.createTempDirectory("graft_fs2").toString
    assert(Fs.mkdirs(spark, s"$base/x/y/z"))
    assert(Fs.exists(spark, s"$base/x/y/z"))
  }
}
