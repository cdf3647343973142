package graft.sources

import graft.SparkSpec

class StagingListSpec extends SparkSpec {
  import spark.implicits._

  private lazy val files = Seq(
    ("root/a.txt", 10L, 1L),
    ("root/dir1/b.txt", 20L, 2L),
    ("root/dir1/sub/c.txt", 30L, 3L),
    ("root/dir2/d.txt", 40L, 4L)
  ).toDF("path", "size", "modified_ms")

  test("one-level listing: direct files + child dirs, root excluded " +
    "(opendal.rs:190-204)") {
    val out = StagingList.listSource(files, "root/", 0, 10,
      recursive = false, filesOnly = false)
      .collect().map(r => (r.getString(1), r.getString(2))).sorted.toSeq
    assert(out == Seq(("root/a.txt", "File"), ("root/dir1", "Directory"),
      ("root/dir2", "Directory")))
  }

  test("recursive listing yields intermediate dirs in path order") {
    val out = StagingList.listSource(files, "root/", 0, 100,
      recursive = true, filesOnly = false)
      .collect().map(_.getString(1)).toSeq.sorted
    assert(out == Seq("root/a.txt", "root/dir1", "root/dir1/b.txt",
      "root/dir1/sub", "root/dir1/sub/c.txt", "root/dir2", "root/dir2/d.txt"))
  }

  test("files_only drops dirs BEFORE offset/limit; truncated sets " +
    "next_offset = offset + len (opendal.rs:196-213, list_source.rs:117)") {
    // 4 files total; offset 1 limit 2 -> b.txt, c.txt; one more remains
    val page = StagingList.listSource(files, "root/", 1, 2,
      recursive = true, filesOnly = true).collect()
    assert(page.map(_.getString(1)).toSeq.sorted ==
      Seq("root/dir1/b.txt", "root/dir1/sub/c.txt"))
    assert(page.forall(_.getAs[Boolean]("truncated")))
    assert(page.head.getAs[Long]("next_offset") == 3L)
    // dirs don't consume budget: same page WITH dirs shifts content
    val mixed = StagingList.listSource(files, "root/", 1, 2,
      recursive = true, filesOnly = false).collect()
    assert(mixed.map(_.getString(1)).toSeq.sorted ==
      Seq("root/dir1", "root/dir1/b.txt"))
  }
}
