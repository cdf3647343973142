package graft.sources

import graft.SparkSpec

class ArchiveLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("layout ladder: root vs wrapper, ELN rule, stray entries, ambiguity, stripping") {
    val entries = Seq(
      // a1: plain root crate with signature
      ("a1", false, "ro-crate-metadata.json", false),
      ("a1", false, "data/f1", false),
      ("a1", false, "ro-crate-metadata.json.minisig", false),
      ("a1", false, "data", true),
      // a2: ELN with root metadata -> rejected
      ("a2", true, "ro-crate-metadata.json", false),
      // a3: clean wrapper (its own dir row dropped, prefix stripped)
      ("a3", true, "wrap", true),
      ("a3", true, "wrap/ro-crate-metadata.json", false),
      ("a3", true, "wrap/data/f1", false),
      ("a3", true, "wrap/data/f2", false),
      // a4: wrapper + stray top-level file
      ("a4", false, "wrap/ro-crate-metadata.json", false),
      ("a4", false, "stray.txt", false),
      // a5: the wrapper name exists as a FILE
      ("a5", false, "wrap", false),
      ("a5", false, "wrap/ro-crate-metadata.json", false),
      // a6: no descriptor at all
      ("a6", false, "data/f1", false),
      // a7: root + wrapper -> ambiguous; a DEEP copy does not count
      ("a7", false, "ro-crate-metadata.json", false),
      ("a7", false, "wrap/ro-crate-metadata.json", false),
      ("a7", false, "wrap/deep/ro-crate-metadata.json", false))
      .toDF("arc_id", "eln", "path", "directory")
    val got = ArchiveLayout.inspect(entries)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a1").getAs[String]("verdict") == "ok_root" &&
      got("a1").getAs[Long]("n_payload") == 1L &&
      got("a1").getAs[Boolean]("has_signature"))
    assert(got("a2").getAs[String]("verdict") == "eln_needs_wrapper")
    val a3 = got("a3")
    assert(a3.getAs[String]("verdict") == "ok_wrapper" &&
      a3.getAs[String]("wrapper") == "wrap" &&
      a3.getAs[Long]("n_payload") == 2L &&
      !a3.getAs[Boolean]("has_signature"), a3.toString)
    assert(got("a4").getAs[String]("verdict") == "stray_top_level")
    assert(got("a5").getAs[String]("verdict") == "stray_top_level")
    assert(got("a6").getAs[String]("verdict") == "no_metadata")
    assert(got("a7").getAs[String]("verdict") == "ambiguous")
  }

  test("path rules: trims, collapse, and the unsafe ladder") {
    val paths = Seq(
      (1L, "a/b/c.txt"), (2L, "././x/"), (3L, "a//b"), (4L, "a\\b"),
      (5L, "./"), (6L, "/abs"), (7L, "a/../b"), (8L, "D:/x"),
      (9L, "a/./b"), (10L, "a\u0001b"), (11L, "a\u0000b"), (12L, "..."),
      (13L, "///"))
      .toDF("p_id", "raw")
    val got = ArchiveLayout.normalizePaths(paths)
      .collect().map(r => r.getLong(0) -> r).toMap
    def v(i: Long) = got(i).getString(1)
    assert(v(1) == "ok" && got(1L).getString(2) == "a/b/c.txt")
    assert(v(2) == "ok" && got(2L).getString(2) == "x")
    assert(v(3) == "ok" && got(3L).getString(2) == "a/b")
    assert(v(4) == "unsafe_path")
    // "./" trims to "." (trailing slash FIRST), a CurDir component
    assert(v(5) == "unsafe_relative")
    assert(v(13) == "empty_path") // all-slash trims to nothing
    assert(v(6) == "unsafe_relative")
    assert(v(7) == "unsafe_relative")
    assert(v(8) == "unsafe_relative")
    assert(v(9) == "unsafe_relative")
    assert(v(10) == "control_char")
    assert(v(11) == "unsafe_path") // NUL rejects before anything else
    // '...' is a NORMAL component (not CurDir/ParentDir) and passes
    assert(v(12) == "ok" && got(12L).getString(2) == "...")
  }
}
