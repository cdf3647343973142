package graft.functions

/** The official BLAKE3 known-answer vectors (from the public BLAKE3
  * repository's test_vectors.json): input is the repeating byte sequence
  * 0,1,…,250 truncated to each length; digest is the 32-byte hash in hex.
  * The lengths cover every structural path: empty, single block, block
  * boundaries (63/64/65), chunk boundaries (1023/1024/1025), multi-chunk
  * trees (2048/2049/3072/3073/4096 — balanced and unbalanced splits). */
object Blake3Kat {

  val Vectors: Seq[(Int, String)] = Seq(
    0 -> "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
    1 -> "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
    2 -> "7b7015bb92cf0b318037702a6cdd81dee41224f734684c2c122cd6359cb1ee63",
    3 -> "e1be4d7a8ab5560aa4199eea339849ba8e293d55ca0a81006726d184519e647f",
    63 -> "e9bc37a594daad83be9470df7f7b3798297c3d834ce80ba85d6e207627b7db7b",
    64 -> "4eed7141ea4a5cd4b788606bd23f46e212af9cacebacdc7d1f4c6dc7f2511b98",
    65 -> "de1e5fa0be70df6d2be8fffd0e99ceaa8eb6e8c93a63f2d8d1c30ecb6b263dee",
    1023 -> "10108970eeda3eb932baac1428c7a2163b0e924c9a9e25b35bba72b28f70bd11",
    1024 -> "42214739f095a406f3fc83deb889744ac00df831c10daa55189b5d121c855af7",
    1025 -> "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444",
    2048 -> "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a",
    2049 -> "5f4d72f40d7a5f82b15ca2b2e44b1de3c2ef86c426c95c1af0b6879522563030",
    3072 -> "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2",
    3073 -> "7124b49501012f81cc7f11ca069ec9226cecb8a2c850cfe644e327d22d3e1cd3",
    4096 -> "015094013f57a5277b59d8475c0501042c0b642e531b0a1c8f58d2163229e969")

  val Lengths: Seq[Int] = Vectors.map(_._1)

  /** DuckDB VALUES table of the published digests for the h3 oracle. */
  val oracleSql: String =
    Vectors.map { case (n, h) => s"($n, '$h')" }
      .mkString("SELECT CAST(n AS INTEGER) AS n, blake3 FROM (VALUES ",
        ", ", ") t(n, blake3) ORDER BY n")
}
