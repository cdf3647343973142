package graft.functions

import graft.cache.QueryCache
import graft.sources.Autoindex
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  private val Kat = "123456789".getBytes("US-ASCII")

  test("hash known-answer vectors for b\"123456789\" (blob/src/hash.rs:95-110)") {
    assert(Hashes.crc32(Kat) == 0xcbf43926L)
    assert(Hashes.crc32c(Kat) == 0xe3069283L)
    assert(Hashes.crc64nvme(Kat) == 0xae8b14860a799888L)
    assert(Hashes.digestHex("SHA-1", Kat) == "f7c3bc1d808e04732adf679965ccc34ca7ae3441")
    assert(Hashes.digestHex("MD5", Kat) == "25f9e794323b453885f5181f1b624d0b")
    assert(Hashes.digestHex("SHA-256", Kat) ==
      "15e2b0d3c33891ebb0f1ef609ec419420c20e320ce94c65fbc8c3312448eb225")
  }

  test("BLAKE3: official test vectors (input bytes i%251) across all tree paths") {
    Blake3Kat.Vectors.foreach { case (n, expected) =>
      val input = Array.tabulate(n)(i => (i % 251).toByte)
      assert(Blake3.hex(input) == expected, s"length $n")
    }
    // extended output: first 32 bytes of a longer output equal the hash
    val xof = Blake3.hash(Array.tabulate(65)(i => (i % 251).toByte), 131)
    assert(xof.take(32).map("%02x".format(_)).mkString ==
      "de1e5fa0be70df6d2be8fffd0e99ceaa8eb6e8c93a63f2d8d1c30ecb6b263dee")
    assert(xof.length == 131)
  }

  test("ULID: roundtrip, sort order matches timestamp order, validation") {
    val a = Ulid(1700000000000L, BigInt(42))
    val b = Ulid(1700000000001L, BigInt(0))
    assert(a.length == 26 && Ulid.isValid(a))
    assert(Ulid.timestampMs(a) == 1700000000000L)
    assert(Ulid.entropy(a) == BigInt(42))
    assert(a < b, "string order must follow timestamp order")
    assert(!Ulid.isValid("not-a-ulid"))
    assert(!Ulid.isValid("U" * 26)) // 'U' not in Crockford alphabet
    // property: order-preservation over 500 seeded random timestamp pairs
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val ts1 = math.abs(rnd.nextLong()) % (1L << 48)
      val ts2 = math.abs(rnd.nextLong()) % (1L << 48)
      val e = BigInt(math.abs(rnd.nextLong()))
      if (ts1 != ts2) {
        val (u1, u2) = (Ulid(ts1, e), Ulid(ts2, e))
        assert((ts1 < ts2) == (u1 < u2), s"order violated for $ts1 vs $ts2")
        assert(Ulid.timestampMs(u1) == ts1)
      }
    }
  }

  test("path prefix + confinement predicates (api.rs:1874-1882, blob.rs:25-51)") {
    assert(Paths.normalize("a/b/") == "/a/b")
    assert(Paths.isConfinedRelativePath("a/b/c.bin"))
    assert(!Paths.isConfinedRelativePath("/abs/path"))
    assert(!Paths.isConfinedRelativePath("a/../b"))
    // the reference ACCEPTS '.' segments and duplicate separators
    // (blob.rs positive matrix: "bucket/./object"); they collapse away
    assert(Paths.isConfinedRelativePath("bucket/./object"))
    assert(Paths.isConfinedRelativePath("a//b"))
    assert(!Paths.isConfinedRelativePath(".")) // no real segment
    assert(!Paths.isConfinedRelativePath("a/b\u0085c")) // C1 control rejected
    assert(!Paths.isConfinedRelativePath("a/bell"))
    assert(!Paths.isConfinedRelativePath(""))
    assert(Paths.clampListingPage(None, anonymous = false) == 50)
    assert(Paths.clampListingPage(Some(5000), anonymous = false) == 1000)
    assert(Paths.clampListingPage(Some(5000), anonymous = true) == 100)
    assert(Paths.shouldEstimateCount(24) && !Paths.shouldEstimateCount(23))
  }

  test("query cache: TTL expiry, generation-stamp invalidation, LRU caps") {
    var now = 0L
    val cache = new QueryCache[String](ttlMillis = 30000, maxEntries = 3,
      maxBytes = 10000, clock = () => now, sizeOf = _.length.toLong)
    val k = cache.key("scope-digest", "SELECT ?s WHERE { ?s ?p ?o }")
    cache.put(k, "result", generation = 1)
    assert(cache.get(k, currentGeneration = 1).contains("result"))
    // a racing mutation bumps the generation → stale entry dropped
    assert(cache.get(k, currentGeneration = 2).isEmpty)
    cache.put(k, "result", generation = 2)
    now = 30001 // TTL 30s exceeded
    assert(cache.get(k, currentGeneration = 2).isEmpty)
    // LRU entry cap
    now = 0
    (1 to 4).foreach(i => cache.put(s"k$i", s"v$i", 1))
    assert(cache.size == 3)
    assert(cache.get("k1", 1).isEmpty, "oldest entry evicted")
    // byte cap: oversized single value is never cached
    cache.put("big", "x" * 20000, 1)
    assert(cache.get("big", 1).isEmpty)
    // fingerprint keying is length-prefixed
    assert(cache.key("ab", "c") != cache.key("a", "bc"))
  }

  test("summary cache: one-per-graph, cursor mismatch keeps entry, TTL/remove evict, caps") {
    var now = 0L
    val cache = new graft.cache.SummaryCache(ttlMillis = 30000, maxEntries = 2,
      maxBytes = 100, clock = () => now)
    cache.insert("g1", "c1", "sum1")
    assert(cache.get("g1", "c1").contains("sum1"))
    // cursor mismatch misses WITHOUT evicting (summary_cache.rs:73 — the
    // lagging reader may still want the stored cursor's summary)
    assert(cache.get("g1", "c0").isEmpty)
    assert(cache.get("g1", "c1").contains("sum1"))
    // one summary per graph: a newer cursor supersedes (summary_cache.rs:63-65)
    cache.insert("g1", "c2", "sum2")
    assert(cache.get("g1", "c1").isEmpty)
    assert(cache.get("g1", "c2").contains("sum2"))
    assert(cache.size == 1)
    // remove-by-graph (document sync invalidation)
    cache.remove("g1")
    assert(cache.get("g1", "c2").isEmpty)
    // TTL eviction on read
    cache.insert("g1", "c2", "sum2")
    now = 30001
    assert(cache.get("g1", "c2").isEmpty)
    assert(cache.size == 0)
    // entry-count LRU: third graph evicts the least-recently-used
    now = 0
    cache.insert("g1", "c", "a")
    cache.insert("g2", "c", "b")
    cache.insert("g3", "c", "c")
    assert(cache.size == 2 && cache.get("g1", "c").isEmpty)
    // oversized summary is never cached; byte cap evicts LRU-first
    cache.insert("g4", "c", "x" * 200)
    assert(cache.get("g4", "c").isEmpty)
    cache.insert("g5", "c", "y" * 60) // 62 bytes: g2/g3 (4 bytes) must go
    assert(cache.get("g5", "c").isDefined)
    assert(cache.bytes <= 100)
  }

  test("autoindex parser: nginx and Apache pre shapes, negative page") {
    val nginx =
      """<html><head><title>Index of /data/</title></head><body>
        |<h1>Index of /data/</h1><hr><pre><a href="../">../</a>
        |<a href="subdir/">subdir/</a>     12-Jan-2024 10:00       -
        |<a href="file1.bin">file1.bin</a>   12-Jan-2024 10:05     12345
        |<a href="b%20c.txt">b c.txt</a>     13-Jan-2024 11:00       678
        |</pre><hr></body></html>""".stripMargin
    val entries = Autoindex.parse(nginx)
    assert(entries.map(_.name).toSet == Set("subdir", "file1.bin", "b c.txt"))
    assert(entries.find(_.name == "subdir").exists(_.isDir))
    assert(entries.find(_.name == "file1.bin").exists(e => !e.isDir))
    // negative: a non-index page parses to nothing
    assert(Autoindex.parse("<html><body><p>hello world</p></body></html>").isEmpty)
    // oversized page rejected
    assert(Autoindex.parse("x" * (Autoindex.MaxPageBytes + 1)).isEmpty)
  }

  test("structured ULID: layout pack/unpack, canonical decode rules (structured_id/layout.rs, mod.rs:128-139)") {
    import StructuredUlid._
    // zero packs to the all-zero canonical form
    assert(encode(BigInt(0)) == "0" * 26)
    // layout round-trip at the field extremes (REQ-META-ID-FORMAT-001)
    val cases = Seq[(Long, Int, Int, Long)](
      (0L, 1, 0, 0L),
      (281474976710655L, 1048575, 4095, 281474976710655L), // all max
      (1700000000000L, 7, 64, 123456789L))
    cases.foreach { case (t, h, b, n) =>
      val v = pack(t, h, b, n)
      assert(unpack(v) == ((t, h, b, n)))
      assert(decode(encode(v)) == Right(v)) // codec round-trip
    }
    // the max value's first char is '7': a canonical encoding never
    // starts above 7, so '8…' and 'Z…' are overflow
    val max = (BigInt(1) << 128) - 1
    assert(encode(max).head == '7')
    assert(decode("8" + encode(max).tail) == Left("overflow"))
    // strict alphabet: I, L, O, U all rejected (no Crockford aliases)
    Seq('I', 'L', 'O', 'U').foreach { c =>
      assert(decode(c + "0" * 25) == Left("invalid_char"), c)
    }
    // case-insensitive parse
    assert(decode(encode(pack(5L, 5, 5, 5L)).toLowerCase) ==
      Right(pack(5L, 5, 5, 5L)))
    assert(decode("0" * 25) == Left("invalid_length"))
    assert(decode("0" * 27) == Left("invalid_length"))
    // timestamp ordering is preserved by the string sort (ULID property)
    val a = encode(pack(1000L, 9, 9, (BigInt(1) << 48).toLong - 1))
    val bb = encode(pack(1001L, 1, 0, 0L))
    assert(a < bb)
  }

  test("entity JSON-LD validation ladder (update_metadata_document.rs:292-345)") {
    def v(s: String) = EntityJson.verdict(s)
    assert(v("""{"@id":"e1","@type":"Thing","name":"n"}""") == "ok")
    assert(v("""{"id":"e1","type":["A","B"],"name":"n"}""") == "ok")
    assert(v("""not json""") == "not_json")
    assert(v("""["a"]""") == "not_object")
    assert(v("""{"@graph":[],"@id":"e","@type":"T","name":"n"}""")
      == "has_graph")
    assert(v("""{"graph":{},"@id":"e","@type":"T","name":"n"}""")
      == "has_graph")
    // numeric and blank ids are NOT string ids
    assert(v("""{"@id":7,"@type":"T","name":"n"}""") == "missing_id")
    assert(v("""{"@id":"  ","@type":"T","name":"n"}""") == "missing_id")
    assert(v("""{"@id":"e","name":"n"}""") == "missing_type")
    assert(v("""{"@id":"e","@type":[],"name":"n"}""") == "bad_type")
    assert(v("""{"@id":"e","@type":["A",3],"name":"n"}""") == "bad_type")
    assert(v("""{"@id":"e","@type":{"k":1},"name":"n"}""") == "bad_type")
    assert(v("""{"@id":"e","@type":"T"}""") == "missing_name")
    assert(v("""{"@id":"e","@type":"T","name":""}""") == "missing_name")
  }
}
