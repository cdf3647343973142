package graft.functions

import graft.Tables
import graft.sources.JsonLd
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-family and JSON-LD ingest coverage as oracle-checked queries. */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Structured-ULID parse/validate: canonical Crockford decode (strict
    // alphabet, 26 chars, first char 0..7), reserved-handle and
    // bucket-range checks, fields unpacked on ok rows. The oracle replays
    // the generating fields (encode∘decode must be the identity for the
    // verdicts to line up); absolute encoding bytes are pinned by the
    // spec's golden vectors.
    "sid1_structured_ids" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey").as("o"))
        .filter(col("o") % 43 === 7)
      val t = lit(1700000000000L) + col("o") % 86400000
      val h = when(col("o") % 97 === 0, 0)
        .otherwise((col("o") % 1048574 + 1).cast("int"))
      val b = (col("o") % 128).cast("int")
      val n = col("o") * 2654435761L % 281474976710656L
      val sidOk = StructuredUlid.encodeCol(t, h.cast("int"),
        b, n.cast("long"))
      val sid = when(col("o") % 11 === 8, substring(sidOk, 1, 25))
        .when(col("o") % 11 === 9,
          concat(substring(sidOk, 1, 4), lit("U"), substring(sidOk, 6, 21)))
        .when(col("o") % 11 === 10,
          concat(lit("9"), substring(sidOk, 2, 25)))
        .otherwise(sidOk)
      StructuredUlid.validate(o.select(col("o").as("req_id"),
        sid.as("sid"), lit(64).as("bucket_count")))
        .orderBy("req_id")
    },

    // Egress deny-table screening: extra-deny beats the loopback toggle,
    // the 16-row compiled IPv4 special-purpose table, range-edge probes
    "eg1_egress_screen" -> { (s, d) =>
      val ips = array(Seq(66051L, 168101125L, 1681916161L, 1686110207L,
        1686110208L, 2130706433L, 2851997961L, 2886729727L, 2886729729L,
        2887778303L, 2887778304L, 3221225477L, 3221225993L, 3227017985L,
        3232246786L, 3323068415L, 3323134724L, 3325256711L, 3405803976L,
        3758096635L, 4026531834L, 4026531841L, 4294967295L, 134744072L,
        16843009L, 1572395042L).map(lit): _*)
      val strs = array(Seq("0.1.2.3", "10.5.5.5", "100.64.1.1",
        "100.127.255.255", "100.128.0.0", "127.0.0.1", "169.254.9.9",
        "172.15.255.255", "172.16.0.1", "172.31.255.255", "172.32.0.0",
        "192.0.0.5", "192.0.2.9", "192.88.99.1", "192.168.44.2",
        "198.17.255.255", "198.19.3.4", "198.51.100.7", "203.0.113.200",
        "224.0.0.251", "239.255.255.250", "240.0.0.1", "255.255.255.255",
        "8.8.8.8", "1.1.1.1", "93.184.216.34").map(lit): _*)
      val base = Tables.orders(s, d)
        .select((col("o_orderkey") % 26).cast("long").as("i")).distinct()
        .select(col("i"),
          element_at(ips, (col("i") + 1).cast("int")).as("ip"),
          element_at(strs, (col("i") + 1).cast("int")).as("ip_str"))
      val addrs = base.withColumn("sect", lit("strict"))
        .withColumn("loopback_ok_policy", lit(false))
        .unionByName(base.withColumn("sect", lit("loopback"))
          .withColumn("loopback_ok_policy", lit(true)))
      // node-local extra deny: 8.8.8.0/24
      Egress.screenV4(addrs, Seq((134744064L, 24)))
        .orderBy("sect", "ip_str")
    },

    // multi-digest (PutObject write path shape): md5 + sha256 per document
    "h1_multihash" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("md5"),
          sha2(col("text"), 256).as("sha256"))
        .orderBy(col("doc_id"))
    },

    // CRC family over the binary payloads, fully oracle'd: DuckDB folds the
    // identical reflected lookup tables over the UTF-8 bytes (list_reduce),
    // so every checksum hash-compares bit-for-bit. CRC64/NVME exceeds the
    // signed BIGINT range, so both sides emit it as %016x hex. BLAKE3 — the
    // one digest SQL cannot replicate — is oracle-gated by h3's official
    // known-answer vectors instead.
    "h2_crc_family" -> { (s, d) =>
      val bytes = encode(col("text"), "UTF-8")
      Tables.documents(s, d)
        .select(col("doc_id"),
          Hashes.crc32Udf(bytes).as("crc32"),
          Hashes.crc32cUdf(bytes).as("crc32c"),
          format_string("%016x", Hashes.crc64nvmeUdf(bytes)).as("crc64nvme"))
        .orderBy(col("doc_id"))
    },

    // BLAKE3 known-answer gate: digests of the official test-vector inputs
    // (bytes i % 251) — the oracle carries the published digests as
    // literals, so the compare is engine-independent and deterministic
    "h3_blake3_kat" -> { (s, d) =>
      import s.implicits._
      val mk = udf((n: Int) => Blake3.hex(Array.tabulate(n)(i => (i % 251).toByte)))
      Blake3Kat.Lengths.toDF("n")
        .select(col("n"), mk(col("n")).as("blake3"))
        .orderBy(col("n"))
    },

    // listing/search clamp matrix: every page-size clamp in the API layer
    // (metadata listing 50/1000/anon 100, search page 25/100, unified 10/100,
    // count-estimate gate ≥24) evaluated over a constant request grid; the
    // oracle recomputes the clamps independently in SQL
    "cl1_clamps" -> { (s, _) =>
      import s.implicits._
      import graft.catalog.Listing
      import graft.fts.Search
      val reqs = Seq(Option.empty[Int], Some(0), Some(1), Some(23), Some(24),
        Some(25), Some(100), Some(101), Some(500), Some(1000), Some(5000))
      val rows = for { r <- reqs; a <- Seq(false, true) } yield {
        val listing = Paths.clampListingPage(r, a)
        (r, a,
          listing.toLong,
          Search.clampPageSize(r.getOrElse(Search.DefaultPageSize)).toLong,
          math.min(math.max(r.getOrElse(Listing.UnifiedSearchDefaultLimit), 1),
            Listing.UnifiedSearchMaxLimit).toLong,
          Paths.shouldEstimateCount(listing))
      }
      rows.toDF("requested", "anonymous", "listing_page", "search_page",
          "unified_page", "estimate")
        .select(col("requested").cast("long"), col("anonymous"),
          col("listing_page"), col("search_page"), col("unified_page"),
          col("estimate"))
        .orderBy(col("requested"), col("anonymous"))
    },

    // JSON-LD ingest end-to-end: documents → JSON-LD payloads → quads,
    // counted per predicate
    "jl1_ingest_counts" -> { (s, d) =>
      val payloads = Tables.documents(s, d).select(
        concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"),
        to_json(struct(
          concat(lit("doc:"), col("doc_id").cast("string")).as("@id"),
          lit("Dataset").as("@type"),
          concat(col("source"), lit("-doc-"), col("doc_id").cast("string")).as("name"),
          col("n_chars").as("contentSize"))).as("jsonld"))
      JsonLd.ingest(payloads)
        .groupBy(col("predicate"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("predicate"))
    }
  )

  /** DuckDB CRC replica: the reflected lookup tables (identical arrays the
    * JVM kernels fold) embedded as list literals, folded over the payload's
    * UTF-8 bytes with list_reduce. CRC64 runs in UBIGINT (values exceed the
    * signed range) and prints as padded hex, mirroring the Spark column. */
  private val crcSql: String = {
    def tbl(poly: Long, ty: String): String =
      Hashes.reflectedCrcTable(poly)
        .map(v => s"CAST(${java.lang.Long.toUnsignedString(v)} AS $ty)")
        .mkString("[", ",", "]")
    def fold32(table: String): String =
      s"""xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), bs),
         |      (a, x) -> xor($table[(xor(a, x) & 255) + 1], a >> 8)), 4294967295)""".stripMargin
    s"""WITH tabs AS (SELECT ${tbl(Hashes.Crc32Poly, "BIGINT")} AS t32,
       |                     ${tbl(Hashes.Crc32cPoly, "BIGINT")} AS t32c,
       |                     ${tbl(Hashes.Crc64NvmePoly, "UBIGINT")} AS t64),
       |b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
       |bytes AS (
       |  SELECT doc_id,
       |         list_transform(range(1, length(hx)//2 + 1),
       |                        i -> CAST(('0x' || substr(hx, i*2 - 1, 2)) AS BIGINT)) AS bs
       |  FROM b)
       |SELECT doc_id,
       |  ${fold32("t32")} AS crc32,
       |  ${fold32("t32c")} AS crc32c,
       |  lpad(lower(to_hex(xor(list_reduce(
       |      list_prepend(CAST(18446744073709551615 AS UBIGINT),
       |                   list_transform(bs, x -> CAST(x AS UBIGINT))),
       |      (a, x) -> xor(t64[CAST(xor(a, x) & 255 AS BIGINT) + 1], a >> 8)),
       |    CAST(18446744073709551615 AS UBIGINT)))), 16, '0') AS crc64nvme
       |FROM bytes, tabs
       |ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "eg1_egress_screen" ->
      """WITH iseq AS (SELECT DISTINCT CAST(o_orderkey % 26 AS BIGINT) AS i
        |              FROM orders),
        |base AS (SELECT i,
        |  ([66051, 168101125, 1681916161, 1686110207, 1686110208,
        |    2130706433, 2851997961, 2886729727, 2886729729, 2887778303,
        |    2887778304, 3221225477, 3221225993, 3227017985, 3232246786,
        |    3323068415, 3323134724, 3325256711, 3405803976, 3758096635,
        |    4026531834, 4026531841, 4294967295, 134744072, 16843009,
        |    1572395042])[CAST(i+1 AS INT)] AS ip,
        |  (['0.1.2.3','10.5.5.5','100.64.1.1','100.127.255.255',
        |    '100.128.0.0','127.0.0.1','169.254.9.9','172.15.255.255',
        |    '172.16.0.1','172.31.255.255','172.32.0.0','192.0.0.5',
        |    '192.0.2.9','192.88.99.1','192.168.44.2','198.17.255.255',
        |    '198.19.3.4','198.51.100.7','203.0.113.200','224.0.0.251',
        |    '239.255.255.250','240.0.0.1','255.255.255.255','8.8.8.8',
        |    '1.1.1.1','93.184.216.34'])[CAST(i+1 AS INT)] AS ip_str
        |  FROM iseq),
        |a AS (SELECT 'strict' AS sect, false AS lb, * FROM base
        |      UNION ALL SELECT 'loopback', true, * FROM base),
        |nets(net, p) AS (VALUES (0, 8), (167772160, 8), (1681915904, 10),
        |  (2130706432, 8), (2851995648, 16), (2886729728, 12),
        |  (3221225472, 24), (3221225984, 24), (3227017984, 24),
        |  (3232235520, 16), (3323068416, 15), (3325256704, 24),
        |  (3405803776, 24), (3758096384, 4), (4026531840, 4),
        |  (4294967295, 32)),
        |hit AS (SELECT a.sect, a.ip_str, a.ip, a.lb,
        |   MAX(CASE WHEN (a.ip >> (32 - n.p)) = (n.net >> (32 - n.p))
        |            THEN 1 ELSE 0 END) AS tbl
        | FROM a, nets n GROUP BY 1, 2, 3, 4)
        |SELECT sect, ip_str,
        |  CASE WHEN (ip >> 8) = (134744064 >> 8) THEN 'blocked_extra'
        |       WHEN lb AND (ip >> 24) = 127 THEN 'loopback_ok'
        |       WHEN tbl = 1 THEN 'blocked_table'
        |       ELSE 'allowed' END AS verdict
        |FROM hit ORDER BY sect, ip_str""".stripMargin,

    "sid1_structured_ids" ->
      """WITH o AS (
        |  SELECT o_orderkey AS req_id, o_orderkey%11 AS m,
        |    1700000000000 + o_orderkey%86400000 AS t,
        |    CASE WHEN o_orderkey%97 = 0 THEN 0
        |         ELSE o_orderkey%1048574 + 1 END AS h,
        |    o_orderkey%128 AS b,
        |    (o_orderkey * 2654435761) % 281474976710656 AS n
        |  FROM orders WHERE o_orderkey%43 = 7)
        |SELECT req_id,
        |  CASE WHEN m = 8 THEN 'invalid_length'
        |    WHEN m = 9 THEN 'invalid_char'
        |    WHEN m = 10 THEN 'overflow'
        |    WHEN h = 0 THEN 'reserved_handle'
        |    WHEN b >= 64 THEN 'bucket_out_of_range'
        |    ELSE 'ok' END AS verdict,
        |  CASE WHEN m < 8 AND h <> 0 AND b < 64 THEN t END
        |    AS timestamp_ms,
        |  CAST(CASE WHEN m < 8 AND h <> 0 AND b < 64 THEN h END AS INT)
        |    AS handle,
        |  CAST(CASE WHEN m < 8 AND h <> 0 AND b < 64 THEN b END AS INT)
        |    AS bucket,
        |  CASE WHEN m < 8 AND h <> 0 AND b < 64 THEN n END AS nonce
        |FROM o ORDER BY req_id""".stripMargin,
    "h2_crc_family" -> crcSql,

    "h3_blake3_kat" -> Blake3Kat.oracleSql,

    "cl1_clamps" ->
      """WITH reqs(requested) AS (VALUES (CAST(NULL AS BIGINT)), (0), (1), (23),
        |  (24), (25), (100), (101), (500), (1000), (5000)),
        |anons(anonymous) AS (VALUES (false), (true))
        |SELECT requested, anonymous,
        |  LEAST(GREATEST(COALESCE(requested, 50), 1),
        |        CASE WHEN anonymous THEN 100 ELSE 1000 END) AS listing_page,
        |  LEAST(GREATEST(COALESCE(requested, 25), 1), 100) AS search_page,
        |  LEAST(GREATEST(COALESCE(requested, 10), 1), 100) AS unified_page,
        |  LEAST(GREATEST(COALESCE(requested, 50), 1),
        |        CASE WHEN anonymous THEN 100 ELSE 1000 END) >= 24 AS estimate
        |FROM reqs CROSS JOIN anons
        |ORDER BY requested, anonymous""".stripMargin,

    "h1_multihash" ->
      """SELECT doc_id, md5(text) AS md5, sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "jl1_ingest_counts" ->
      """SELECT p AS predicate, COUNT(*) AS n FROM documents
        |CROSS JOIN (VALUES ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
        |                   ('http://schema.org/name'),
        |                   ('http://schema.org/contentSize')) t(p)
        |GROUP BY p ORDER BY p""".stripMargin
  )
}
