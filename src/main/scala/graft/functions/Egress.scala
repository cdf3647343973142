package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiled-in egress screening for tenant-supplied endpoints (reference
  * `core/src/egress.rs:16-171`): "the deny table is a constant: no realm
  * config, node config, or API input can remove an entry". Check order
  * (`EgressPolicy::check`, `:154-171`):
  *
  *  1. the node-local EXTRA deny list blocks first — even addresses the
  *     loopback toggle would otherwise admit (denies only add, the
  *     compiled table can never be reduced);
  *  2. a loopback destination passes only under the test-fixture policy;
  *  3. the 16-row IPv4 special-purpose table (0/8, 10/8, 100.64/10,
  *     127/8, 169.254/16, 172.16/12, 192.0.0/24, 192.0.2/24,
  *     192.88.99/24, 192.168/16, 198.18/15, 198.51.100/24,
  *     203.0.113/24, 224/4, 240/4, 255.255.255.255/32) blocks everything
  *     that is not a public unicast destination.
  *
  * The IPv6 table and v4-mapped normalization are transport-layer
  * concerns of the HTTP stack (BASELINE.json byte-transport exclusion);
  * the v4 policy semantics are what storage-routing consumers screen.
  *
  * Scale: a 16-row broadcast range join — pure integer prefix math,
  * whole-stage codegen. */
object Egress {

  /** (network u32, prefix len) rows of DENIED_V4 (egress.rs:17-34). */
  val DeniedV4: Seq[(Long, Int)] = Seq(
    (0L, 8), (167772160L, 8), (1681915904L, 10), (2130706432L, 8),
    (2851995648L, 16), (2886729728L, 12), (3221225472L, 24),
    (3221225984L, 24), (3227017984L, 24), (3232235520L, 16),
    (3323068416L, 15), (3325256704L, 24), (3405803776L, 24),
    (3758096384L, 4), (4026531840L, 4), (4294967295L, 32))

  private def inNet(ip: Column, net: Long, prefix: Int): Column =
    if (prefix == 0) lit(true)
    else shiftrightunsigned(ip, 32 - prefix) === (net >>> (32 - prefix))

  /** `addrs(sect, ip, ip_str, loopback_ok_policy)` — `ip` as an unsigned
    * 32-bit value in a LONG; `extraDeny` as (net, prefix) rows. Returns
    * `(sect, ip_str, verdict)` with verdict ∈ blocked_extra |
    * loopback_ok | blocked_table | allowed. */
  def screenV4(addrs: DataFrame, extraDeny: Seq[(Long, Int)]): DataFrame = {
    val extraHit = extraDeny
      .map { case (n, p) => inNet(col("ip"), n, p) }
      .foldLeft(lit(false))(_ || _)
    val tableHit = DeniedV4
      .map { case (n, p) => inNet(col("ip"), n, p) }
      .foldLeft(lit(false))(_ || _)
    val isLoopback = inNet(col("ip"), 2130706432L, 8)
    addrs.select(col("sect"), col("ip_str"),
      when(extraHit, "blocked_extra")
        .when(col("loopback_ok_policy") && isLoopback, "loopback_ok")
        .when(tableHit, "blocked_table")
        .otherwise("allowed").as("verdict"))
  }
}
