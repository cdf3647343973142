package graft.cache

/** Keyed query-result cache (reference `operations/src/metadata/query_cache.rs`):
  * key = digest of (visibility-scope digest, query text); entries carry a
  * generation stamp so racing mutations invalidate stale results; TTL 30 s,
  * max 512 entries, 32 MiB total (`query_cache.rs:16-19`).
  *
  * Spark's `df.cache()` is not keyed, so this is a driver-side LRU over
  * collected results — appropriate for the reference's small capped result
  * sets (≤10k rows / 8 MiB each).
  */
final class QueryCache[V](
    ttlMillis: Long = 30000L,
    maxEntries: Int = 512,
    maxBytes: Long = 32L * 1024 * 1024,
    clock: () => Long = System.currentTimeMillis _,
    sizeOf: V => Long = (_: V) => 1024L) {

  private case class Entry(value: V, generation: Long, at: Long, bytes: Long)

  private val map = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var totalBytes = 0L

  def key(scopeDigest: String, query: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    // length-prefixed fields (query_cache.rs:28-32)
    Seq(scopeDigest, query).foreach { s =>
      val b = s.getBytes("UTF-8")
      md.update(java.nio.ByteBuffer.allocate(8).putLong(b.length.toLong).array())
      md.update(b)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Returns the cached value only when fresh AND its generation matches the
    * store's current generation (stamp invalidation, `handle.rs:4787-4800`). */
  def get(k: String, currentGeneration: Long): Option[V] = synchronized {
    Option(map.get(k)) match {
      case Some(e) if clock() - e.at <= ttlMillis && e.generation == currentGeneration =>
        Some(e.value)
      case Some(_) =>
        remove(k)
        None
      case None => None
    }
  }

  def put(k: String, v: V, generation: Long): Unit = synchronized {
    remove(k)
    val bytes = sizeOf(v)
    if (bytes > maxBytes) return // single oversized result is never cached
    map.put(k, Entry(v, generation, clock(), bytes))
    totalBytes += bytes
    // evict least-recently-used until within caps
    val it = map.entrySet().iterator()
    while ((map.size() > maxEntries || totalBytes > maxBytes) && it.hasNext) {
      val e = it.next()
      totalBytes -= e.getValue.bytes
      it.remove()
    }
  }

  private def remove(k: String): Unit =
    Option(map.remove(k)).foreach(e => totalBytes -= e.bytes)

  def size: Int = synchronized(map.size())
  def bytes: Long = synchronized(totalBytes)
}
