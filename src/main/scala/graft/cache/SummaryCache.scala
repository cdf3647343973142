package graft.cache

/** Metadata summary cache (reference
  * `operations/src/metadata/summary_cache.rs:33-110`): RO-Crate summary
  * strings keyed by `(graph_iri, cursor)` where the cursor is the document's
  * `last_event_id`. Contract pinned by the qc2 gate:
  *
  *  - ONE summary per graph (`summary_cache.rs:63-65`): an insert under a new
  *    cursor supersedes the graph's old entry, so a cursor advance both
  *    misses and frees the stale summary;
  *  - a get whose cursor differs from the stored one misses WITHOUT evicting
  *    (the replicated registry cursor can lead local graph content);
  *  - TTL backstop (30 s, `SUMMARY_CACHE_TTL`) — an expired entry is evicted
  *    on read;
  *  - `remove(graphIri)` — document sync invalidates by graph;
  *  - LRU + byte cap (2048 entries / 32 MiB, 16 KiB-average summaries,
  *    `summary_cache.rs:11-12`); an entry larger than the whole byte budget
  *    is never cached.
  *
  * Driver-side by design, like [[QueryCache]]: summaries are small capped
  * strings, and the reference holds them in per-node process memory — the
  * distributed story is that each executor-side cache is independent and the
  * TTL bounds cross-node staleness.
  */
final class SummaryCache(
    ttlMillis: Long = 30000L,
    maxEntries: Int = 2048,
    maxBytes: Long = 32L * 1024 * 1024,
    clock: () => Long = System.currentTimeMillis _) {

  private case class Entry(cursor: String, summary: String, at: Long, bytes: Long)

  // access-ordered: iteration order is LRU-first, like the reference's LruCache
  private val map = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var totalBytes = 0L

  private def entrySize(graphIri: String, summary: String): Long =
    graphIri.getBytes("UTF-8").length.toLong + summary.getBytes("UTF-8").length

  /** Fresh summary iff the graph has an unexpired entry under this exact
    * cursor. Expired entries are evicted; cursor mismatches are not (the
    * entry may still serve the lagging reader). */
  def get(graphIri: String, cursor: String): Option[String] = synchronized {
    Option(map.get(graphIri)) match {
      case Some(e) if clock() - e.at > ttlMillis =>
        removeEntry(graphIri); None
      case Some(e) if e.cursor == cursor => Some(e.summary)
      case _ => None
    }
  }

  def insert(graphIri: String, cursor: String, summary: String): Unit = synchronized {
    val bytes = entrySize(graphIri, summary)
    if (bytes > maxBytes) return // summary_cache.rs:79-81
    removeEntry(graphIri) // one summary per graph: supersede
    map.put(graphIri, Entry(cursor, summary, clock(), bytes))
    totalBytes += bytes
    val it = map.entrySet().iterator()
    while ((map.size() > maxEntries || totalBytes > maxBytes) && it.hasNext) {
      val e = it.next()
      totalBytes -= e.getValue.bytes
      it.remove()
    }
  }

  /** Document sync invalidation (`summary_cache.rs:105-110`). */
  def remove(graphIri: String): Unit = synchronized(removeEntry(graphIri))

  private def removeEntry(graphIri: String): Unit =
    Option(map.remove(graphIri)).foreach(e => totalBytes -= e.bytes)

  def size: Int = synchronized(map.size())
  def bytes: Long = synchronized(totalBytes)
}
