package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP autoindex directory-page parser (reference `blob/src/autoindex.rs`,
  * 932 LoC): turns nginx / Apache `<pre>` / Apache fancy-table HTML listings
  * into `(name, is_dir, size, modified)` entries. Driver-side fetch + a pure
  * parse function; caps per `autoindex.rs:17-19` (16 MiB page, 64 fetches per
  * recursive walk).
  */
object Autoindex {

  val MaxPageBytes: Int = 16 * 1024 * 1024
  val MaxFetches: Int = 64

  final case class Entry(name: String, isDir: Boolean, size: Option[Long],
      modified: Option[String])

  private val HrefRe = """(?i)<a\s+[^>]*href="([^"?]+)"[^>]*>([^<]*)</a>""".r
  private val DateRe =
    """(\d{2}-\w{3}-\d{4} \d{2}:\d{2}|\d{4}-\d{2}-\d{2} \d{2}:\d{2})""".r
  private val SizeRe = """(?<=\s)(\d+)(?=\s|$)""".r

  /** Parse a directory-index HTML page. Returns Nil when the page does not
    * look like an autoindex (the negative fixture case). */
  def parse(html: String): Seq[Entry] = {
    if (html == null || html.length > MaxPageBytes) return Nil
    val isIndex = html.contains("Index of") ||
      html.toLowerCase.contains("<pre") || html.toLowerCase.contains("parent directory")
    if (!isIndex) return Nil
    val entries = HrefRe.findAllMatchIn(html).flatMap { m =>
      val href = m.group(1)
      if (href.startsWith("/") || href.startsWith("../") || href == "." ||
        href.startsWith("http://") || href.startsWith("https://") || href.startsWith("#"))
        None
      else {
        val isDir = href.endsWith("/")
        val name = java.net.URLDecoder.decode(
          if (isDir) href.dropRight(1) else href, "UTF-8")
        // look in the trailing text after the anchor for "date  size"
        val tail = html.substring(m.end, math.min(html.length, m.end + 120))
        val modified = DateRe.findFirstIn(tail)
        val size =
          if (isDir) None
          else SizeRe.findFirstIn(tail.linesIterator.toSeq.headOption.getOrElse(""))
            .flatMap(s => scala.util.Try(s.toLong).toOption)
        Some(Entry(name, isDir, size, modified))
      }
    }.toSeq
    entries.distinct
  }

  /** Recursive walk over directory pages through a caller-supplied fetch,
    * enforcing the reference's 64-fetch cap (`autoindex.rs:17-19`). Returns
    * entries with paths relative to the root. */
  def walk(fetch: String => Option[String], root: String = ""): Seq[Entry] = {
    var fetches = 0
    def go(prefix: String): Seq[Entry] = {
      if (fetches >= MaxFetches) return Nil
      fetches += 1
      val page = fetch(prefix).getOrElse(return Nil)
      parse(page).flatMap { e =>
        val qualified = e.copy(name = if (prefix.isEmpty) e.name else s"$prefix${e.name}")
        if (e.isDir) qualified +: go(s"${qualified.name}/")
        else Seq(qualified)
      }
    }
    go(root)
  }

  /** entries → DataFrame (offset/limit + files_only per the reference op). */
  def toDf(spark: SparkSession, entries: Seq[Entry], filesOnly: Boolean = false,
      offset: Int = 0, limit: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val filtered = (if (filesOnly) entries.filterNot(_.isDir) else entries)
      .slice(offset, math.min(offset.toLong + limit, Int.MaxValue).toInt)
    filtered.map(e => (e.name, e.isDir, e.size, e.modified))
      .toDF("name", "is_dir", "size", "modified")
  }
}
