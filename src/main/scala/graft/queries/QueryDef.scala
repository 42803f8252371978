package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  /** FNV-1a over `tableFile`'s (name, length, mtime) under `dir`: the
    * build-once cache key for fingerprint-keyed artifacts (indexes,
    * mirrors) — tracks the source table CONTENT so a regenerated
    * testdata dir gets a fresh build instead of silently reusing a
    * stale one. Shared by every cache in this package (one definition;
    * a fix here reaches all of them). */
  private[queries] def sourceFingerprint(dir: String, tableFile: String): String = {
    val root = new java.io.File(dir, tableFile)
    val files = (if (root.isDirectory) Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
                 else Seq(root)).filter(_.isFile).sortBy(_.getName)
    var fp = 0xcbf29ce484222325L
    files.foreach { f =>
      s"${f.getName}:${f.length}:${f.lastModified}".foreach { ch =>
        fp = (fp ^ ch) * 0x100000001b3L
      }
    }
    java.lang.Long.toHexString(fp)
  }

  private[queries] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
