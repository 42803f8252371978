package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic versioned on-disk index with single-file atomic commit —
  * the persistence contract shared by the LSH near-dup index and the
  * IVF ANN index (and any future multi-table index artifact):
  *
  * {{{
  *   <path>/v=N/<table>/…            one parquet dir per member table
  *   <path>/v=N/params               key=value lines, written pre-marker
  *   <path>/v=N/_GRAFT_COMMITTED     the commit point — created LAST
  * }}}
  *
  * The current index is the HIGHEST committed version. All member
  * tables plus the params become visible atomically when the marker
  * file is created; live data is never renamed or deleted before the
  * replacement commits, so:
  *  - a crash anywhere pre-marker leaves the previous version current
  *    and fully readable (no "nothing at dest" window);
  *  - readers can never observe member tables from two different
  *    states (the mixed shingles/bands failure class);
  *  - uncommitted `v=` orphans are swept by the next writer, and
  *    superseded versions are swept only AFTER the new commit.
  * Every FileSystem mutation checks its boolean return and throws —
  * HDFS reports rename/delete failure by returning false, not by
  * exception.
  */
object VersionedIndex {

  val CommitMarker = "_GRAFT_COMMITTED"
  val ParamsFile = "params"

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** (version, committed?) pairs, ascending. */
  def versions(fs: FileSystem, root: Path): Seq[(Int, Boolean)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .flatMap { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("v=").toInt).toOption
          .map(v => v -> fs.exists(new Path(st.getPath, CommitMarker)))
      }.sortBy(_._1)

  /** Directory of the current committed version, if any. */
  def currentDir(spark: SparkSession, path: String): Option[String] = {
    val (fs, root) = fsFor(spark, path)
    versions(fs, root).filter(_._2).lastOption.map { case (v, _) => s"$path/v=$v" }
  }

  def readParams(spark: SparkSession, dir: String): Map[String, String] = {
    val (fs, _) = fsFor(spark, dir)
    val p = new Path(dir, ParamsFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.linesIterator.filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2); k -> v.trim
      }.toMap
    }
  }

  /** Fail fast when the caller's parameters disagree with the ones the
    * index was built with (only keys present in the stored params are
    * compared — legacy indexes without params pass). */
  def requireParams(spark: SparkSession, dir: String,
      expected: Map[String, String]): Unit = {
    val stored = readParams(spark, dir)
    expected.foreach { case (k, v) =>
      stored.get(k).foreach(s => require(s == v,
        s"index at $dir was written with $k=$s; got $k=$v"))
    }
  }

  /** Stage member tables + params as version current+1, then commit
    * with the marker. `tables` may READ the current version — nothing
    * is overwritten in place. `partitionBy` applies per table when
    * non-empty. `legacySweep` names top-level dirs from a pre-version
    * layout to remove after the first successful commit. */
  def commit(spark: SparkSession, path: String,
      tables: Seq[(String, DataFrame)], params: Map[String, String],
      partitionBy: Map[String, Seq[String]] = Map.empty,
      legacySweep: Seq[String] = Seq.empty): Unit = {
    val (fs, root) = fsFor(spark, path)
    val vs = versions(fs, root)
    val cur = vs.filter(_._2).lastOption.map(_._1).getOrElse(0)
    vs.filter { case (v, committed) => v > cur && !committed }.foreach {
      case (v, _) =>
        val d = new Path(root, s"v=$v")
        require(fs.delete(d, true), s"failed to sweep orphaned $d")
    }
    val vdir = new Path(root, s"v=${cur + 1}")
    tables.foreach { case (name, df) =>
      val w = df.write
      partitionBy.get(name).filter(_.nonEmpty).fold(w)(cols =>
        w.partitionBy(cols: _*))
        .parquet(new Path(vdir, name).toString)
    }
    val out = fs.create(new Path(vdir, ParamsFile), true)
    try out.write(params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v\n" }.mkString.getBytes("UTF-8"))
    finally out.close()
    require(fs.createNewFile(new Path(vdir, CommitMarker)),
      s"failed to commit $vdir (marker already exists?)")
    // committed — sweep superseded versions and any legacy layout
    vs.filter { case (v, committed) => v <= cur && committed }.foreach {
      case (v, _) =>
        val d = new Path(root, s"v=$v")
        require(fs.delete(d, true), s"failed to sweep superseded $d")
    }
    legacySweep.foreach { name =>
      val d = new Path(root, name)
      if (fs.exists(d)) require(fs.delete(d, true), s"failed to sweep legacy $d")
    }
  }
}
