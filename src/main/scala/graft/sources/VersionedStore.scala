package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** VERSIONED PARQUET STORE with snapshot isolation and time travel —
  * the manifest pattern the public lakehouse formats (Iceberg, Delta)
  * are built on, reduced to its load-bearing core:
  *
  *   data/v<N>/part-*.parquet   immutable — a commit only ever ADDS a
  *                              directory, never rewrites or deletes
  *   manifest-v<N>.txt          the snapshot: `op append|overwrite` on
  *                              line 1, then one data-file path per
  *                              line (relative to the store root)
  *   _latest                    pointer file holding N, written LAST —
  *                              the commit point
  *
  * Why this gives snapshot isolation: a reader resolves `_latest` (or
  * an explicit version) to ONE manifest and reads exactly the files it
  * lists. A writer crashing after the data write but before `_latest`
  * leaves an orphan directory no manifest references — invisible
  * garbage, not a torn snapshot. An overwrite commit lists only its own
  * files; an append commit lists the parent snapshot's files plus its
  * own, so old snapshots remain readable forever (time travel) until a
  * retention job prunes unreferenced directories.
  *
  * Contract: ONE writer at a time (the nightly-job discipline shared
  * with the KMV/IVF stores); readers are unlimited and never block.
  *
  * Scale (100 TB): the manifest carries file PATHS, not data — O(files)
  * text. Readers plan a scan over exactly the listed files (no
  * directory listing of the whole store), so query cost tracks the
  * snapshot's size, not the store's full history. */
object VersionedStore {

  private def fsFor(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeText(fs: FileSystem, p: Path, text: String): Unit = {
    val o = fs.create(p, true)
    try o.write(text.getBytes(StandardCharsets.UTF_8)) finally o.close()
  }

  /** Latest committed version; 0 if the store is empty/uninitialized. */
  def latestVersion(s: SparkSession, root: String): Int = {
    val fs = fsFor(s, root)
    val p = new Path(root, "_latest")
    if (fs.exists(p)) readText(fs, p).trim.toInt else 0
  }

  private def manifest(s: SparkSession, root: String,
                       v: Int): (String, Seq[String]) = {
    val fs = fsFor(s, root)
    val p = new Path(root, s"manifest-v$v.txt")
    require(fs.exists(p), s"store $root has no committed version $v")
    val lines = readText(fs, p).split("\n").filter(_.nonEmpty).toSeq
    val op = lines.head.stripPrefix("op ")
    (op, lines.tail)
  }

  /** Commit `df` as the next snapshot. `overwrite = false` appends to
    * the parent snapshot's file set; `true` replaces it. Returns the
    * new version number. */
  def commit(df: DataFrame, root: String, overwrite: Boolean): Int = {
    val s = df.sparkSession
    val fs = fsFor(s, root)
    val v = latestVersion(s, root) + 1
    val dataDir = s"data/v$v"
    // mode("error"): the data directory for a version is write-once;
    // colliding with an orphan from a crashed attempt at the SAME
    // version should fail loudly rather than mix files
    df.write.mode("error").parquet(s"$root/$dataDir")
    val newFiles = fs.listStatus(new Path(root, dataDir))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(st => s"$dataDir/${st.getPath.getName}")
      .sorted.toSeq
    val base =
      if (overwrite || v == 1) Seq.empty
      else manifest(s, root, v - 1)._2
    val op = if (overwrite) "overwrite" else "append"
    writeText(fs, new Path(root, s"manifest-v$v.txt"),
      (s"op $op" +: (base ++ newFiles)).mkString("\n"))
    // the commit point: readers see v only after this write
    writeText(fs, new Path(root, "_latest"), v.toString)
    v
  }

  /** Read a snapshot: the given version, or the latest when < 0. Plans
    * a scan over exactly the manifest's files. */
  def read(s: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(s, root) else version
    val files = manifest(s, root, v)._2.map(f => s"$root/$f")
    require(files.nonEmpty, s"version $v of $root lists no files")
    s.read.parquet(files: _*)
  }

  /** History: (version, op, n_files) for every committed snapshot. */
  def versions(s: SparkSession, root: String): Seq[(Int, String, Int)] =
    (1 to latestVersion(s, root)).map { v =>
      val (op, files) = manifest(s, root, v)
      (v, op, files.length)
    }
}
