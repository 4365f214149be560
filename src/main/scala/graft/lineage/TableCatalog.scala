package graft.lineage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8

/** Storage seam for the output + metrics tables. The sandbox has no
  * Iceberg runtime jar, so the default is Parquet with an Iceberg-shaped
  * layout (append-only, partition column, directory pruning, snapshot
  * manifests); on a real cluster `IcebergCatalog` is the only class that
  * changes — the engine code is catalog-agnostic (SURVEY.md §7 hard
  * part (d)).
  */
trait TableCatalog {
  def append(df: DataFrame, table: String): Unit
  def appendPartitioned(df: DataFrame, table: String, partitionCol: String): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(spark: SparkSession, table: String): Boolean

  /** Committed snapshot ids, ascending — one per successful append. */
  def snapshots(spark: SparkSession, table: String): Seq[Long]

  /** Table contents as of `snapshotId` (inclusive) — Iceberg's
    * `VERSION AS OF` / `option("snapshot-id", ...)` time travel.
    * Fails on an id that was never committed.
    */
  def readAsOf(spark: SparkSession, table: String, snapshotId: Long): DataFrame
}

/** Parquet-backed default: `table` is a filesystem path.
  *
  * Snapshot emulation (the Iceberg seam made testable without the
  * runtime jar): every append commits a manifest under
  * `<table>/_graft_snapshots/snap-<id>` listing the data files that
  * append added (relative paths, one per line). `readAsOf(id)` reads the
  * union of files from manifests `<= id` with `basePath=<table>` so
  * partition columns survive. Underscore-prefixed paths are invisible to
  * Spark's parquet reader, so `read` (current view) is unaffected.
  *
  * Single-writer by design: the engine's driver is the only committer
  * (Lineage.runResumable fails fast on run_id reuse). Real Iceberg
  * replaces the before/after listing with optimistic metadata commits,
  * which is exactly why this stays behind the seam.
  */
object ParquetCatalog extends TableCatalog {
  private val SnapDir = "_graft_snapshots"

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Data files under the table root, as table-relative paths. Skips
    * the manifest dir and Spark's hidden/underscore side files.
    */
  private def listDataFiles(spark: SparkSession, table: String): Set[String] = {
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    if (!fs.exists(root)) return Set.empty
    val out = scala.collection.mutable.Set[String]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val status = it.next()
      val rel = root.toUri.relativize(status.getPath.toUri).toString
      val hidden = rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) out += rel
    }
    out.toSet
  }

  /** A rewrite manifest (compaction / expiry self-containment) starts
    * with this marker line and lists the table's FULL effective file
    * set; append manifests list only the files that commit added.
    */
  private val RewriteMarker = "#rewrite"

  private def manifestBody(spark: SparkSession, table: String, id: Long): String = {
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val in = fs.open(new Path(root, f"$SnapDir/snap-$id%09d"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** (isRewrite, files) of one manifest. */
  private def manifestEntry(spark: SparkSession, table: String,
      id: Long): (Boolean, Seq[String]) = {
    val lines = manifestBody(spark, table, id).split("\n").toSeq.filter(_.nonEmpty)
    if (lines.headOption.contains(RewriteMarker)) (true, lines.tail)
    else (false, lines)
  }

  private def manifestFiles(spark: SparkSession, table: String, id: Long): Seq[String] =
    manifestEntry(spark, table, id)._2

  /** The file set a snapshot reads: the latest rewrite at or before it
    * (full listing) plus every append delta after that rewrite.
    */
  private def effectiveFiles(spark: SparkSession, table: String, id: Long,
      ids: Seq[Long]): Seq[String] = {
    val entries = ids.filter(_ <= id)
      .map(i => i -> manifestEntry(spark, table, i))
    val lastRewrite = entries.collect { case (i, (true, _)) => i }
      .lastOption.getOrElse(Long.MinValue)
    entries.collect { case (i, (_, fs)) if i >= lastRewrite => fs }.flatten
  }

  /** The "before" set is the union of COMMITTED manifests, not a
    * directory listing: a crash between a parquet append and its
    * manifest write leaves orphan data files, and a listing-based diff
    * would exclude them from every future manifest — permanently
    * desynchronizing readAsOf(latest) from read(). Manifest-based
    * diffing instead attributes orphans to the NEXT successful commit
    * (the Iceberg retry semantics); until that commit, raw read() may
    * see orphan rows that readAsOf excludes, which is exactly the
    * crash-window contract Lineage.readCommitted already enforces at
    * the row level.
    */
  private def commitSnapshot(spark: SparkSession, table: String,
      rewrite: Boolean = false)(write: => Unit): Unit = {
    val ids = snapshots(spark, table)
    val before = ids.flatMap(id => manifestFiles(spark, table, id)).toSet
    write
    val added = (listDataFiles(spark, table) -- before).toSeq.sorted
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val snapId = ids.lastOption.getOrElse(0L) + 1
    fs.mkdirs(new Path(root, SnapDir))
    val body =
      if (rewrite) (RewriteMarker +: added).mkString("\n")
      else added.mkString("\n")
    val os = fs.create(new Path(root, f"$SnapDir/snap-$snapId%09d"), false)
    try os.write(body.getBytes(UTF_8)) finally os.close()
  }

  override def append(df: DataFrame, table: String): Unit =
    commitSnapshot(df.sparkSession, table) {
      df.write.mode(SaveMode.Append).parquet(table)
    }

  override def appendPartitioned(df: DataFrame, table: String, partitionCol: String): Unit =
    commitSnapshot(df.sparkSession, table) {
      df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(table)
    }

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)

  override def exists(spark: SparkSession, table: String): Boolean =
    try { spark.read.parquet(table).schema; true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }

  override def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val fs = fsFor(spark, new Path(table))
    val dir = fs.makeQualified(new Path(table, SnapDir))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("snap-") => n.stripPrefix("snap-").toLong }
      .sorted
  }

  override def readAsOf(spark: SparkSession, table: String, snapshotId: Long): DataFrame = {
    val ids = snapshots(spark, table)
    require(ids.contains(snapshotId),
      s"unknown snapshot $snapshotId for $table (committed: ${ids.mkString(", ")})")
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val files = effectiveFiles(spark, table, snapshotId, ids)
    if (files.isEmpty) read(spark, table).limit(0)
    else
      spark.read
        .option("basePath", root.toString)
        .parquet(files.map(f => new Path(root, f).toString): _*)
  }

  /** The latest committed view. After a [[compact]] this is the ONLY
    * correct current read — raw `read` lists the directory and would
    * double-count rows that exist in both pre- and post-compaction
    * files until [[expireSnapshots]] reclaims the old ones.
    */
  def readCurrent(spark: SparkSession, table: String): DataFrame =
    snapshots(spark, table).lastOption match {
      case Some(id) => readAsOf(spark, table, id)
      case None => read(spark, table)
    }

  /** Copy-on-write overwrite: commit `df` as the table's new current
    * view (a REWRITE snapshot referencing only the new files) — the
    * commit a catalog executes under MERGE INTO. `df` may read the
    * table's own current files (the merge case): the append-mode write
    * adds new files while the pinned readAsOf file list keeps reading
    * the old ones, and time travel to pre-merge snapshots keeps
    * working until [[expireSnapshots]].
    */
  def overwrite(df: DataFrame, table: String): Unit =
    commitSnapshot(df.sparkSession, table, rewrite = true) {
      df.write.mode(SaveMode.Append).parquet(table)
    }

  /** Small-file compaction (Iceberg's `rewrite_data_files`): rewrite
    * the current view into `targetFiles` files and commit a REWRITE
    * snapshot referencing only them. Old files stay on disk so time
    * travel to pre-compaction snapshots keeps working; they become
    * unreferenced garbage when [[expireSnapshots]] passes the rewrite.
    * The operational fix for the 100 TB small-file problem: a
    * streaming/resumable ingest commits thousands of KB-sized files
    * whose per-file open/footer costs dominate the next scan.
    */
  def compact(spark: SparkSession, table: String, targetFiles: Int,
      partitionCol: Option[String] = None): Unit = {
    require(targetFiles >= 1, s"targetFiles must be positive: $targetFiles")
    val ids = snapshots(spark, table)
    require(ids.nonEmpty, s"no committed snapshots to compact in $table")
    val current = readAsOf(spark, table, ids.last)
    commitSnapshot(spark, table, rewrite = true) {
      val w = current.repartition(targetFiles).write.mode(SaveMode.Append)
      partitionCol match {
        case Some(c) => w.partitionBy(c).parquet(table)
        case None => w.parquet(table)
      }
    }
  }

  /** Retention (Iceberg's `expire_snapshots`): keep the newest
    * `keepLast` snapshots, self-contain the oldest kept one (its
    * manifest becomes a rewrite listing its full effective file set,
    * so it no longer depends on expired manifests), delete expired
    * manifests and every data file no kept snapshot references.
    * readAsOf on an expired id fails fast afterwards.
    */
  def expireSnapshots(spark: SparkSession, table: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be positive: $keepLast")
    val ids = snapshots(spark, table)
    val expired = ids.dropRight(keepLast)
    if (expired.isEmpty) return
    val kept = ids.takeRight(keepLast)
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    // compute every kept view's file set BEFORE touching manifests
    val keptSets = kept.map(id => id -> effectiveFiles(spark, table, id, ids))
    val live = keptSets.flatMap(_._2).toSet
    // self-contain the oldest kept snapshot
    val (oldestKept, oldestFiles) = keptSets.head
    val os = fs.create(new Path(root, f"$SnapDir/snap-$oldestKept%09d"), true)
    try os.write((RewriteMarker +: oldestFiles.sorted).mkString("\n").getBytes(UTF_8))
    finally os.close()
    // drop expired manifests, then unreferenced data files
    expired.foreach(id =>
      fs.delete(new Path(root, f"$SnapDir/snap-$id%09d"), false))
    (listDataFiles(spark, table) -- live).foreach(rel =>
      fs.delete(new Path(root, rel), false))
  }

  // ---- write-audit-publish (Iceberg's WAP / branch commit) ----------
  //
  // stageAppend writes the data files plus a STAGED manifest
  // (stage-<n>) that snapshots() and every reader ignore — the write
  // is invisible until audited. publishStaged moves the manifest into
  // the snapshot chain (one atomic rename-equivalent commit);
  // abortStaged deletes the staged manifest AND its data files, as if
  // the write never happened. The audit step reads readStaged —
  // current view + the staged delta — and decides.

  private def stagedIds(spark: SparkSession, table: String): Seq[Long] = {
    val fs = fsFor(spark, new Path(table))
    val dir = fs.makeQualified(new Path(table, SnapDir))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("stage-") => n.stripPrefix("stage-").toLong }
      .sorted
  }

  private def stagedFiles(spark: SparkSession, table: String, stageId: Long): Seq[String] = {
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val in = fs.open(new Path(root, f"$SnapDir/stage-$stageId%09d"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      .split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
  }

  /** Stage `df` invisibly; returns the stage id for audit/publish. */
  def stageAppend(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val before = snapshots(spark, table)
      .flatMap(id => manifestFiles(spark, table, id)).toSet ++
      stagedIds(spark, table).flatMap(id => stagedFiles(spark, table, id))
    df.write.mode(SaveMode.Append).parquet(table)
    val added = (listDataFiles(spark, table) -- before).toSeq.sorted
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val stageId = (0L +: stagedIds(spark, table)).max + 1
    fs.mkdirs(new Path(root, SnapDir))
    val os = fs.create(new Path(root, f"$SnapDir/stage-$stageId%09d"), false)
    try os.write(added.mkString("\n").getBytes(UTF_8)) finally os.close()
    stageId
  }

  /** The audit view: current committed rows + the staged delta. */
  def readStaged(spark: SparkSession, table: String, stageId: Long): DataFrame = {
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val staged = spark.read.option("basePath", root.toString)
      .parquet(stagedFiles(spark, table, stageId)
        .map(f => new Path(root, f).toString): _*)
    snapshots(spark, table).lastOption match {
      case Some(id) => readAsOf(spark, table, id).unionByName(staged)
      case None => staged
    }
  }

  /** Commit the staged write as the next snapshot. */
  def publishStaged(spark: SparkSession, table: String, stageId: Long): Unit = {
    val files = stagedFiles(spark, table, stageId)
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    val snapId = snapshots(spark, table).lastOption.getOrElse(0L) + 1
    val os = fs.create(new Path(root, f"$SnapDir/snap-$snapId%09d"), false)
    try os.write(files.mkString("\n").getBytes(UTF_8)) finally os.close()
    fs.delete(new Path(root, f"$SnapDir/stage-$stageId%09d"), false)
    ()
  }

  /** Discard the staged write: its manifest and its data files. */
  def abortStaged(spark: SparkSession, table: String, stageId: Long): Unit = {
    val fs = fsFor(spark, new Path(table))
    val root = fs.makeQualified(new Path(table))
    stagedFiles(spark, table, stageId).foreach(rel =>
      fs.delete(new Path(root, rel), false))
    fs.delete(new Path(root, f"$SnapDir/stage-$stageId%09d"), false)
    ()
  }
}

/** Iceberg mapping (not constructible in this sandbox — no runtime jar):
  * `table` is a catalog identifier; appends become
  * `df.writeTo(table).append()`, reads `spark.table(table)`, snapshots
  * the `<table>.snapshots` metadata table, and `readAsOf` becomes
  * `spark.read.option("snapshot-id", id).table(table)`. The run_id
  * partition column maps to a hidden partition transform. Kept as the
  * documented swap point.
  */
// final class IcebergCatalog extends TableCatalog { ... }
