package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Shared small-file compaction machinery (the filesystem-level OPTIMIZE
  * used by [[EventStore.compact]] for `doc_type=/date=` partitions and
  * [[graft.similarity.VectorIndex.compactCells]] for `cell=` partitions):
  * the selection rule, the dot-prefixed tmp/old two-rename atomic swap, and
  * the crash-recovery sweep. Every incremental/streaming writer in the
  * engine appends files per batch per partition, so any long-lived
  * partitioned dataset eventually needs exactly this pass — one
  * implementation, audited once.
  */
object Compaction {

  /** A partition earns a rewrite when it has too many files or its average
    * file is under half the target (the "many dribbles" signature of an
    * incremental writer; a closed partition is compacted once and then
    * never selected again).
    */
  def needsWork(nFiles: Long, bytes: Long, targetFileBytes: Long,
      maxFilesPerPartition: Int): Boolean =
    nFiles > maxFilesPerPartition ||
      (nFiles > 1 && bytes / nFiles < targetFileBytes / 2)

  /** Rewrite one partition directory to `ceil(bytes/target)` files and swap
    * it in with two renames. The work dirs are DOT-PREFIXED siblings —
    * invisible to Hive partition discovery, so a concurrent read sees
    * either the old or the new contents, never both and never an
    * unparseable partition value. Single-writer maintenance op; a crash
    * between the renames is healed by [[recover]]. Returns files-after.
    *
    * The rewrite read uses mergeSchema: a partition may legitimately hold
    * files with different column sets (the store's read() merges footers),
    * and sampling a single footer would silently drop columns.
    */
  def swapRewrite(spark: SparkSession, dir: Path, bytes: Long,
      targetFileBytes: Long): Int = {
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(dir.getParent, s".compact_tmp_${dir.getName}")
    val old = new Path(dir.getParent, s".compact_old_${dir.getName}")
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.option("mergeSchema", "true").parquet(dir.toString)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(dir, old), s"compact: could not move $dir aside")
    require(fs.rename(tmp, dir), s"compact: could not publish $tmp")
    fs.delete(old, true)
    nOut
  }

  /** Heal partitions stranded by a crashed swap, under each given parent
    * directory. For every `.compact_old_<part>`: if `<part>` is back in
    * place the publish finished and only the delete was lost — drop the
    * stray; otherwise the crash hit between the renames — rename the
    * original back. Leftover `.compact_tmp_*` dirs are always incomplete
    * output (a completed publish renames them away) and are deleted.
    */
  def recover(parents: Seq[Path], hadoopConf: Configuration): Unit =
    for {
      parent <- parents
      fs = parent.getFileSystem(hadoopConf)
      if fs.exists(parent)
      child <- fs.listStatus(parent).toSeq if child.isDirectory
      name = child.getPath.getName
    } {
      if (name.startsWith(".compact_old_")) {
        val dest = new Path(parent, name.stripPrefix(".compact_old_"))
        if (fs.exists(dest)) fs.delete(child.getPath, true)
        else require(fs.rename(child.getPath, dest),
          s"compact recovery: could not restore ${child.getPath} to $dest")
      } else if (name.startsWith(".compact_tmp_")) {
        fs.delete(child.getPath, true)
      }
    }
}
