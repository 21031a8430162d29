package graft.text

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.LakeTable

/** Freshness contract for standing indexes ([[InvertedIndex]],
  * [[IvfIndex]]): when an index is built from a versioned lake table, the
  * base's commit version is stamped into the index directory, and every
  * serve call compares the stamp against the base's CURRENT version —
  * serving after the corpus mutated would silently return stale rankings
  * (ghost hits for deleted documents, missing hits for new ones), the
  * classic production bug of a search index whose corpus stopped being
  * static. Indexes built from a raw DataFrame (an unversioned corpus)
  * carry no stamp and serve unchecked — there is nothing to compare to.
  *
  * The stamp is one tiny text file (`_graft_index_base`): base path +
  * version, written last in a build and advanced by each incremental
  * maintenance pass ([[InvertedIndex.applyChanges]] /
  * [[IvfIndex.applyChanges]]).
  */
private[text] object IndexMeta {

  val FileName = "_graft_index_base"

  final case class Stamp(basePath: String, version: Long)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def stamp(spark: SparkSession, dir: String, base: LakeTable): Unit =
    stamp(spark, dir, base.path, base.currentVersion)

  def stamp(spark: SparkSession, dir: String, basePath: String, version: Long): Unit =
    // atomic (LakeIo): every serve's freshness check reads this file
    // while the maintenance stream rewrites it — a torn read here would
    // fail a concurrent serve for no reason
    graft.sources.LakeIo.atomicOverwrite(
      fs(spark, dir), new Path(dir, FileName), s"$basePath\n$version")

  def read(spark: SparkSession, dir: String): Option[Stamp] = {
    val f = fs(spark, dir)
    val p = new Path(dir, FileName)
    // resilient: every serve's freshness check reads this while the
    // maintenance stream republishes it — transient absence/checksum
    // blips from the overwrite rename must not fail a serve
    graft.sources.LakeIo.resilientRead(f, p).flatMap { text =>
      text.split("\n", -1).toSeq match {
        case Seq(base, v, _*) if v.trim.nonEmpty => Some(Stamp(base, v.trim.toLong))
        case _                                   => None
      }
    }
  }

  /** Throw if the index at `dir` was stamped against a base that has
    * since committed — the loud-failure side of the freshness contract.
    * Unstamped indexes pass (unversioned corpus: nothing enforceable).
    */
  def requireFresh(spark: SparkSession, dir: String, what: String): Unit =
    read(spark, dir).foreach { s =>
      val cur = LakeTable(spark, s.basePath).currentVersion
      if (cur != s.version) throw new IllegalStateException(
        s"$what at $dir is STALE: built at base version ${s.version} of " +
          s"${s.basePath}, which is now at version $cur — run applyChanges " +
          "to fold the base's change feed into the index (or rebuild)")
    }

  /** The stamp an incremental maintenance pass starts from; refuses to
    * run against a different base than the one the index was built on.
    */
  def forMaintenance(spark: SparkSession, dir: String, base: LakeTable,
      what: String): Stamp = {
    val s = read(spark, dir).getOrElse(throw new IllegalStateException(
      s"$what at $dir carries no base stamp — it was built from a raw " +
        "DataFrame; incremental maintenance needs a versioned base " +
        "(rebuild with the LakeTable overload)"))
    require(s.basePath == base.path,
      s"$what at $dir was built from ${s.basePath}, not ${base.path}")
    s
  }



  /** Commits that reorganize bytes or metadata but provably leave every
    * row's content unchanged — the only ops allowed to appear in a
    * maintenance range WITHOUT a recorded change set.
    */
  private val ContentPreservingOps = Set(
    "OPTIMIZE", "OPTIMIZE WHERE", "OPTIMIZE ZORDER", "OPTIMIZE HILBERT",
    "COMPACT", "COMPACT SMALL", "VACUUM", "VACUUM CHANGES", "VACUUM DEBRIS",
    "COLLECT STATS", "ADD CONSTRAINT", "DROP CONSTRAINT")

  /** Resolve the base's change feed over `(fromExclusive, to]` into the
    * two frames an incremental index pass needs: `removals` — the image
    * each affected key had WHEN THE INDEX LAST SAW IT (the first
    * pre-image/delete row per key: exactly what must leave the index) —
    * and `additions` — each affected key's final image (absent if the key
    * ended the range deleted). Intermediate images a key passed through
    * inside the range cancel and never touch the index.
    *
    * Throws when a content-changing commit in the range recorded no
    * change set: that mutation is invisible to the feed, and folding the
    * rest while re-stamping would certify a wrong index as fresh.
    */
  def resolveImages(
      base: LakeTable, fromExclusive: Long, to: Long,
      idCol: String, valueCols: Seq[String]): (DataFrame, DataFrame) = {
    val spark = base.read.sparkSession
    val f = fs(spark, base.path)
    val changesDir = new Path(base.path, LakeTable.ChangesDirName)
    val feedVersions: Set[Long] =
      if (!f.exists(changesDir)) Set.empty
      else f.listStatus(changesDir).toSeq
        .map(_.getPath.getName)
        .filter(_.matches("v\\d+"))
        .map(_.stripPrefix("v").toLong)
        .filter(v => v > fromExclusive && v <= to)
        .toSet
    // audit the whole range BEFORE reading any change rows
    val silent = base.history
      .where(col("version") > fromExclusive && col("version") <= to)
      .select(col("version"), col("operation"))
      .collect()
      .filter(r => !feedVersions.contains(r.getLong(0)))
      .filterNot(r => ContentPreservingOps.contains(r.getString(1)))
      .filterNot(r => r.getString(1).startsWith("RECOVERED "))
    if (silent.nonEmpty) throw new IllegalStateException(
      s"cannot maintain the index incrementally: commit(s) " +
        silent.map(r => s"v${r.getLong(0)} ${r.getString(1)}").mkString(", ") +
        s" at ${base.path} recorded no change feed — mutate the base with " +
        "changeFeed = true, or rebuild the index")
    val out = Seq(col(idCol).as("doc_id")) ++ valueCols.map(col)
    if (feedVersions.isEmpty) {
      val empty = base.read.select(out: _*).where(lit(false))
      return (empty, empty)
    }
    val changes = base.readChanges(fromExclusive + 1, to)
    // within one commit an update records pre- then post-image: rank pre
    // with deletes so "first event" sees the pre-change image and "last
    // event" the post-change one
    val tr = when(col("_change_type").isin("update_preimage", "delete"), lit(0))
      .otherwise(lit(1))
    val marked = changes
      .withColumn("__first", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("_commit_version").asc, tr.asc)))
      .withColumn("__last", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("_commit_version").desc, tr.desc)))
    val removals = marked
      .where(col("__first") === 1 &&
        col("_change_type").isin("update_preimage", "delete"))
      .select(out: _*)
    val additions = marked
      .where(col("__last") === 1 &&
        col("_change_type").isin("insert", "update_postimage"))
      .select(out: _*)
    (removals, additions)
  }
}
