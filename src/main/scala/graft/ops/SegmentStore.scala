package graft.ops

import scala.jdk.CollectionConverters._

/** The crash-safe commit protocol shared by the persisted index
  * layouts ([[Bm25Index]], [[BandIndex]]): versioned directories with a
  * single `_COMMITTED` commit point per version, and commit-marked
  * delta SEGMENTS inside a version. Extracted verbatim from the BM25
  * layout (whose spec pins every crash window) so a new index family
  * inherits the proven protocol instead of re-implementing it:
  *
  *   - every multi-side write inside a version is one SEGMENT: all rows
  *     carry their segment id, readers filter to `seg IN (committed)`,
  *     and the empty `.commit` marker file is created LAST (atomic
  *     `createFile`) — a crash at any earlier point strands invisible
  *     rows, and the `.pending` marker (created FIRST) burns the id so
  *     a retry can never adopt the strandings at its own commit;
  *   - a COMPACT/rewrite lands complete in `v<N+1>/` before its single
  *     `_COMMITTED` marker; readers always resolve the highest
  *     committed version, so a crashed rewrite strands only an
  *     invisible partial version (cleared by the next compact).
  */
private[ops] object SegmentStore {

  private val VerRe = "v(\\d+)".r

  def deleteTree(p: java.nio.file.Path): Unit = {
    val w = java.nio.file.Files.walk(p)
    try w.iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    finally w.close()
  }

  def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!java.nio.file.Files.isDirectory(p)) Nil
    else {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.toSeq finally s.close()
    }

  /** All version numbers present under `dir` with their commit state. */
  def versions(dir: String): Seq[(Long, Boolean)] =
    listDir(java.nio.file.Paths.get(dir)).flatMap { p =>
      p.getFileName.toString match {
        case VerRe(n) => Some((n.toLong,
          java.nio.file.Files.exists(p.resolve("_COMMITTED"))))
        case _ => None
      }
    }

  /** The serving version root — highest `_COMMITTED` version. Every
    * read/maintenance path resolves through this one function, so a
    * crashed compact (stranded uncommitted `v<N+1>`) is invisible
    * everywhere by construction.
    */
  def currentVersionDir(dir: String, what: String): String = {
    val committed = versions(dir).collect { case (n, true) => n }
    require(committed.nonEmpty,
      s"no committed $what at $dir (missing or never built)")
    s"$dir/v${committed.max}"
  }

  /** Committed segment ids in a version root (markers, not a scan). */
  def committedSegs(ver: String): Seq[Long] =
    listDir(java.nio.file.Paths.get(s"$ver/commits")).flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".commit")) Some(n.stripSuffix(".commit").toLong)
      else None
    }

  /** All BURNED segment ids (pending or committed) — the next writer
    * must skip these even when uncommitted, or it would adopt a crashed
    * writer's stranded rows at its own commit.
    */
  def burnedSegs(ver: String): Seq[Long] =
    listDir(java.nio.file.Paths.get(s"$ver/commits")).flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".commit")) Some(n.stripSuffix(".commit").toLong)
      else if (n.endsWith(".pending")) Some(n.stripSuffix(".pending").toLong)
      else None
    }

  /** Claim the next segment id (atomic `.pending` marker first). */
  def claimSeg(ver: String): Long = {
    val seg = burnedSegs(ver).max + 1
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      s"$ver/commits/$seg.pending"))
    seg
  }

  def commitSeg(ver: String, seg: Long): Unit =
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      s"$ver/commits/$seg.commit"))

  /** Initialize a fresh version root with segment 0 claimed: creates
    * `<ver>/commits/0.pending` (the caller writes the build's sides,
    * then `commitSeg(ver, 0)` and — for v0 — the `_COMMITTED` marker).
    * Clears any previous tree at the path first.
    */
  def initVersion(ver: String): Unit = {
    val vp = java.nio.file.Paths.get(ver)
    if (java.nio.file.Files.isDirectory(vp)) deleteTree(vp)
    java.nio.file.Files.createDirectories(vp.resolve("commits"))
    java.nio.file.Files.createFile(vp.resolve("commits").resolve("0.pending"))
  }

  def markCommitted(ver: String): Unit =
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(ver).resolve("_COMMITTED"))

  /** Clear stranded UNCOMMITTED versions (a prior crashed compact),
    * returning after the sweep — run BEFORE picking a rewrite target so
    * the write cannot collide.
    */
  def clearUncommitted(dir: String): Unit =
    versions(dir).collect { case (n, false) => n }.foreach { n =>
      deleteTree(java.nio.file.Paths.get(s"$dir/v$n"))
    }

  /** Retire every committed version except `keep`. */
  def retireOthers(dir: String, keep: String): Unit =
    versions(dir).collect { case (n, true) => n }
      .filter(v => s"$dir/v$v" != keep)
      .foreach(n => deleteTree(java.nio.file.Paths.get(s"$dir/v$n")))
}
