package graft.operators

import java.io.File

/** Build-once lifecycle for persisted index artifacts (the minhash and
  * IVF indexes of ext/Dedup.scala and ext/SimSearch.scala).
  *
  * Two production hazards this closes (round-6 advisor findings):
  *
  *  1. ATOMIC COMMIT. An index is only valid once every table under its
  *     directory is complete, but a multi-step build (write base index,
  *     then append a delta) can crash between steps. If the presence
  *     marker (`params/`) lands before the last step, every later run
  *     sees a "complete" index that is silently missing rows and
  *     diverges from the oracle until tmp is cleaned by hand. The fix is
  *     the standard staging-directory commit: the WHOLE build — however
  *     many steps — runs inside `<path>.staging-<nonce>`, and only a
  *     fully built tree is renamed into place. The rename is a
  *     same-filesystem directory move (atomic on POSIX), so readers see
  *     either no index or a whole one, never a partial.
  *
  *  2. CONTENT KEYING. A cache path derived from the DATA DIRECTORY
  *     string alone outlives the data: regenerate the dataset in place
  *     (or collide two dirs on String.hashCode) and later runs probe a
  *     stale index with no error. [[fingerprint]] folds the source
  *     files' names, sizes, and mtimes into the path, so regenerated
  *     inputs get a fresh index automatically. Metadata-only — no data
  *     is read, so it stays O(#files) however large the table is (at
  *     100 TB a content hash of the data would itself be a full scan;
  *     name+size+mtime is the same freshness contract object stores and
  *     build systems use).
  */
object IndexStore {

  /** Cheap content fingerprint of one or more table paths (files or
    * directories, RECURSIVE — a partitioned parquet layout's data files
    * live under `col=value/` subdirectories and must all contribute):
    * 16 hex chars of md5 over the sorted `relpath:size:mtime` lines of
    * every data file. Hidden and `_*` entries (parquet `_SUCCESS`,
    * checksums) are skipped so a rewrite that produces identical data
    * files with new commit markers still changes mtimes — which is
    * exactly the conservative direction. A path with NO data files
    * (missing, empty, or marker-only) is an error: returning a
    * constant md5("") would silently collide every such dataset onto
    * one cache key — the stale-index hazard this function exists to
    * close.
    */
  def fingerprint(paths: String*): String = {
    def walk(f: File, rel: String): Seq[String] =
      if (f.getName.startsWith(".") || f.getName.startsWith("_")) Seq.empty
      else if (f.isFile) Seq(s"$rel:${f.length}:${f.lastModified}")
      else if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .flatMap(c => walk(c, s"$rel/${c.getName}"))
      else Seq.empty
    val lines = paths.flatMap { p =>
      val f = new File(p)
      if (f.isFile) Seq(s"${f.getName}:${f.length}:${f.lastModified}")
      else walk(f, f.getName)
    }.sorted
    require(lines.nonEmpty,
      s"no data files under ${paths.mkString(", ")} — refusing a constant fingerprint")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(lines.mkString("\n").getBytes("UTF-8"))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  /** Ensure a committed index exists at `path`, building it at most once.
    *
    * `build` receives a STAGING path and must write the complete index
    * there (any number of steps — build + append is fine). On return the
    * staging tree is atomically renamed to `path`. If a concurrent run
    * committed first, our staging tree is discarded and theirs wins —
    * both were built from the same inputs, so either is valid.
    *
    * `marker` is the subpath whose existence certifies a committed
    * index (the params table every index format here writes); a `path`
    * that exists WITHOUT its marker is a damaged artifact from a
    * pre-staging writer and is removed before rebuilding — by ATOMIC
    * RENAME to a trash name, never an in-place recursive delete, so a
    * tree that a concurrent run committed between our marker check and
    * the removal is captured whole and reinstated instead of destroyed
    * (round-7 advisory TOCTOU), and concurrent readers never observe a
    * half-deleted tree. Expected deployment is still one writer per
    * index path; the rename discipline just makes concurrent misuse
    * non-destructive.
    */
  def ensure(path: String, marker: String = "params")(build: String => Unit): String = {
    val dest = new File(path)
    if (new File(dest, marker).exists()) return path
    if (dest.exists() && removeDamaged(dest, marker)) return path
    val staging = new File(path + ".staging-" + java.util.UUID.randomUUID().toString.take(8))
    try {
      build(staging.getPath)
      require(new File(staging, marker).exists(),
        s"index build did not produce its commit marker '$marker' under $staging")
      if (!staging.renameTo(dest)) {
        // lost a commit race (dest now exists) — keep the winner's tree
        require(new File(dest, marker).exists(),
          s"could not commit index to $path and no valid index is present")
        deleteRecursively(staging)
      }
    } catch {
      case t: Throwable => deleteRecursively(staging); throw t
    }
    path
  }

  /** Remove a presumed-damaged (marker-less) tree at `dest` via atomic
    * rename-to-trash. Returns true iff a VALID tree is at `dest` on
    * return — i.e. a concurrent commit landed inside the check→remove
    * window and was preserved (reinstated from trash, or a newer winner
    * already took `dest`). Package-visible so the race arm is testable
    * without a real race.
    */
  private[graft] def removeDamaged(dest: File, marker: String): Boolean = {
    val trash = new File(
      dest.getPath + ".trash-" + java.util.UUID.randomUUID().toString.take(8))
    if (!dest.renameTo(trash))
      // rename refused: dest vanished or was atomically replaced under
      // us — valid iff the replacement carries the marker
      return new File(dest, marker).exists()
    if (new File(trash, marker).exists()) {
      // captured a concurrently committed valid tree — put it back; if
      // yet another commit already took dest, keep that winner instead
      if (trash.renameTo(dest)) return true
      if (new File(dest, marker).exists()) { deleteRecursively(trash); return true }
      throw new IllegalStateException(
        s"valid index tree for $dest stranded at $trash during damaged-artifact removal")
    }
    deleteRecursively(trash)
    false
  }

  /** Structural audit (fsck) of a MANIFEST-PROTOCOL store tree — the
    * operations check the CDC / semantic-dedup ingest stores need
    * after a crash: the protocol says a version exists IFF its
    * `_manifest/v<id>.json` does, staging/swap/old siblings are
    * transient, and nothing else should accumulate. Findings:
    *
    *   - `dangling_manifest` (CORRUPT): a manifest whose `v<id>/`
    *     data directory is missing — reads resolve a version that
    *     has no data; must be repaired before serving.
    *   - `orphan_version` (debris): a `v<id>/` directory with no
    *     manifest — a crash between data write and manifest rename;
    *     invisible to readers by design, safe to delete.
    *   - `stale_staging` (debris): leftover `<root>.staging-*` /
    *     `.swap-*` / `.old-*` / `.trash-*` SIBLINGS of the store
    *     root (the atomic-commit machinery's transient dirs — a
    *     crash strands them next to, never inside, the tree).
    *
    * Metadata-only: one listing of the root, the `_manifest` dir and
    * the parent — bounded by version count, never data-sized (the
    * semDedupStoreState discipline). Returns
    * (check_name, entry, severity) sorted, entries RELATIVE to the
    * store root / parent so results are location-independent.
    */
  def fsck(spark: org.apache.spark.sql.SparkSession, root: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rootF = new File(root)
    def names(f: File): Seq[String] =
      Option(f.listFiles()).map(_.toSeq.map(_.getName)).getOrElse(Seq.empty)
    val top = names(rootF)
    val versionDirs = top.filter(_.matches("v\\d+"))
      .filter(n => new File(rootF, n).isDirectory).toSet
    val manifests = names(new File(rootF, "_manifest"))
      .filter(_.matches("v\\d+\\.json"))
      .map(_.stripSuffix(".json")).toSet
    // a store root with NO parent (filesystem root, or a bare
    // relative name) has no sibling namespace to scan — skip the
    // stale-staging check instead of NPEing on getParentFile
    // (round-17 review fix)
    val siblings = Option(rootF.getParentFile).map(names).getOrElse(Seq.empty)
      .filter(_.startsWith(rootF.getName + "."))
      .filter(_.matches(".*\\.(staging|swap|old|trash)-.*"))
    val findings =
      (manifests -- versionDirs).toSeq
        .map(v => ("dangling_manifest", v, "corrupt")) ++
      (versionDirs -- manifests).toSeq
        .map(v => ("orphan_version", v, "debris")) ++
      siblings.map(n => ("stale_staging", n, "debris"))
    findings.sorted.toDF("check_name", "entry", "severity")
  }

  /** Repair pass over [[fsck]]'s findings: DEBRIS-class entries
    * (orphan versions, stale staging/swap/old/trash siblings) are
    * deleted — they are invisible to readers by protocol, so removal
    * is always safe; CORRUPT-class entries (dangling manifests) are
    * REFUSED — deleting a manifest rewrites committed history, and
    * the right fix (restore the data dir, or roll the store back) is
    * an operator decision, not an automatic one. Returns the same
    * findings table with an `action` column (`deleted` / `kept`),
    * so the audit trail is the output.
    */
  def fsckRepair(spark: org.apache.spark.sql.SparkSession, root: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rootF = new File(root)
    val findings = fsck(spark, root)
      .as[(String, String, String)].collect().toSeq
    val acted = findings.map { case (check, entry, severity) =>
      val target = check match {
        case "orphan_version" => new File(rootF, entry)
        case "stale_staging"  => new File(rootF.getParentFile, entry)
        case _                => null
      }
      val action =
        if (severity == "debris" && target != null) {
          deleteRecursively(target); "deleted"
        } else "kept"
      (check, entry, severity, action)
    }
    acted.sorted.toDF("check_name", "entry", "severity", "action")
      .select(col("check_name"), col("entry"), col("severity"),
        col("action"))
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
