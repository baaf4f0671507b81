package graft.sources

import org.apache.spark.sql.SparkSession

/** Once-per-source-state materialization of a derived directory under
  * /tmp, shared by every query that needs a pre-built sink fixture
  * (the day-partitioned events copy, the incremental-ingest sink).
  *
  * Guarantees:
  *  - the cache key embeds a fingerprint of the SOURCE file metadata
  *    (sizes + mtimes), so a regenerated source gets a fresh copy
  *    instead of silently serving stale data, and distinct source dirs
  *    cannot collide;
  *  - cross-JVM safe (Verify and Bench can run concurrently against
  *    the same /tmp): the copy is written to a JVM-unique temp dir and
  *    PUBLISHED with java.nio ATOMIC_MOVE — rename(2) either swaps
  *    atomically or throws, never copies — so no reader can observe a
  *    half-written dir. (Hadoop's local-fs rename falls back to
  *    FileUtil.copy when the target exists, which would NEST the source
  *    inside a racer's published copy and poison the cache.) Losing the
  *    publish race is fine: the winner's copy is byte-identical;
  *  - stale fingerprints of the same (tag, source) are pruned on
  *    publish, bounding /tmp growth to one copy per source state.
  */
object CachedDir {
  /** Derivation epoch, baked into every published path. The source
    * fingerprint detects REGENERATED DATA but cannot detect CHANGED
    * DERIVATION CODE: r9's caches were built from the current source
    * fingerprint with a timestamp-unit-buggy reader, so a fingerprint
    * hit would have served poisoned data forever after the reader fix.
    * Bump this when the semantics of what any `write` callback derives
    * change (not for pure perf changes). Old-epoch dirs are outside the
    * stale-prune's prefix and must be removed by hand (done for e1 in
    * r10). */
  private val Epoch = "e2"
  /** Fingerprint of a source file/dir's metadata (sizes + mtimes of its
    * parts) — the cache key every materialization embeds, and the key
    * any OTHER per-source-state memo (e.g. BpeOps' trained merge table)
    * must use so a regenerated source can never serve stale state. */
  def fingerprint(s: SparkSession, d: String, sourceFile: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$d/$sourceFile")
    val srcFs = src.getFileSystem(conf)
    val st = srcFs.getFileStatus(src)
    val parts =
      if (st.isDirectory) srcFs.listStatus(src).toSeq.sortBy(_.getPath.getName)
      else Seq(st)
    val h = parts.foldLeft(17L)((acc, p) =>
      acc * 1000003L + p.getLen * 31L + p.getModificationTime)
    java.lang.Long.toHexString(h)
  }

  /** Returns the published directory for (tag, source dir `d`),
    * materializing it with `write(tmpDir)` on first use. `write` must
    * leave a `_SUCCESS` marker (every Spark sink does). */
  def materialize(s: SparkSession, d: String, sourceFile: String, tag: String)
                 (write: String => Unit): String = synchronized {
    val conf = s.sparkContext.hadoopConfiguration
    val fp = fingerprint(s, d, sourceFile)
    val prefix = s"/tmp/graft_${Epoch}_${tag}_" + d.replaceAll("[^A-Za-z0-9.]", "_") + "_"
    val dest = prefix + fp
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val ok = new org.apache.hadoop.fs.Path(dest + "/_SUCCESS")
    val fs = destPath.getFileSystem(conf)
    if (!fs.exists(ok)) {
      // visible-by-design: a regenerated source forces every tag to
      // re-materialize inside the next run (r9: ~28 s of republish
      // silently inflated bench query times) — one line per publish
      // makes a fixture-rebuild storm diagnosable from the bench log
      System.err.println(
        s"[graft] CachedDir materializing tag=$tag fingerprint=$fp source=$d/$sourceFile")
      // distinct prefix for temp dirs so the stale-fingerprint prune can
      // never touch another JVM's in-flight write
      val tmp = new org.apache.hadoop.fs.Path(
        s"/tmp/graft_${tag}_tmp_" + java.util.UUID.randomUUID().toString)
      write(tmp.toString)
      def publish(): Boolean =
        try {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp.toUri.getPath),
            java.nio.file.Paths.get(dest),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } catch { case _: java.io.IOException => false }
      if (!publish()) {
        if (fs.exists(ok)) {
          // a concurrent JVM published the identical copy first; done
          fs.delete(tmp, true)
        } else {
          // dest exists WITHOUT _SUCCESS: corpse of a pre-atomic-era
          // crashed write (atomic publishers never leave one) — replace
          // it. Deleting here is safe: a dir lacking _SUCCESS is never
          // handed to readers.
          fs.delete(destPath, true)
          val won = publish()
          if (!won) fs.delete(tmp, true)
          require(won || fs.exists(ok),
            s"failed to publish cached materialization at $dest")
        }
      }
      // prune stale fingerprints of THIS (tag, source) (exact prefix +
      // hex fingerprint match — never other sources, never *_tmp_* dirs)
      val parent = destPath.getParent
      if (fs.exists(parent)) fs.listStatus(parent).foreach { st =>
        val p = st.getPath.toUri.getPath
        if (p != dest && p.startsWith(prefix) &&
            p.substring(prefix.length).matches("[0-9a-f]+"))
          fs.delete(st.getPath, true)
      }
    }
    dest
  }
}
