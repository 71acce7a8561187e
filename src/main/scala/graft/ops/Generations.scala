package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-atomic directory swap via generation directories + commit
  * markers — the mechanism behind index compaction (IVF `vectors/`, LSH
  * `buckets/`).
  *
  * Problem: "rewrite a served directory in place" has no safe ordering.
  * `delete(dir); rename(tmp, dir)` leaves NOTHING served if the process
  * dies between the two calls, and a mutable pointer file has the same
  * delete-then-recreate window one level down. At 100 TB a maintenance
  * crash must never take an index offline for readers.
  *
  * Scheme (the standard lakehouse generation trick, cf. Delta/Iceberg
  * snapshot pointers, expressed over a plain filesystem):
  *   - generation N's data lives at `<base>_gen=N/` (generation 0 is the
  *     original `<base>/` written by the index build — so pre-generation
  *     indexes resolve unchanged);
  *   - a generation becomes current the instant its IMMUTABLE commit
  *     marker `_<base>_commit_N` is created (one atomic create of a
  *     one-block file — nothing is ever deleted or renamed on the commit
  *     path);
  *   - readers resolve "current" as the highest committed N whose
  *     directory exists; no markers → the plain `<base>/` layout.
  *
  * Every instant therefore serves a COMPLETE directory: before the
  * marker lands the old generation is current (an uncommitted staged dir
  * is invisible); after, the new one is. A crash at any boundary leaves
  * either state, both valid — the kill-point spec walks each one.
  *
  * GC is deliberately decoupled from the swap: [[gcOld]] keeps the
  * current AND previous generations (in-flight readers that resolved
  * just before a commit still have their files — the grace period), and
  * markers are deleted BEFORE their data dirs so resolution never picks
  * a half-deleted generation. [[vacuum]] is the operator's explicit
  * "no readers older than the last compact" reclaim.
  */
object Generations {

  private def markerName(base: String, gen: Long) = s"_${base}_commit_$gen"

  private[graft] def genDir(root: Path, base: String, gen: Long): Path =
    if (gen == 0L) new Path(root, base) else new Path(root, s"${base}_gen=$gen")

  /** Committed generation numbers (marker present AND data dir present),
    * ascending. Generation 0 (the plain `<base>/` dir) is implicit and
    * not listed here.
    */
  private def committed(fs: FileSystem, root: Path, base: String): Seq[Long] = {
    if (!fs.exists(root)) return Nil
    val prefix = s"_${base}_commit_"
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
      .filter(g => fs.exists(genDir(root, base, g)))
      .sorted
  }

  /** The generation number readers should serve: highest committed, else
    * 0 (the plain `<base>/` layout — also the pre-generation legacy
    * resolution, so existing indexes read unchanged).
    */
  def currentGen(fs: FileSystem, root: Path, base: String): Long =
    committed(fs, root, base).lastOption.getOrElse(0L)

  /** Committed generations, ascending — the corpus-versioning history
    * surface ([[CorpusVersions.history]]).
    */
  def committedGens(fs: FileSystem, root: Path, base: String): Seq[Long] =
    committed(fs, root, base)

  /** Drop ONE committed generation (marker before data, the GC ordering).
    * Refuses the current generation — the serve path never loses its
    * directory.
    */
  def dropGeneration(fs: FileSystem, root: Path, base: String, gen: Long): Unit = {
    require(gen != currentGen(fs, root, base),
      s"refusing to drop the CURRENT generation $gen of $base")
    dropGen(fs, root, base, gen)
  }

  /** The directory readers should scan right now. */
  def currentDir(fs: FileSystem, root: Path, base: String): Path =
    genDir(root, base, currentGen(fs, root, base))

  /** Reserve the next generation: returns (stagingDir, gen). Any
    * leftover UNCOMMITTED dir at that number (a previous crashed
    * attempt) is cleared — it was never visible to readers.
    */
  def stage(fs: FileSystem, root: Path, base: String): (Path, Long) = {
    val next = currentGen(fs, root, base) + 1
    val dir = genDir(root, base, next)
    if (fs.exists(dir)) fs.delete(dir, true)
    (dir, next)
  }

  /** Make generation `gen` current: one atomic create of its immutable
    * commit marker. The staged directory MUST be fully written first.
    */
  def commit(fs: FileSystem, root: Path, base: String, gen: Long): Unit = {
    val out = fs.create(new Path(root, markerName(base, gen)), false)
    try out.write(genDir(root, base, gen).getName.getBytes("UTF-8"))
    finally out.close()
  }

  /** Drop generations older than the PREVIOUS one (current and previous
    * stay readable — the in-flight-reader grace period). Markers are
    * deleted before their data dirs, so a crash mid-GC only leaks a dir,
    * never dangles a marker at a missing one.
    */
  def gcOld(fs: FileSystem, root: Path, base: String): Unit = {
    val gens = 0L +: committed(fs, root, base)
    gens.dropRight(2).foreach(dropGen(fs, root, base, _))
  }

  /** Drop EVERY generation except current — run only when no reader can
    * be older than the last commit (the operator's reclaim cadence).
    */
  def vacuum(fs: FileSystem, root: Path, base: String): Unit = {
    val cur = currentGen(fs, root, base)
    val gens = 0L +: committed(fs, root, base)
    gens.filter(_ != cur).foreach(dropGen(fs, root, base, _))
  }

  /** Remove all generation state for `base` (markers first, then dirs,
    * then the base dir itself) — the fresh-build reset: an index rebuild
    * at the same path must not stay shadowed by a stale committed
    * generation from the previous lineage.
    */
  def reset(fs: FileSystem, root: Path, base: String): Unit = {
    committed(fs, root, base).foreach(dropGen(fs, root, base, _))
    val baseDir = new Path(root, base)
    if (fs.exists(baseDir)) fs.delete(baseDir, true)
    // uncommitted staged leftovers too
    if (fs.exists(root))
      fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith(s"${base}_gen="))
        .foreach(fs.delete(_, true))
  }

  private def dropGen(fs: FileSystem, root: Path, base: String, gen: Long): Unit = {
    if (gen > 0L) { // gen 0 has no marker
      val m = new Path(root, markerName(base, gen))
      if (fs.exists(m)) fs.delete(m, false)
    }
    val d = genDir(root, base, gen)
    if (fs.exists(d)) fs.delete(d, true)
  }
}
