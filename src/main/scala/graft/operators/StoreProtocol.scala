package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The whole-directory crash protocol every persisted graft store shares
  * — ONE implementation (the r10 code-review consolidation: five heal
  * copies and four swap copies had to stay byte-for-byte consistent by
  * hand before this).
  *
  * [[swapInto]] replaces a live directory with a fully-written temp in
  * two renames: stage the live directory aside as `<path>__old`, move
  * the temp in, roll back if the second rename fails — a reader sees the
  * old or the new contents, never a mix, but there is a brief window
  * where the path is ABSENT, and a crash inside it parks the store at
  * `__old`. [[heal]] repairs exactly that state (path missing, `__old`
  * present → rename back; the `__old` contents are the complete
  * pre-swap store by construction) and must run before any read of a
  * swap-managed directory. Single-writer: heal's existence check races
  * a concurrent swap — the writers that tolerate the race document it
  * (Warehouse.recoverStranded keeps its own variant for that reason:
  * its overwrite retries until the writer wins).
  */
private[graft] object StoreProtocol {

  /** Repair a [[swapInto]] crashed between its two renames. */
  def heal(fs: FileSystem, path: Path): Unit = {
    val old = new Path(path.toString + "__old")
    if (!fs.exists(path) && fs.exists(old)) fs.rename(old, path)
    ()
  }

  /** The committed ingest keys of a marker-protocol store (`_commits/`
    * entries under `root`) — shared by the incremental BM25 index and
    * the span store (one implementation, the heal/swap consolidation
    * argument applied to the marker read).
    */
  def committedKeys(fs: FileSystem, root: Path): Seq[String] = {
    val commitsDir = new Path(root, "_commits")
    if (!fs.exists(commitsDir)) Nil
    else fs.listStatus(commitsDir).toSeq.map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_"))
  }

  /** Replace `path` with the fully-written `tmp` through the `__old`
    * two-rename swap; `op` names the caller in failure messages.
    */
  def swapInto(fs: FileSystem, tmp: Path, path: Path, op: String): Unit = {
    val old = new Path(path.toString + "__old")
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new IllegalStateException(s"$op: cannot stage $path")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back — the store stays readable
      throw new IllegalStateException(s"$op: swap failed for $path")
    }
    fs.delete(old, true)
    ()
  }
}
