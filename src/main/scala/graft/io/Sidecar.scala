package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared tmp-file + rename commit protocol for the small JSON sidecars
  * that persisted indexes carry next to their data files
  * ([[graft.operators.DedupIndex]]'s build params,
  * [[graft.operators.Ann.Ivf]]'s centroids). One implementation so the
  * commit semantics cannot drift between index kinds.
  *
  * The protocol and why each step exists:
  *  1. write to a dot-prefixed `.name.<uuid>.tmp` in the same directory —
  *     invisible to Spark's file listing, same filesystem so the rename is
  *     a metadata operation, never a copy;
  *  2. rename onto the final name — a crash before this point leaves no
  *     sidecar, which readers must treat as "no index";
  *  3. read back what actually committed and return it. This is the
  *     subtle step: on HDFS rename refuses to overwrite (a `false` return
  *     is a lost race), but on the local FS and object-store adapters
  *     rename CLOBBERS — a returned `true` does not prove this writer won
  *     a concurrent create race. Whatever content is committed is the
  *     winner; every racer validates its own parameters against the
  *     returned winner, so exactly one parameter set survives and losers
  *     fail loud instead of probing an index built with other params.
  */
object Sidecar {

  /** Commit `content` as `dir/name` and return the content that is
    * actually committed afterwards (this writer's or a concurrent
    * racer's — the caller must validate). With `overwrite = true` an
    * existing sidecar is deleted first (single-writer maintenance
    * semantics, e.g. a nightly index rebuild); with `false` an existing
    * committed sidecar may survive as the winner.
    */
  def commit(
      fs: FileSystem,
      dir: Path,
      name: String,
      content: String,
      overwrite: Boolean): String = {
    val sidecar = new Path(dir, name)
    val tmp = new Path(dir, s".$name.${java.util.UUID.randomUUID()}.tmp")
    fs.mkdirs(dir)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (overwrite) fs.delete(sidecar, false)
    if (!fs.rename(tmp, sidecar)) fs.delete(tmp, false)
    read(fs, dir, name).getOrElse(throw new IllegalStateException(
      s"sidecar missing after commit at $sidecar"))
  }

  /** The committed sidecar content, or None when no sidecar exists. */
  def read(fs: FileSystem, dir: Path, name: String): Option[String] = {
    val sidecar = new Path(dir, name)
    if (!fs.exists(sidecar)) None
    else {
      val in = fs.open(sidecar)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8))
      finally in.close()
    }
  }
}
