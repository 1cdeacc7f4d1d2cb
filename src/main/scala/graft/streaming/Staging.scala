package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** FileStreamSource monitors a DIRECTORY (new files appear → new
  * micro-batches); testdata ships single files, so each stream stages
  * its table into a stream-input dir (in production the ingest dir
  * exists anyway). ONE implementation for every stream:
  *   - keyed by the sanitized source path (no hashCode collisions);
  *   - refreshed when the source file's size or mtime changes (a
  *     regenerated dataset must not be gated against a stale copy);
  *   - copied via temp-file + atomic move, so a crash or a concurrent
  *     session never leaves a truncated file that looks staged.
  */
private[streaming] object Staging {

  def stageFile(dir: String, fileName: String): String = {
    val src = Paths.get(dir, fileName)
    // one staging dir PER (source path, table file): FileStreamSource
    // reads every file in its directory, so tables must never share one
    val key = Paths.get(dir, fileName).toAbsolutePath.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val d = Paths.get(sys.props("java.io.tmpdir"), s"graft_stage_$key")
    val dst = d.resolve(fileName)
    val fresh = Files.exists(dst) &&
      Files.size(dst) == Files.size(src) &&
      !Files.getLastModifiedTime(dst).toInstant
        .isBefore(Files.getLastModifiedTime(src).toInstant)
    if (!fresh) {
      Files.createDirectories(d)
      // tmp lives OUTSIDE the watched dir (a half-copied file inside it
      // would be picked up by a concurrently starting stream)
      val tmp = Files.createTempFile(d.getParent, "graft_stage_tmp_", ".parquet")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    d.toString
  }
}
