package graft

/** Root directory for oracle sidecar tables (fitted centroids etc.).
  *
  * The DuckDB oracle SQL hardcodes the DEFAULT path, so exactly one
  * process — the Verify run whose outputs the oracle checks — may
  * write there. Every other entrypoint that executes query functions
  * (tests at sf0.001, Bench/TaskStats at sf0.1) redirects its sidecar
  * writes to an isolated directory via `graft.sidecar.dir`, otherwise
  * a concurrent or later run at a DIFFERENT scale factor would
  * overwrite the centroids between Verify and the oracle compare and
  * fail the sidecar-replayed keys with mystery diffs (this happened:
  * a test-suite run at sf0.001 racing a sf0.01 Verify).
  */
object Sidecars {
  val DefaultRoot = "/tmp/graft_oracle_sidecars"

  def root: String = sys.props.getOrElse("graft.sidecar.dir", DefaultRoot)

  def path(name: String): String = s"$root/$name"

  /** Redirect this JVM's sidecar writes to a fresh isolated directory
    * (no-op if the property is already set explicitly).
    */
  def isolate(prefix: String): Unit =
    if (!sys.props.contains("graft.sidecar.dir")) {
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      System.setProperty("graft.sidecar.dir", dir)
    }
}
