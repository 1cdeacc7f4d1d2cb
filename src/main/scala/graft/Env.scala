package graft

/** SPARK_GRAFT_* knob parsing with named diagnostics (r13, ADVICE
  * r12): a malformed value must fail with a message naming the knob
  * and what it saw, not as a bare NumberFormatException three stack
  * frames deep in a bench run.
  */
object Env {
  private def parse[A](name: String, default: A)(f: String => A): A =
    sys.env.get(name).map { v =>
      try f(v.trim)
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$name='$v' is not a valid number for this knob")
      }
    }.getOrElse(default)

  def int(name: String, default: Int): Int = parse(name, default)(_.toInt)
  def long(name: String, default: Long): Long = parse(name, default)(_.toLong)
}
