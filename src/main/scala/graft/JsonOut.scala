package graft

/** Shared one-line-JSON string escaping for the driver-facing mains
  * (Bench, Equivalence): backslash, quote, and control characters — an
  * exception message or path with an embedded tab/CR must never break
  * the single-JSON-line contract the driver greps for.
  */
private[graft] object JsonOut {
  def escape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
