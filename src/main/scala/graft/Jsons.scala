package graft

/** Shared JSON string escaping for the hand-rolled JSON emitters
  * ([[Verify]]'s oracle dump, [[Bench]]'s error map) — one definition so
  * a future escaping fix cannot silently miss a copy.
  */
object Jsons {
  /** Escape backslash, quote, and ALL control chars (< 0x20): a tab or
    * stray CR inside builder-authored SQL or an exception message must
    * not invalidate the emitted JSON for strict parsers.
    */
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
