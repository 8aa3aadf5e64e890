package graft

/** Minimal JSON string escaping shared by the Verify and Bench mains.
  * Escapes backslash, quote, and ALL control chars (<0x20): a tab in
  * builder-authored SQL or an ANSI escape in an exception message would
  * otherwise make the driver's json.load fail and silently zero the
  * round's correctness/bench signal.
  */
object JsonFormat {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
