package graft

/** JSON string escaping shared by the artifact-writing mains. The
  * driver parses Bench's stdout line and Verify's oracle_sql.json with
  * a strict JSON reader, so every interpolated string — builder SQL,
  * env-provided paths — must escape backslash, quote and ALL control
  * chars (<0x20); one bad byte silently zeroes a round's artifacts.
  */
private[graft] object JsonUtil {
  /** `s` as a quoted JSON string literal. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
