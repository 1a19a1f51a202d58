package graft.core

import scala.collection.immutable.ListMap

/** Minimal ordered-JSON writer for pipeline reports.
  *
  * Reports are small driver-side structures (ListMap/Seq/primitives); this
  * mirrors the reference's `json.dump(report, indent=2, ensure_ascii=False)`
  * output shape (reference: src/etl/utils/reporting.py:138-142) without
  * pulling schema-bound mappers into the pipeline. Field order is preserved
  * via ListMap.
  */
object Json {

  def write(x: Any, indent: Int = 2): String = render(x, indent, 0)

  private def render(x: Any, indent: Int, level: Int): String = x match {
    case null | None  => "null"
    case Some(v)      => render(v, indent, level)
    case s: String    => quote(s)
    case b: Boolean   => b.toString
    case d: Double    => if (d.isNaN || d.isInfinite) "null" else fmtDouble(d)
    case f: Float     => render(f.toDouble, indent, level)
    case n: Number    => n.toString
    case m: collection.Map[_, _] =>
      if (m.isEmpty) "{}"
      else {
        val pad = " " * (indent * (level + 1))
        val end = " " * (indent * level)
        m.map { case (k, v) =>
          s"$pad${quote(k.toString)}: ${render(v, indent, level + 1)}"
        }.mkString("{\n", ",\n", s"\n$end}")
      }
    case it: Iterable[_] =>
      if (it.isEmpty) "[]"
      else {
        val pad = " " * (indent * (level + 1))
        val end = " " * (indent * level)
        it.map(v => s"$pad${render(v, indent, level + 1)}")
          .mkString("[\n", ",\n", s"\n$end]")
      }
    case other => quote(other.toString)
  }

  /** Python-repr-compatible float formatting for whole doubles ("1.0"). */
  private def fmtDouble(d: Double): String =
    if (d == Math.floor(d) && Math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Convenience for building ordered report maps. */
  def obj(fields: (String, Any)*): ListMap[String, Any] = ListMap(fields: _*)
}
