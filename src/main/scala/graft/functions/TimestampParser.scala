package graft.functions

import java.time.{LocalDateTime, ZoneId, ZoneOffset}
import java.util.regex.Pattern

/** Single-pass parser for the reference's `parse_timestamp` dispatch
  * (hooks/functions.sql:38-58). Exact same branch semantics as the Column
  * composition in Functions.parseTimestamp, but each input is matched at
  * most once per branch with precompiled patterns and all fields extracted
  * from that one match — called from the codegen'd ParseTimestampExpr.
  *
  * Returns epoch micros (UTC) or null.
  */
object TimestampParser {

  // Branch guards — verbatim from the reference (dots unescaped on purpose).
  private val B1 = Pattern.compile("\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.\\d{9} (?:AM|PM) (\\+|-)\\d\\d:\\d\\d")
  private val B2 = Pattern.compile("\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d (?:AM|PM) (\\+|-)\\d\\d:\\d\\d")
  private val B3 = Pattern.compile("\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.\\d{9} (?:AM|PM) (\\w\\w\\w)")
  private val B4 = Pattern.compile("\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d (?:AM|PM) (\\w\\w\\w)")
  private val B5 = Pattern.compile("\\d{14}(\\+|-)\\d\\d\\d\\d")

  // Field extractor for the Oracle shapes (groups: dd mon yy hh mi ss
  // frac ampm zonetail).
  private val Fields = Pattern.compile(
    "^(\\d\\d)-(\\w\\w\\w)-(\\d\\d) (\\d\\d)\\.(\\d\\d)\\.(\\d\\d)(?:\\.(\\d{1,9}))? (AM|PM) (.+)$")

  private val Months: Map[String, Int] = Seq(
    "JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zipWithIndex
    .map { case (m, i) => m -> (i + 1) }.toMap

  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[String, ZoneId]()
  private def zone(id: String): ZoneId =
    zoneCache.computeIfAbsent(id, z => ZoneId.of(z, ZoneId.SHORT_IDS))

  /** null = no branch matched / invalid fields (NULL-on-no-match, and
    * NULL-on-invalid matching Functions.parseTimestamp's try_ semantics). */
  def parse(s: String): java.lang.Long = {
    if (s == null) return null
    if (B1.matcher(s).find() || B2.matcher(s).find()) parseOracle(s, null)
    else if (B3.matcher(s).find() || B4.matcher(s).find()) parseOracle(s, namedZone(s))
    else if (B5.matcher(s).find()) parseCompact(s)
    else null
  }

  /** parse_timezone (F5): 3-letter token after AM/PM, else null. */
  def namedZone(s: String): String = {
    if (s == null) return null
    val m = Pattern.compile(
      "\\d\\d-\\w\\w\\w-\\d\\d \\d\\d.\\d\\d.\\d\\d.?\\d{0,9} (?:AM|PM) (\\w\\w\\w)").matcher(s)
    if (m.find()) m.group(1) else null
  }

  /** zoneOverride == null → use the trailing offset token from the value. */
  private def parseOracle(s: String, zoneOverride: String): java.lang.Long = {
    val m = Fields.matcher(s)
    if (!m.matches()) return null
    try {
      val dd = m.group(1).toInt
      val mon = Months.getOrElse(m.group(2).toUpperCase, return null)
      val yyyy = 2000 + m.group(3).toInt
      val hh12 = m.group(4).toInt
      val mi = m.group(5).toInt
      val ss = m.group(6).toInt
      val frac = Option(m.group(7)).getOrElse("")
      val micros = (frac + "000000").take(6).toInt
      val pm = m.group(8) == "PM"
      val z = if (zoneOverride != null) zoneOverride else m.group(9).trim
      val hh24 = (hh12 % 12) + (if (pm) 12 else 0)
      val wall = LocalDateTime.of(yyyy, mon, dd, hh24, mi, ss, micros * 1000)
      val instant = wall.atZone(zone(z)).toInstant
      java.lang.Long.valueOf(instant.getEpochSecond * 1000000L + instant.getNano / 1000L)
    } catch { case _: RuntimeException => null }
  }

  private def parseCompact(s: String): java.lang.Long = {
    try {
      val yyyy = s.substring(0, 4).toInt
      val mm = s.substring(4, 6).toInt
      val dd = s.substring(6, 8).toInt
      val hh = s.substring(8, 10).toInt
      val mi = s.substring(10, 12).toInt
      val ss = s.substring(12, 14).toInt
      val z = s.substring(14, 17) + ":" + s.substring(17, 19)
      val wall = LocalDateTime.of(yyyy, mm, dd, hh, mi, ss)
      val instant = wall.atZone(zone(z)).toInstant
      java.lang.Long.valueOf(instant.getEpochSecond * 1000000L + instant.getNano / 1000L)
    } catch { case _: RuntimeException => null }
  }

  /** parse_date (F6): `01-FEB-19` → epoch days, null on no-match/invalid. */
  private val DateP = Pattern.compile("^(\\d\\d)-(\\w\\w\\w)-(\\d\\d)$")
  def parseDateDays(s: String): Integer = {
    if (s == null) return null
    val m = DateP.matcher(s)
    if (!m.matches()) return null
    try {
      val mon = Months.getOrElse(m.group(2).toUpperCase, return null)
      val d = java.time.LocalDate.of(2000 + m.group(3).toInt, mon, m.group(1).toInt)
      Integer.valueOf(d.toEpochDay.toInt)
    } catch { case _: RuntimeException => null }
  }
}
