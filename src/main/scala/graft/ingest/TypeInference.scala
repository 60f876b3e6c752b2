package graft.ingest

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType}

/** Distributed type inference for schema-on-read all-text tables — the
  * automated successor to the reference's hand-written typed-projection
  * hooks (SURVEY §2.2 P3): one aggregation pass counts, per string
  * column, how many non-empty values `try_cast` cleanly to each candidate
  * type; a column is promoted to the NARROWEST type that every non-empty
  * value casts to, and `typed` applies the promotions as one projection.
  *
  * Candidate precedence (narrow → wide): BIGINT → DOUBLE → DATE →
  * TIMESTAMP → BOOLEAN. BIGINT is tested before DOUBLE because every
  * integer literal also casts to double. DATE demands ROUND-TRIP
  * equality, not just cast success: Spark's date cast silently TRUNCATES
  * timestamp strings, so `'2024-01-01 10:00:00'` "casts" to DATE — a
  * lossy promotion the round-trip test rejects. Empty strings count as
  * missing (the pgfutter empty-field ≙ NULL convention), so they veto
  * nothing.
  *
  * Scale shape: ONE full scan producing a single aggregated row
  * (`|cols| × |types|` counters, all map-side combined) — no per-column
  * jobs, no driver-side sampling loop.
  */
object TypeInference {

  /** Candidate SQL types, narrowest first. */
  val Candidates: Seq[String] = Seq("BIGINT", "DOUBLE", "DATE", "TIMESTAMP", "BOOLEAN")

  final case class ColumnInference(
      column: String,
      inferred: String, // a Candidates entry, or "STRING"
      nonEmpty: Long,
      castable: Map[String, Long])

  private def nonEmpty(c: Column): Column =
    c.isNotNull && length(c) > 0

  /** One-pass inference over every StringType column of `df`. */
  def infer(dfIn: DataFrame): Seq[ColumnInference] = {
    // The census is pure map-side predicate work (regex + try_cast per
    // cell), so its wall time is bounded by the SCAN's parallelism — and
    // a small all-text table is one parquet split, i.e. one core (round
    // 16, guide §2: 3.2 s at sf0.1 with 31 idle cores). Fan the rows out
    // via the one shared heuristic (ADVICE r16: this was an inline copy
    // of Tables.fanOut, and two copies of the guard can drift); at scale
    // — where the input already carries more splits than cores — it is a
    // no-op, never an added shuffle.
    val df = graft.Tables.fanOut(dfIn)
    val cols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (cols.isEmpty) return Nil
    val aggs: Seq[Column] = cols.flatMap { c =>
      count(when(nonEmpty(col(c)), 1)).as(s"${c}__n") +:
        Candidates.map { t =>
          count(when(nonEmpty(col(c)) && castsTo(c, t), 1)).as(s"${c}__$t")
        }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val n = row.getAs[Long](s"${c}__n")
      val casts = Candidates.map(t => t -> row.getAs[Long](s"${c}__$t")).toMap
      val inferred =
        if (n == 0) "STRING" // nothing to learn from — stay text
        else Candidates.find(t => casts(t) == n).getOrElse("STRING")
      ColumnInference(c, inferred, n, casts)
    }
  }

  /** Spec hook: the per-type castability predicate `infer` aggregates. */
  private[ingest] def castsToForTest(c: String, t: String): Column = castsTo(c, t)

  private def castsTo(c: String, t: String): Column = t match {
      // lossy-truncation guard: a value is a DATE only if it round-trips.
      // Spark 4's ANSI stringToDateAnsi also rejects by THROW (TryEval
      // catches) — one exception per non-date value. Only a canonical
      // 'yyyy-mm-dd'-shaped string (optionally signed, 4-7 digit year —
      // wide-year casts print a '+' prefix) can possibly round-trip, so
      // the compiled-once rlike is an exact superset of the survivors and
      // everything else short-circuits without reaching the cast.
      case "DATE" =>
        trim(col(c), " \t\n\r").rlike("^[+-]?[0-9]{4,7}-[0-9]{1,2}-[0-9]{1,2}$") &&
          expr(s"cast(try_cast(`$c` AS DATE) AS STRING) = trim(`$c`)")
      // Spark 4's TRY cast to integral types rejects invalid strings by
      // THROW-AND-CATCH — one exception per non-integral value, which on a
      // mostly-non-numeric column is ~4× the cost of the whole census
      // (measured sf0.1: 6.3 s -> 1.7 s). The translate() prefilter is
      // exception-free and passes exactly the all-digit/sign/ASCII-space
      // forms; try_cast still decides sign placement and overflow behind
      // it, so the accepted set is unchanged (exotic non-ASCII whitespace
      // that Spark's trimAll would eat is the one divergence — absent from
      // any CSV value domain this operator targets).
      // the grammar rlike catches char-class survivors with INTERIOR
      // sign chars — date strings '1995-02-03' pass translate and were
      // still paying a throw each (2 such columns in the census fixture)
      case "BIGINT" =>
        expr(s"translate(`$c`, '0123456789+- \\t\\n\\r', '') = ''") &&
          trim(col(c), " \t\n\r").rlike("^[+-]?[0-9]+$") &&
          expr(s"try_cast(`$c` AS BIGINT)").isNotNull
      // same throw-per-invalid-value cost, and the census's WORST: most
      // fixture columns are non-double text, so every row of every such
      // column pays a JVM exception (the q_type_census sf1 stress outlier).
      // Stage 1 is the exception-free translate() char-class test; stage 2
      // a compiled-once rlike for the double-literal grammar (sign, digits,
      // optional fraction/exponent, optional f/d suffix Java's parser
      // takes) so char-class survivors like 'F' or '1995-02-03' are
      // rejected without a throw; Spark's special literals (inf/infinity/
      // nan, signed, any case) are OR'd in. try_cast still decides behind
      // the filter. Stated divergence: Java hex-float forms ('0x1p3'),
      // which the raw cast accepts, are filtered — matching DuckDB and
      // every CSV value domain this operator targets (spec-pinned).
      case "DOUBLE" =>
        // NB: SQL trim() strips only spaces while the cast's trimAll eats
        // all whitespace, so trim exactly the four chars translate admits
        (expr(s"translate(`$c`, '0123456789+-. eEdDfF\\t\\n\\r', '') = ''") &&
          trim(col(c), " \t\n\r")
            .rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?[dDfF]?$") ||
          lower(trim(col(c), " \t\n\r")).isin(
            "inf", "+inf", "-inf", "infinity", "+infinity", "-infinity", "nan")) &&
          expr(s"try_cast(`$c` AS DOUBLE)").isNotNull
      // same throw-per-invalid-value cost (5.3 s -> 1.4 s); Spark's
      // accepted boolean literal set (StringUtils.{true,false}Strings,
      // trimAll + lowercase) is small and stable enough to state directly
      // NB: the cast's trimAll eats ALL whitespace ('true\t', '1\n'), so
      // trim the same four chars the sibling branches do — plain trim()
      // strips spaces only and would demote tab/newline-padded booleans
      case "BOOLEAN" =>
        lower(trim(col(c), " \t\n\r")).isin(
          "true", "t", "yes", "y", "1", "false", "f", "no", "n", "0")
      // the census's sf1 whale (10.8 s of a 16.3 s infer): ANSI
      // stringToTimestampAnsi throws per invalid value too. Spark's
      // accepted grammar is (a) a bare 4-6 digit year ≤ 294247 — the
      // numeric cap is checked exception-free on the regex-guarded value
      // (all-digit ≤6 chars can't overflow BIGINT) so 6-digit keys above
      // the cap don't pay a throw — or (b) a year-month[-day[ time]]
      // form; time-part garbage behind a valid date prefix still throws,
      // the accepted rarity for a superset filter. try_cast decides.
      case "TIMESTAMP" =>
        val t4 = trim(col(c), " \t\n\r")
        (t4.rlike("^[+-]?[0-9]{4,6}$") &&
          expr(s"try_cast(trim(BOTH ' \\t\\n\\r' FROM `$c`) AS BIGINT) <= 294247") ||
          t4.rlike("^[+-]?[0-9]{4,6}-[0-9]{1,2}(-[0-9]{1,2}([ T].*)?)?$")) &&
          expr(s"try_cast(`$c` AS TIMESTAMP)").isNotNull
      case _ => expr(s"try_cast(`$c` AS $t)").isNotNull
  }

  /** Apply inferences as one projection: promoted columns cast (empty
    * strings first normalized to NULL, the pgfutter convention), the rest
    * pass through untouched. */
  def typed(df: DataFrame, inferences: Seq[ColumnInference]): DataFrame = {
    val byName = inferences.map(i => i.column -> i.inferred).toMap
    val projected = df.columns.map { c =>
      byName.get(c) match {
        case Some(t) if t != "STRING" =>
          expr(s"try_cast(nullif(`$c`, '') AS $t)").as(c)
        case _ => col(c)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  // --- q_type_census: the inference census, oracle-checked ---------------
  // Round-4 verdict item 5: schema inference was spec-only; this puts the
  // one-pass castability census itself on the rows+schema+hash gate. The
  // fixture stringifies `orders` (the pgfutter all-text shape) plus two
  // derived columns so every candidate type is POSITIVELY exercised:
  // day-truncated o_orderdate (→ DATE: round-trips, unlike the timestamp
  // strings the round-trip guard exists to reject) and an even-orderkey
  // flag (→ BOOLEAN). The DuckDB mirror uses TRY_CAST with two explicit
  // divergence guards, each probed empirically:
  //  - string→BIGINT: Spark accepts only integral literals while DuckDB
  //    also parses '123.0'/'1e3' → the oracle excludes '.'/'e' forms;
  //  - string→TIMESTAMP: Spark parses bare 4-6 digit numbers as a YEAR
  //    when ≤ 294247 (its max timestamp year: '1234'→1234-01-01, '123'
  //    and 7-digit forms rejected) while DuckDB rejects year-only text →
  //    the oracle ORs that grammar in (non-negative forms — this value
  //    domain has no signed numerics).
  // (DuckDB's BOOLEAN also rejects y/n/yes/no that Spark accepts —
  // absent from this value domain, so not guarded; a corpus carrying
  // those would need the same treatment.)
  private def qTypeCensus(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(spark, dir, "orders")
    val stringified = o.select(
      o.columns.map(c => col(c).cast(StringType).as(c)) :+
        col("o_orderdate").cast(DateType).cast(StringType).as("o_orderdate_day") :+
        (col("o_orderkey") % 2 === 0).cast(StringType).as("o_even"): _*)
    val inferences = infer(stringified)
    import spark.implicits._
    inferences.map { i =>
      (i.column, i.inferred, i.nonEmpty, i.castable("BIGINT"), i.castable("DOUBLE"),
        i.castable("DATE"), i.castable("TIMESTAMP"), i.castable("BOOLEAN"))
    }.toDF("col_name", "inferred", "n_nonempty", "n_bigint", "n_double",
      "n_date", "n_timestamp", "n_boolean")
  }

  private val qTypeCensusSql = {
    val baseCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val longRows = (baseCols.map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM orders") :+
      "SELECT 'o_orderdate_day' AS col_name, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS v FROM orders" :+
      "SELECT 'o_even' AS col_name, CAST(o_orderkey % 2 = 0 AS VARCHAR) AS v FROM orders")
      .mkString("\n  UNION ALL ")
    s"""WITH u AS (
       |  $longRows),
       |c AS (
       |  SELECT col_name,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0 THEN 1 END) AS n_nonempty,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0
       |      AND TRY_CAST(v AS BIGINT) IS NOT NULL
       |      AND NOT contains(v, '.') AND NOT contains(lower(v), 'e') THEN 1 END) AS n_bigint,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0
       |      AND TRY_CAST(v AS DOUBLE) IS NOT NULL THEN 1 END) AS n_double,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0
       |      AND CAST(TRY_CAST(v AS DATE) AS VARCHAR) = trim(v) THEN 1 END) AS n_date,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0
       |      AND (TRY_CAST(v AS TIMESTAMP) IS NOT NULL
       |        OR (regexp_matches(trim(v), '^[+]?[0-9]{4,6}$$')
       |          -- TRY_CAST: DuckDB may evaluate AND conjuncts out of
       |          -- order, so a plain CAST throws on non-numeric v even
       |          -- under the regexp guard (seen at sf0.1: 'F')
       |          AND TRY_CAST(regexp_replace(trim(v), '[+]', '') AS BIGINT) <= 294247))
       |      THEN 1 END) AS n_timestamp,
       |    COUNT(CASE WHEN v IS NOT NULL AND length(v) > 0
       |      AND TRY_CAST(v AS BOOLEAN) IS NOT NULL THEN 1 END) AS n_boolean
       |  FROM u GROUP BY col_name)
       |SELECT col_name,
       |  CASE WHEN n_nonempty = 0 THEN 'STRING'
       |       WHEN n_bigint = n_nonempty THEN 'BIGINT'
       |       WHEN n_double = n_nonempty THEN 'DOUBLE'
       |       WHEN n_date = n_nonempty THEN 'DATE'
       |       WHEN n_timestamp = n_nonempty THEN 'TIMESTAMP'
       |       WHEN n_boolean = n_nonempty THEN 'BOOLEAN'
       |       ELSE 'STRING' END AS inferred,
       |  n_nonempty, n_bigint, n_double, n_date, n_timestamp, n_boolean
       |FROM c""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q_type_census", qTypeCensus, Some(qTypeCensusSql)))
}
