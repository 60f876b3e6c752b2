package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
  def infer(df: DataFrame): Seq[ColumnInference] = {
    val cols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (cols.isEmpty) return Nil
    def castsTo(c: String, t: String): Column = t match {
      // lossy-truncation guard: a value is a DATE only if it round-trips
      case "DATE" => expr(s"cast(try_cast(`$c` AS DATE) AS STRING) = trim(`$c`)")
      case _ => expr(s"try_cast(`$c` AS $t)").isNotNull
    }
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
}
