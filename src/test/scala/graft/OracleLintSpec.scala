package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over every DuckDB oracle statement for the alias-collision bug
  * class that cost round 13's only red row (q_agg_kruskal): DuckDB and
  * Spark both resolve identifiers case-insensitively, so two aliases in
  * one statement that differ only by case (`AS nn` next to `AS nN`)
  * silently bind one to the other. The Spark DataFrame twin is even
  * sharper — `withColumn("nn", ...)` REPLACES an existing `nN` column —
  * so an oracle statement that trips this lint almost always means the
  * mirrored Spark query is broken too.
  *
  * The lint extracts every `AS <identifier>` alias per statement and
  * fails when two distinct spellings case-fold to the same name. SQL
  * keywords that legitimately follow AS in casts/types are excluded by
  * only matching bare identifiers NOT followed by '(' and skipping the
  * CAST type position (inside `CAST(x AS T)` the T is a type, matched
  * and dropped via paren-depth tracking).
  */
class OracleLintSpec extends AnyFunSuite {

  /** Aliases introduced by `AS ident` outside a CAST type position.
    * The CAST type is excluded by NAME (the DuckDB type vocabulary the
    * oracles use), not by position — the earlier "next char is ')' or
    * '('" heuristic also silently dropped genuine aliases that happen
    * to close a parenthesized subquery (`(SELECT x AS foo)`), shrinking
    * lint coverage without notice (ADVICE r14). A query alias SPELLED
    * like a type name would be skipped too, but the oracle style never
    * aliases to bare type names, and a skipped alias only narrows the
    * net — it cannot produce a false failure. */
  private val typeNames = Set(
    "double", "bigint", "hugeint", "uhugeint", "ubigint", "integer",
    "uinteger", "smallint", "tinyint", "usmallint", "utinyint",
    "decimal", "numeric", "varchar", "text", "boolean", "bool", "date",
    "timestamp", "timestamptz", "time", "interval", "float", "real",
    "blob", "json", "uuid")
  private def aliases(sql: String): Seq[String] = {
    val noComments = sql.linesIterator
      .map(l => l.indexOf("--") match {
        case -1 => l
        case i  => l.substring(0, i)
      })
      .mkString("\n")
    val asIdent = """(?i)\bAS\s+([A-Za-z_][A-Za-z0-9_]*)""".r
    asIdent
      .findAllMatchIn(noComments)
      .filter(m => !typeNames.contains(m.group(1).toLowerCase))
      .map(_.group(1))
      .toSeq
  }

  test("no two aliases in one oracle statement differ only by case") {
    val bad = OracleSql.all.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val groups = aliases(sql).distinct.groupBy(_.toLowerCase)
        val collisions = groups.collect {
          case (_, spellings) if spellings.size > 1 => spellings
        }
        if (collisions.isEmpty) Nil
        else Seq(s"$name: ${collisions.map(_.mkString(" vs ")).mkString("; ")}")
    }
    assert(
      bad.isEmpty,
      s"\ncase-folding alias collisions (DuckDB binds case-insensitively):\n" +
        bad.mkString("\n"))
  }

  test("no alias case-folds onto a referenced column of the same statement") {
    // Wider net: an alias that case-folds onto ANY other identifier
    // used in the statement (the kruskal shape: alias `nn`, column
    // `nN` carried from a CTE). Only flags when the two spellings
    // differ — same-spelling reuse (SELECT x AS x) is fine.
    val ident = """[A-Za-z_][A-Za-z0-9_]*""".r
    val keywords = Set(
      "select", "from", "where", "group", "order", "by", "as", "with",
      "and", "or", "not", "on", "join", "left", "right", "full", "inner",
      "cross", "case", "when", "then", "else", "end", "cast", "over",
      "partition", "rows", "range", "between", "unbounded", "preceding",
      "following", "current", "row", "is", "null", "in", "like", "ilike",
      "distinct", "union", "all", "except", "intersect", "having",
      "limit", "offset", "asc", "desc", "nulls", "first", "last",
      "double", "bigint", "hugeint", "decimal", "varchar", "integer",
      "boolean", "date", "timestamp", "interval", "exists", "lateral",
      "recursive", "values", "using", "true", "false", "filter", "within",
      // interval units (INTERVAL 1 DAY) — keywords, not identifiers
      "day", "month", "year", "hour", "minute", "second", "week")
    val bad = OracleSql.all.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val noComments = sql.linesIterator
          .map(l => l.indexOf("--") match {
            case -1 => l
            case i  => l.substring(0, i)
          })
          .mkString("\n")
          // string literals ('%m', 'DAY', ...) are not identifiers
          .replaceAll("'[^']*'", "''")
        val as = aliases(sql).toSet
        val refs = ident
          .findAllIn(noComments)
          .filterNot(t => keywords.contains(t.toLowerCase))
          .toSet
        val hits = for {
          a <- as.toSeq
          r <- refs
          if a != r && a.equalsIgnoreCase(r)
        } yield s"$a vs $r"
        if (hits.isEmpty) Nil
        else Seq(s"$name: ${hits.distinct.sorted.mkString(", ")}")
    }
    assert(
      bad.isEmpty,
      s"\naliases case-folding onto other identifiers:\n" +
        bad.mkString("\n"))
  }
}
