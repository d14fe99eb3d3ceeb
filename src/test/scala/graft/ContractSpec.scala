package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Machine-checks the SURVEY.md §2 contract against the shipped maps:
  * every declared O/Q operator id must be in `SparkEntry.queries`, every
  * O id in `SparkEntry.oracleSql`, U-tier ids in neither, and no oracle
  * without a query. Keeps the doc and the code from drifting. */
class ContractSpec extends AnyFunSuite {

  private val survey = java.nio.file.Files
    .readAllLines(java.nio.file.Paths.get("/root/repo/SURVEY.md"))
    .asScala.mkString("\n")

  // table rows: | q_id | ... | Ver | — capture id + trailing Ver tier
  private val rowRe =
    """\|\s*(q_[a-z0-9_]+)\s*\|.*\|\s*([OQU])\b[^|]*\|?\s*$""".r
  private val declared: Map[String, String] = survey.linesIterator
    .flatMap {
      case rowRe(id, ver) => Some(id -> ver)
      case _ => None
    }.toMap

  test("SURVEY declares the expected inventory size") {
    assert(declared.size == 435, s"got ${declared.size}")
    assert(declared.values.count(_ == "O") == 435)
    assert(declared.values.count(_ == "Q") == 0)
    assert(declared.values.count(_ == "U") == 0)
  }

  test("SURVEY's totals prose matches the declared-row census") {
    // the round-11/12 drift class: table rows grow every batch, the
    // prose totals don't — parse the prose and fail the suite on skew
    val totalsRe =
      """\*\*Totals: (\d+) declared operators — (\d+) `O`[^,]*, (\d+) `Q`""".r
    val m = totalsRe.findFirstMatchIn(survey)
      .getOrElse(fail("totals prose not found in SURVEY.md"))
    assert(m.group(1).toInt == declared.size,
      s"prose total ${m.group(1)} != census ${declared.size}")
    assert(m.group(2).toInt == declared.values.count(_ == "O"),
      s"prose O ${m.group(2)} != census ${declared.values.count(_ == "O")}")
    assert(m.group(3).toInt == declared.values.count(_ == "Q"),
      s"prose Q ${m.group(3)} != census ${declared.values.count(_ == "Q")}")
    val uRe = """, (\d+) `U`""".r
    val mu = uRe.findFirstMatchIn(survey)
      .getOrElse(fail("U-tier prose count not found in SURVEY.md"))
    assert(mu.group(1).toInt == declared.values.count(_ == "U"),
      s"prose U ${mu.group(1)} != census ${declared.values.count(_ == "U")}")
    val mapRe =
      """queries` map must contain the (\d+) `O`\+`Q` IDs; `oracleSql`\s*\nthe (\d+) `O` IDs""".r
    val mm = mapRe.findFirstMatchIn(survey)
      .getOrElse(fail("queries/oracleSql prose counts not found"))
    assert(mm.group(1).toInt == declared.values.count(_ != "U"),
      s"prose O+Q ${mm.group(1)} != census ${declared.values.count(_ != "U")}")
    assert(mm.group(2).toInt == declared.values.count(_ == "O"),
      s"prose oracle ${mm.group(2)} != census ${declared.values.count(_ == "O")}")
  }

  test("every declared O/Q operator has a queries entry") {
    val missing = declared.collect {
      case (id, v) if v != "U" && !SparkEntry.queries.contains(id) => id
    }
    assert(missing.isEmpty, s"missing queries: $missing")
  }

  test("every declared O operator has oracle SQL; Q/U have none") {
    val missingOracle = declared.collect {
      case (id, "O") if !SparkEntry.oracleSql.contains(id) => id
    }
    assert(missingOracle.isEmpty, s"missing oracle: $missingOracle")
    val extraOracle = declared.collect {
      case (id, v) if v != "O" && SparkEntry.oracleSql.contains(id) => id
    }
    assert(extraOracle.isEmpty, s"non-O ids with oracle: $extraOracle")
  }

  test("no undeclared queries or orphan oracle SQL") {
    val undeclared = SparkEntry.queries.keySet -- declared.keySet
    assert(undeclared.isEmpty, s"queries not in SURVEY §2: $undeclared")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }
}
