package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract around Verify: oracle_sql.json must be valid
  * JSON whose keys are a subset of `queries`, and the escaping must
  * survive every control character a SQL string can contain.
  */
class VerifyContractSpec extends AnyFunSuite {

  test("jsonQuote escapes quotes, backslashes and control chars") {
    assert(Verify.jsonQuote("a\"b") === "\"a\\\"b\"")
    assert(Verify.jsonQuote("a\\b") === "\"a\\\\b\"")
    assert(Verify.jsonQuote("line1\nline2\ttab\rcr") === "\"line1\\nline2\\ttab\\rcr\"")
    assert(Verify.jsonQuote("bell") === "\"bell\\u0007\"")
    assert(Verify.jsonQuote("plain sql SELECT 1") === "\"plain sql SELECT 1\"")
  }

  test("oracleJson is parseable and its keys are declared queries") {
    val json = Verify.oracleJson
    // minimal structural validation without a JSON lib: the driver
    // parses with python json.loads; here we at least round-trip the
    // quoting rules and key containment
    assert(json.startsWith("{") && json.endsWith("}"))
    val queryNames = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(queryNames.contains(k), s"oracle for undeclared query $k")
      assert(json.contains(Verify.jsonQuote(k)))
    }
    // no raw control characters may survive into the payload
    assert(!json.exists(c => c < ' '))
  }

  test("every SURVEY §2 query key is implemented, and every query is inventoried") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    // inventory keys appear as backticked `<key>` cells in the §2
    // tables; query keys all match this prefix grammar
    val keyRe = """`((?:ev|q|q\d|dd|ann|tx|mm|pipeline)[0-9a-z_]*)`""".r
    val inventoried = keyRe.findAllMatchIn(survey).map(_.group(1)).toSet
      .filter(k => k.contains("_"))
    val implemented = SparkEntry.queries.keySet
    val missingImpl = inventoried -- implemented
    assert(missingImpl.isEmpty,
      s"SURVEY §2 declares queries with no implementation: $missingImpl")
    val unlisted = implemented -- inventoried
    assert(unlisted.isEmpty,
      s"implemented queries missing from the SURVEY §2 inventory: $unlisted")
  }
}
