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

}
