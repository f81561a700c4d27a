package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Verify's oracle_sql.json with a strict JSON parser;
  * a malformed escape would silently zero the round's correctness table.
  * Pin the escaping against a real parser and the actual oracle map. */
class VerifyContractSpec extends AnyFunSuite {

  private def parse(json: String): Map[String, String] = {
    // strict parse via the JDK scripting-free route: Jackson ships with
    // Spark — same family the driver's python json.load enforces
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }

  test("the real oracle payload round-trips through a strict JSON parser") {
    val parsed = parse(Verify.oracleJson)
    assert(parsed.keySet == SparkEntry.oracleSql.keySet)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(parsed(k) == v, s"oracle SQL for $k corrupted by escaping")
    }
    // every driver query has an oracle and vice versa
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("escaping survives quotes, backslashes, and control characters") {
    val nasty = "a\"b\\c\nd\re\tfg"
    val parsed = parse(s"{${Verify.escapeJson("k")}: ${Verify.escapeJson(nasty)}}")
    assert(parsed("k") == nasty)
  }
}
