package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.OtlpProtoOps

/** Property-based check of the protobuf wire codec at the JVM level
  * (no Spark jobs): for ANY record — unicode bodies, quotes,
  * backslashes, control characters, emoji — encode → decode must
  * yield VALID JSON whose envelope fields equal the inputs exactly.
  * This is the robustness the intake needs before real collector
  * payloads hit it.
  */
class OtlpProtoPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  private val nastyString: Gen[String] = Gen.frequency(
    3 -> Gen.asciiPrintableStr,
    2 -> Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar, Gen.choose(' ', '⿿'))).map(_.mkString),
    1 -> Gen.oneOf(
      "line\nbreak\ttab\r", "quote\"back\\slash", "", "naïve café — emoji 🚀",
      "ctrl", "json{\"k\":[1,2]}", " leading and trailing "),
  )

  private val hexChars = "0123456789abcdef"
  private def hexStr(n: Int): Gen[String] =
    Gen.listOfN(n, Gen.oneOf(hexChars.toSeq)).map(_.mkString)

  private val recordGen = for {
    timeUs <- Gen.chooseNum(0L, 4102444800000000L) // through year 2100
    svc <- nastyString
    sevText <- nastyString
    sevNum <- Gen.chooseNum(1, 24)
    body <- nastyString
    trace <- hexStr(32)
    span <- hexStr(16)
    ver <- nastyString
    ns <- nastyString
  } yield (timeUs, svc, sevText, sevNum, body, trace, span, ver, ns)

  test("encode -> decode yields valid JSON with every field preserved, for any input") {
    val mapper = new ObjectMapper
    (1L to 200L).foreach { seed =>
      val (timeUs, svc, sevText, sevNum, body, trace, span, ver, ns) =
        sample(recordGen, seed)
      val row = new GenericInternalRow(Array[Any](
        timeUs, UTF8String.fromString(svc), UTF8String.fromString(sevText),
        sevNum, UTF8String.fromString(body), UTF8String.fromString(trace),
        UTF8String.fromString(span), UTF8String.fromString(ver),
        UTF8String.fromString(ns)))
      val json = OtlpProtoOps.toJson(OtlpProtoOps.encodeFromRow(row)).toString
      val root = mapper.readTree(json) // throws on invalid JSON = test failure
      val rl = root.get("resourceLogs").get(0)
      val resAttr = rl.get("resource").get("attributes").get(0)
      assert(resAttr.get("key").asText == "service.name")
      assert(resAttr.get("value").get("stringValue").asText == svc, s"seed $seed service")
      val sl = rl.get("scopeLogs").get(0)
      assert(sl.get("scope").get("name").asText == "graft")
      assert(sl.get("scope").get("version").asText == ver, s"seed $seed version")
      val scopeAttr = sl.get("scope").get("attributes").get(0)
      assert(scopeAttr.get("key").asText == "code.namespace")
      assert(scopeAttr.get("value").get("stringValue").asText == ns, s"seed $seed ns")
      val lr = sl.get("logRecords").get(0)
      assert(lr.get("timeUnixNano").asText == (timeUs * 1000L).toString, s"seed $seed time")
      assert(lr.get("severityText").asText == sevText, s"seed $seed sevText")
      assert(lr.get("severityNumber").asInt == sevNum, s"seed $seed sevNum")
      assert(lr.get("body").get("stringValue").asText == body, s"seed $seed body")
      assert(lr.get("traceId").asText == trace, s"seed $seed trace")
      assert(lr.get("spanId").asText == span, s"seed $seed span")
    }
  }
}
