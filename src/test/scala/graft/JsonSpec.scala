package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.http._

/** Property round-trip for the zero-dep JSON codec behind the HTTP
  * facade: parse(render(v)) == v for arbitrary nested values (200
  * deterministic ScalaCheck samples — the scalatest/scalacheck bridge
  * artifact isn't on the classpath, so sampling is explicit), plus the
  * escaping and malformed-input edges the generator can't hit. */
class JsonSpec extends AnyFunSuite {

  private val genString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\r', '\t', ' ', '{', '}',
      '[', ']', ':', ',', '$', '#', 'é', '中', ''))).map(_.mkString)

  private val genLeaf: Gen[JVal] = Gen.oneOf(
    Gen.const(JNull),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(n => JNum(BigDecimal(n))),
    genString.map(JStr(_)))

  private def genVal(depth: Int): Gen[JVal] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.listOfN(3, genVal(depth - 1)).map(xs => JArr(xs.toVector)),
      1 -> Gen.listOfN(3, Gen.zip(genString, genVal(depth - 1)))
        .map(fs => JObj(fs.toVector)))

  test("parse(render(v)) == v for arbitrary nested values") {
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val v = genVal(3).pureApply(params, Seed(i.toLong))
      assert(Json.parse(v.render) == v, s"seed $i: ${v.render}")
    }
  }

  test("control characters and quotes survive a round trip inside keys and values") {
    val v = JObj.of("a\"b\\c\nd\te" -> JStr("x\"y\\z\r\n\t中"))
    assert(Json.parse(v.render) == v)
  }

  test("doubles render without precision loss") {
    val v = JArr(Vector(JNum(BigDecimal("0.1")), JNum(BigDecimal("-1.5e10")),
      JNum(BigDecimal("12345678901234567890"))))
    assert(Json.parse(v.render) == v)
  }

  test("malformed input fails with IllegalArgumentException, never hangs") {
    for (bad <- Seq("", "{", "[1,", "{\"a\":}", "\"unterminated", "tru",
        "{\"a\" 1}", "[1 2]", "nul", "{}}", "--3"))
      assertThrows[IllegalArgumentException](Json.parse(bad))
  }
}
