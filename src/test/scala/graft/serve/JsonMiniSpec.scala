package graft.serve

import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r11 bulk-encode fast path (`JsonMini.rows` — names escaped
  * once per chunk, cells appended into one builder) BYTE-identical to
  * the per-row compositional form it replaced. A drift here would not
  * fail any protocol spec (clients parse either) but would silently
  * change the wire bytes a recorded client fixture expects.
  */
class JsonMiniSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("value", DoubleType),
    StructField("count", IntegerType),
    StructField("label \"x\"\\y", StringType), // name needing escapes
    StructField("note", StringType)))

  private def row(ts: Any, v: Any, c: Any, l: Any, n: Any) =
    new GenericRowWithSchema(Array[Any](ts, v, c, l, n), schema)

  test("rows() fast path is byte-identical to the per-row form") {
    val rs = Seq(
      row(1704067200L, 1.5, 7, "plain", "quote\" slash\\ tab\tnl\n"),
      row(null, Double.NaN, null, "控制char", null),
      row(2L, Double.PositiveInfinity, -1, "", "end"))
    val slow = rs.map(JsonMini.row).mkString("[", ",", "]")
    assert(JsonMini.rows(rs) === slow)
    assert(JsonMini.rows(Nil) === "[]")
    // and the frame the server would actually send parses back: NaN and
    // Infinity encode as null (JSON has no such literals)
    assert(slow.contains("null"))
  }
}
