package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MessageParser, MessageSchema}

/** Weighted-model parsing (reference messages/base.py:122): a raw JSON
  * deserializes as the most specific registered shape it satisfies.
  */
class MessageParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val superset = StructType(Seq(
    StructField("event", StringType),
    StructField("message_id", StringType),
    StructField("response_to", StringType),
    StructField("data", StringType)))

  private val registry = Seq(
    MessageSchema("response", Seq("event", "message_id", "response_to")),
    MessageSchema("echo", Seq("event", "message_id"), eventLiteral = Some("echo_message")),
    MessageSchema("generic_data", Seq("event", "data")),
    MessageSchema("bare", Seq("event")))

  private def parse(jsons: String*) =
    MessageParser.parse(jsons.zipWithIndex.map(_.swap).toDF("id", "js"),
        col("js"), registry, superset)
      .orderBy(col("id")).select(col("schema_name"))
      .collect().map(_.getString(0)).toSeq

  test("most specific satisfied schema wins by weight") {
    assert(parse(
      """{"event": "x_response", "message_id": "m2", "response_to": "m1"}""",
      """{"event": "echo_message", "message_id": "m3"}""",
      """{"event": "update", "data": "payload"}""",
      """{"event": "ping"}""") ==
      Seq("response", "echo", "generic_data", "bare"))
  }

  test("event literal bonus outranks equal required-field count") {
    // echo (2 required + literal, weight 7) beats a hypothetical
    // 2-field schema without literal (weight 4)
    assert(MessageSchema("echo", Seq("event", "message_id"), Some("echo_message")).weight >
      MessageSchema("other", Seq("event", "message_id")).weight)
  }

  test("unsatisfiable and malformed inputs fall through") {
    assert(parse("""{"message_id": "only"}""", "not json at all") ==
      Seq("generic", "unparseable"))
  }

  test("type-coercion failure demotes to a less specific shape, not unparseable") {
    // valid JSON whose `data` field can't coerce to the superset type:
    // the reference's json-then-rank semantics null the bad field and
    // fall through the ranking; only non-JSON is unparseable
    val typed = StructType(Seq(
      StructField("event", StringType), StructField("data", LongType)))
    val reg = Seq(
      MessageSchema("keyed", Seq("event", "data")),
      MessageSchema("bare", Seq("event")))
    val out = MessageParser.parse(
        Seq((0, """{"event": "x", "data": {"nested": true}}"""),
          (1, """{"event": "y", "data": 5}""")).toDF("id", "js"),
        col("js"), reg, typed)
      .orderBy(col("id")).select(col("schema_name"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("bare", "keyed"))
  }
}
