package graft.core

import graft.engine.Coordinate
import graft.json.{JObj, JString}
import graft.streaming.DedupChannels
import org.scalatest.funsuite.AnyFunSuite

/** API value-type conformance: Coordinate (sor-api CoordinateTest) and
  * dedup queue channel naming (event/api DedupEventStoreChannelsTest). */
class ApiTypesSpec extends AnyFunSuite {

  test("coordinate format, json form, equality (CoordinateTest)") {
    val coord = Coordinate.of("my-table", "my-id")
    assert(coord.table === "my-table" && coord.id === "my-id")
    assert(coord.toString === "my-table/my-id")
    assert(coord.asJson === JObj(Map(
      "~table" -> JString("my-table"), "~id" -> JString("my-id"))))
    assert(coord === Coordinate.of("my-table", "my-id"))
    assert(coord !== Coordinate.of("my-table", "my-id2"))
    assert(coord !== Coordinate.of("my-table2", "my-id"))
    assert(coord.hashCode === Coordinate.of("my-table", "my-id").hashCode)
    assert(Coordinate.parse(coord.toString) === coord)
    assert(Coordinate.fromJson(coord.asJson) === coord)
  }

  test("coordinate parse failures") {
    intercept[IllegalArgumentException](Coordinate.parse("abc"))
    intercept[IllegalArgumentException](Coordinate.parse("/id"))
    intercept[IllegalArgumentException](Coordinate.parse("Review/id"))
    intercept[IllegalArgumentException](Coordinate.parse("review/"))
  }

  test("coordinate id may contain any character including slashes") {
    val id = "/ \t\nĀ'\""
    assert(Coordinate.parse("review/" + id) === Coordinate.of("review", id))
  }

  test("coordinate json form requires both intrinsics") {
    intercept[NullPointerException](
      Coordinate.fromJson(JObj(Map("~id" -> JString("my-id")))))
    intercept[NullPointerException](
      Coordinate.fromJson(JObj(Map("~table" -> JString("my-table")))))
  }

  test("isolated dedup channels (DedupEventStoreChannelsTest)") {
    val ch = DedupChannels.isolated("__write:", "__read:")
    assert(ch.writeChannel("test") === "__write:test")
    assert(ch.readChannel("test") === "__read:test")
    assert(ch.queueFromWriteChannel("__write:test") === Some("test"))
    assert(ch.queueFromWriteChannel("__read:test") === None)
    assert(ch.queueFromReadChannel("__read:test") === Some("test"))
    assert(ch.queueFromReadChannel("__write:test") === None)
  }

  test("shared write channel dedup channels") {
    val ch = DedupChannels.sharedWriteChannel("__read:")
    assert(ch.writeChannel("test") === "test")
    assert(ch.readChannel("test") === "__read:test")
    assert(ch.queueFromWriteChannel("test") === Some("test"))
    assert(ch.queueFromWriteChannel("__read:test") === None)
    assert(ch.queueFromReadChannel("__read:test") === Some("test"))
    assert(ch.queueFromReadChannel("test") === None)
  }
}
