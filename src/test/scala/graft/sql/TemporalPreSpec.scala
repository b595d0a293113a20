package graft.sql

import org.scalatest.funsuite.AnyFunSuite

class TemporalPreSpec extends AnyFunSuite {

  test("AS OF @SEQ:N") {
    val (clean, st) = TemporalPre.extract(
      "SELECT * FROM t FOR SYSTEM_TIME AS OF @SEQ:42 WHERE x = 1")
    assert(st === SystemTime.AsOfSeq(42))
    assert(!clean.toUpperCase.contains("SYSTEM_TIME"))
    assert(clean.contains("WHERE x = 1"))
  }

  test("AS OF timestamp literal") {
    val (clean, st) = TemporalPre.extract(
      "SELECT * FROM t FOR SYSTEM_TIME AS OF '2020-01-01 08:20:00'")
    assert(st === SystemTime.AsOfTs("2020-01-01 08:20:00"))
    assert(!clean.toUpperCase.contains("SYSTEM_TIME"))
  }

  test("SYSTEM_TIME ALL") {
    val (clean, st) = TemporalPre.extract(
      "SELECT * FROM t FOR SYSTEM_TIME ALL ORDER BY 1")
    assert(st === SystemTime.All)
    assert(clean.contains("ORDER BY 1"))
  }

  test("BETWEEN and FROM..TO sequence ranges") {
    assert(TemporalPre.extract(
      "SELECT * FROM t FOR SYSTEM_TIME BETWEEN 10 AND 20")._2 ===
      SystemTime.Between(10, 20))
    assert(TemporalPre.extract(
      "SELECT * FROM t FOR SYSTEM_TIME FROM 5 TO 9")._2 ===
      SystemTime.Between(5, 9))
  }

  test("no clause → Current, text untouched") {
    val sql = "SELECT a FROM t WHERE b > 2"
    assert(TemporalPre.extract(sql) === ((sql, SystemTime.Current)))
  }

  test("case-insensitive and multiline") {
    val (_, st) = TemporalPre.extract(
      "select *\nfrom t\nfor system_time as of @SEQ:7")
    assert(st === SystemTime.AsOfSeq(7))
  }
}
