package graft.state

import graft.TestSpark
import graft.log.EventLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** State-collapse semantics against a plain-Scala reimplementation of
  * the reference fold (table_storage.rs:364-427): INSERT replaces the
  * document, PATCH merges non-null fields into an EXISTING row (no-op
  * on absent keys), SOFT_DELETE removes. The Spark operator must match
  * this fold on arbitrary event logs — including the
  * patch-after-delete and delete-reinsert shapes the reference
  * exercises.
  */
class StateViewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (seq, pk, type, a, b) — a/b are the payload columns. */
  type Ev = (Long, Int, String, Option[Int], Option[Int])

  private def toLog(events: Seq[Ev]): DataFrame = {
    val df = events.toDF("sequence", "pkv", "event_type", "a", "b")
    df.select(col("sequence"),
      timestamp_seconds(lit(EventLog.ClockEpoch) + col("sequence")).as("ts"),
      col("event_type"),
      col("pkv").cast("string").as("pk"),
      struct(col("pkv").as("id"), col("a"), col("b")).as("payload"))
  }

  /** The reference fold, full-row patch semantics: PATCH replaces the
    * whole doc (the SQL layer always patches full rows). */
  private def foldFullRow(events: Seq[Ev], upTo: Long): Map[Int, (Option[Int], Option[Int])] =
    events.filter(_._1 <= upTo).sortBy(_._1)
      .foldLeft(Map.empty[Int, (Option[Int], Option[Int])]) {
        case (st, (_, pk, "INSERT", a, b)) => st + (pk -> (a, b))
        case (st, (_, pk, "PATCH", a, b)) =>
          if (st.contains(pk)) st + (pk -> (a, b)) else st // no-op on absent
        case (st, (_, pk, "SOFT_DELETE", _, _)) => st - pk
        case (st, _) => st
      }

  /** The reference fold, partial-patch semantics: PATCH merges only
    * its non-null fields into an existing doc. */
  private def foldMerging(events: Seq[Ev], upTo: Long): Map[Int, (Option[Int], Option[Int])] =
    events.filter(_._1 <= upTo).sortBy(_._1)
      .foldLeft(Map.empty[Int, (Option[Int], Option[Int])]) {
        case (st, (_, pk, "INSERT", a, b)) => st + (pk -> (a, b))
        case (st, (_, pk, "PATCH", a, b)) =>
          st.get(pk).fold(st) { case (oa, ob) =>
            st + (pk -> (a.orElse(oa), b.orElse(ob)))
          }
        case (st, (_, pk, "SOFT_DELETE", _, _)) => st - pk
        case (st, _) => st
      }

  private def collapseFullRow(events: Seq[Ev], upTo: Option[Long]): Map[Int, (Option[Int], Option[Int])] =
    StateView.stateAt(toLog(events), upTo).collect().map { r =>
      r.getAs[Int]("id") -> (Option(r.getAs[Any]("a")).map(_.asInstanceOf[Int]),
        Option(r.getAs[Any]("b")).map(_.asInstanceOf[Int]))
    }.toMap

  private def collapseMerging(events: Seq[Ev]): Map[Int, (Option[Int], Option[Int])] =
    StateView.stateMergingPatches(toLog(events), Seq("id", "a", "b"))
      .collect().map { r =>
        r.getAs[Int]("id") -> (Option(r.getAs[Any]("a")).map(_.asInstanceOf[Int]),
          Option(r.getAs[Any]("b")).map(_.asInstanceOf[Int]))
      }.toMap

  test("insert-patch-delete basic collapse") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(10), Some(20)),
      (2, 1, "PATCH", Some(11), Some(21)),
      (3, 2, "INSERT", Some(30), Some(40)),
      (4, 2, "SOFT_DELETE", None, None))
    assert(collapseFullRow(log, None) === Map(1 -> (Some(11), Some(21))))
  }

  test("a PATCH after SOFT_DELETE must not resurrect the row") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(10), Some(20)),
      (2, 1, "SOFT_DELETE", None, None),
      (3, 1, "PATCH", Some(99), Some(99)))
    assert(collapseFullRow(log, None) === Map.empty)
    assert(collapseMerging(log) === Map.empty)
  }

  test("a PATCH with no prior INSERT is a no-op") {
    val log = Seq[Ev]((1, 7, "PATCH", Some(1), Some(2)))
    assert(collapseFullRow(log, None) === Map.empty)
  }

  test("delete then re-insert starts a fresh epoch") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(1), Some(2)),
      (2, 1, "SOFT_DELETE", None, None),
      (3, 1, "INSERT", Some(3), None),
      (4, 1, "PATCH", None, Some(4)))
    // merging fold: b=2 from the deleted epoch must NOT leak through
    assert(collapseMerging(log) === Map(1 -> (Some(3), Some(4))))
  }

  test("a later INSERT replaces the whole document (merge fold resets)") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(1), Some(2)),
      (2, 1, "INSERT", Some(9), None))
    assert(collapseMerging(log) === Map(1 -> (Some(9), None)))
  }

  test("time travel: state at each sequence matches the fold") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(1), Some(1)),
      (2, 2, "INSERT", Some(2), Some(2)),
      (3, 1, "PATCH", Some(10), Some(10)),
      (4, 2, "SOFT_DELETE", None, None),
      (5, 2, "INSERT", Some(20), Some(20)))
    for (s <- 1L to 5L)
      assert(collapseFullRow(log, Some(s)) === foldFullRow(log, s), s"at seq $s")
  }

  test("stateAsOfTimestamp resolves ts to max sequence <= cutoff") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(1), None),
      (2, 1, "PATCH", Some(2), None),
      (3, 1, "PATCH", Some(3), None))
    val at2 = StateView.stateAsOfTimestamp(toLog(log),
      timestamp_seconds(lit(EventLog.ClockEpoch + 2)))
    assert(at2.collect().map(_.getAs[Int]("a")).toSeq === Seq(2))
    val before = StateView.stateAsOfTimestamp(toLog(log),
      timestamp_seconds(lit(EventLog.ClockEpoch - 10)))
    assert(before.count() === 0)
  }

  // ------------------------------------------------------- properties

  private val genEvent: Gen[(Int, String, Option[Int], Option[Int])] = for {
    pk <- Gen.choose(1, 4)
    tpe <- Gen.frequency(4 -> "INSERT", 3 -> "PATCH", 2 -> "SOFT_DELETE")
    a <- Gen.option(Gen.choose(0, 99))
    b <- Gen.option(Gen.choose(0, 99))
  } yield (pk, tpe, a, b)

  private val genLog: Gen[Seq[Ev]] =
    Gen.listOfN(12, genEvent).map(_.zipWithIndex.map {
      case ((pk, t, a, b), i) => (i.toLong + 1, pk, t, a, b)
    })

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  test("property: merging collapse equals the reference fold") {
    check(Prop.forAll(genLog) { log =>
      collapseMerging(log) == foldMerging(log, Long.MaxValue)
    })
  }

  test("property: full-row collapse equals the full-row fold") {
    // full-row semantics need non-null payloads on INSERT/PATCH — the
    // SQL layer always writes full rows
    val fullLog = genLog.map(_.map(e => e.copy(_4 = e._4.orElse(Some(0)),
      _5 = e._5.orElse(Some(0)))))
    check(Prop.forAll(fullLog) { log =>
      collapseFullRow(log, None) == foldFullRow(log, Long.MaxValue)
    })
  }

  test("property: two-bound collapse equals two independent keyed collapses") {
    // the fused refresh read (round 16): for ANY log and ANY r < h,
    // twoBoundKeyed over events <= h must flag exactly the rows the
    // separate stateAtKeyed collapses at r and at h would return
    val fullLog = genLog.map(_.map(e => e.copy(_4 = e._4.orElse(Some(0)),
      _5 = e._5.orElse(Some(0)))))
    val gen = for {
      log <- fullLog
      r <- Gen.choose(0L, log.size.toLong)
      h <- Gen.choose(r, log.size.toLong)
    } yield (log, r, h)
    def side(df: DataFrame): Set[String] =
      df.select("id", "a", "b").collect().map(_.toString).toSet
    check(Prop.forAll(gen) { case (log, r, h) =>
      val bounded = toLog(log).where(col("sequence") <= h)
      val fused = StateView.twoBoundKeyed(bounded, r, "id")
      val oldGot = side(fused.where(col(StateView.OldWinCol)))
      val newGot = side(fused.where(col(StateView.NewWinCol)))
      val oldWant = side(StateView.stateAtKeyed(toLog(log), Some(r), "id"))
      val newWant = side(StateView.stateAtKeyed(toLog(log), Some(h), "id"))
      oldGot == oldWant && newGot == newWant
    })
  }

  test("property: collapse is idempotent (collapse of a collapsed log is itself)") {
    check(Prop.forAll(genLog) { log =>
      val once = Snapshots.collapsedAsInserts(toLog(log), None)
      val twice = StateView.stateAt(once, None).collect()
        .map(r => (r.getAs[Int]("id"), Option(r.getAs[Any]("a")), Option(r.getAs[Any]("b"))))
        .toSet
      val direct = StateView.stateAt(toLog(log), None).collect()
        .map(r => (r.getAs[Int]("id"), Option(r.getAs[Any]("a")), Option(r.getAs[Any]("b"))))
        .toSet
      twice == direct
    })
  }

  test("property: temporal monotonicity — live keys at s are a subset of pks seen by s") {
    check(Prop.forAll(genLog, Gen.choose(1L, 12L)) { (log, s) =>
      val seen = log.filter(_._1 <= s).map(_._2).toSet
      collapseFullRow(log, Some(s)).keySet.subsetOf(seen)
    })
  }

  test("snapshot + tail replay equals full replay") {
    val log = Seq[Ev](
      (1, 1, "INSERT", Some(1), Some(1)),
      (2, 2, "INSERT", Some(2), Some(2)),
      (3, 1, "PATCH", Some(3), Some(3)),
      (4, 3, "INSERT", Some(4), Some(4)),
      (5, 2, "SOFT_DELETE", None, None),
      (6, 3, "PATCH", Some(6), Some(6)))
    val full = toLog(log)
    for (cut <- 1L to 6L) {
      val snap = Snapshots.collapsedAsInserts(full.where(col("sequence") <= cut), None)
      val tail = full.where(col("sequence") > cut)
      val replayed = StateView.stateAt(snap.unionByName(tail), None).collect()
        .map(r => (r.getAs[Int]("id"), r.getAs[Any]("a"))).toSet
      val direct = StateView.stateAt(full, None).collect()
        .map(r => (r.getAs[Int]("id"), r.getAs[Any]("a"))).toSet
      assert(replayed === direct, s"cut at $cut")
    }
  }

  test("keyed collapse survives ALTER add/rename across snapshot + tail") {
    val e = graft.exec.QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    e.sql("SNAPSHOT t") // pre-ALTER checkpoint: payload lacks the new column
    e.sql("ALTER TABLE t ADD COLUMN w BIGINT")
    e.sql("INSERT INTO t VALUES (3, 'c', 30)")
    e.sql("UPDATE t SET w = 10 WHERE k = 1")
    e.sql("ALTER TABLE t RENAME COLUMN v TO label")
    // point lookup through the keyed collapse over mixed-schema files
    assert(e.sql("SELECT k, label, w FROM t WHERE k = 1").collect().map(_.toString).toSeq
      === Seq("[1,a,10]"))
    // pre-ALTER rows read NULL for the added column; renamed column maps
    assert(e.sql("SELECT k, label, w FROM t ORDER BY k").collect().map(_.toString).toSeq
      === Seq("[1,a,10]", "[2,b,null]", "[3,c,30]"))
    // time travel below the ALTER still collapses correctly
    assert(e.sql("SELECT k, label FROM t FOR SYSTEM_TIME AS OF @SEQ:2 ORDER BY k")
      .collect().map(_.toString).toSeq === Seq("[1,a]", "[2,b]"))
    e.close()
  }
}
