package graft.exec

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Storage-lifecycle property test: a deterministic pseudo-random
  * interleaving of DML with SNAPSHOT, OPTIMIZE (clustered versioned
  * rewrites), and VACUUM RETAIN, checked against an in-memory model
  * after EVERY operation — current state always, and a remembered
  * historical state via time travel whenever it is still above the
  * retention floor. This is the combination the round's new machinery
  * (keyed collapse, tail-based snapshots, versioned rewrite dirs,
  * physical reclamation) must survive together, not just in isolation.
  */
class StoragePropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("random DML x snapshot x optimize x vacuum never diverges from the model") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, grp STRING, v BIGINT)")
    val rnd = new scala.util.Random(0xBEEF)
    val model = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Long)]
    var seq = 0L // mirrors the engine's sequence counter
    var floor = 0L
    var nextKey = 0L
    // remembered (sequence, model snapshot) for time-travel checks
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, (String, Long)])]

    def engineState(): Set[(Long, String, Long)] =
      e.sql("SELECT k, grp, v FROM t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def modelState(m: Map[Long, (String, Long)]): Set[(Long, String, Long)] =
      m.map { case (k, (g, v)) => (k, g, v) }.toSet

    for (step <- 1 to 40) {
      rnd.nextInt(8) match {
        case 0 | 1 => // insert 1-3 fresh keys
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextKey += 1; seq += 1
            val g = ("g" + rnd.nextInt(3))
            val v = rnd.nextInt(100).toLong
            model(nextKey) = (g, v)
            s"($nextKey, '$g', $v)"
          }
          e.sql(s"INSERT INTO t VALUES ${rows.mkString(", ")}")
        case 2 if model.nonEmpty => // update one existing key
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          val v = rnd.nextInt(100).toLong
          seq += 1
          model(k) = (model(k)._1, v)
          e.sql(s"UPDATE t SET v = $v WHERE k = $k")
        case 3 if model.nonEmpty => // delete one existing key
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          seq += 1
          model.remove(k)
          e.sql(s"DELETE FROM t WHERE k = $k")
        case 4 => e.sql("SNAPSHOT t")
        case 5 =>
          if (rnd.nextBoolean()) e.sql("OPTIMIZE t")
          else e.sql("OPTIMIZE t ZORDER BY (grp, v)")
        case 6 if seq > floor => // vacuum at a boundary in (floor, seq]
          val retain = floor + 1 + rnd.nextInt((seq - floor).toInt)
          e.sql(s"VACUUM t RETAIN @SEQ:$retain")
          floor = retain
          history.filterInPlace(_._1 > floor) // below-floor reads now raise
        case _ => // remember the current boundary for later time travel
          history.append((seq, model.toMap))
      }
      assert(engineState() === modelState(model.toMap), s"diverged at step $step")
      if (history.nonEmpty && rnd.nextInt(3) == 0) {
        val (hSeq, hModel) = history(rnd.nextInt(history.size))
        val at = e.sql(s"SELECT k, grp, v FROM t FOR SYSTEM_TIME AS OF @SEQ:$hSeq")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(at === modelState(hModel), s"time travel diverged at step $step (seq $hSeq)")
      }
    }
    e.close()
  }
}
