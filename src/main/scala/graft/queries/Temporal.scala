package graft.queries

import graft.Tables
import graft.log.EventLog
import graft.state.StateView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-travel operators (SURVEY §2.9) — the reference's distinguishing
  * feature. These queries build a deterministic event log from the
  * `orders` fixture and run the real StateView collapse; the DuckDB
  * oracle recomputes the same fold algebraically over the base table,
  * so the collapse operator itself is what the hash-compare verifies.
  *
  * Synthetic log (integer-only, hence exactly oracle-expressible):
  *   - every order o: INSERT at sequence 3*o_orderkey
  *   - orders with o_orderkey % 7 == 0: full-row PATCH at 3*o+1 setting
  *     o_orderstatus = 'R' (the reference's UPDATE path emits full-row
  *     patches — sql_bridge.rs:5534-5537)
  *   - orders with o_orderkey % 11 == 0: SOFT_DELETE at 3*o+2
  * Event ts = epoch 2020-01-01 + sequence seconds (monotonic with
  * sequence, like the reference's append path).
  */
object Temporal {

  /** Deterministic event log over orders. */
  def ordersEventLog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val ins = EventLog.fromBatch(o, "o_orderkey",
      col("o_orderkey") * 3, lit(null), EventLog.INSERT)
    val patched = o.where(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("R"))
    val pat = EventLog.fromBatch(patched, "o_orderkey",
      col("o_orderkey") * 3 + 1, lit(null), EventLog.PATCH)
    val deleted = o.where(col("o_orderkey") % 11 === 0)
    val del = EventLog.fromBatch(deleted, "o_orderkey",
      col("o_orderkey") * 3 + 2, lit(null), EventLog.SOFT_DELETE)
    ins.union(pat).union(del)
      .withColumn("ts",
        (lit(1577836800L) + col("sequence")).cast("timestamp"))
  }

  /** Current state after all events: deletes gone, patches applied. */
  val qStateCurrent = Q(
    "q_state_current",
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey % 7 = 0 THEN 'R' ELSE o_orderstatus END AS status,
      |       CAST(o_totalprice AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderkey % 11 <> 0
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    StateView.state(ordersEventLog(s, dir))
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"))
      .orderBy("o_orderkey")
  }

  /** FOR SYSTEM_TIME AS OF @SEQ:22501 (sql_bridge.rs:47-78): inserts
    * visible for o <= 7500, patches for o <= 7500, deletes for o <= 7499. */
  val qStateAsOfSeq = Q(
    "q_state_asof_seq",
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey % 7 = 0 AND o_orderkey * 3 + 1 <= 22501
      |            THEN 'R' ELSE o_orderstatus END AS status,
      |       CAST(o_totalprice AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderkey * 3 <= 22501
      |  AND NOT (o_orderkey % 11 = 0 AND o_orderkey * 3 + 2 <= 22501)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    StateView.stateAt(ordersEventLog(s, dir), Some(22501L))
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"))
      .orderBy("o_orderkey")
  }

  /** FOR SYSTEM_TIME AS OF <timestamp> — resolved to max sequence with
    * event ts <= target (engine.rs:2010), here ts = epoch + seq so the
    * cutoff equals seq <= 30000. */
  val qStateAsOfTs = Q(
    "q_state_asof_ts",
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey % 7 = 0 AND o_orderkey * 3 + 1 <= 30000
      |            THEN 'R' ELSE o_orderstatus END AS status
      |FROM orders
      |WHERE o_orderkey * 3 <= 30000
      |  AND NOT (o_orderkey % 11 = 0 AND o_orderkey * 3 + 2 <= 30000)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    // 2020-01-01 00:00:00 UTC + 30000s — built from the epoch second so
    // the cutoff is independent of spark.sql.session.timeZone.
    StateView.stateAsOfTimestamp(ordersEventLog(s, dir),
      timestamp_seconds(lit(1577836800L + 30000L)))
      .select(col("o_orderkey"), col("o_orderstatus").as("status"))
      .orderBy("o_orderkey")
  }

  /** FOR SYSTEM_TIME ALL / drift history (sql_bridge.rs:6494-6556) for
    * a key subset: the full framed event stream. */
  val qDriftHistory = Q(
    "q_drift_history",
    """WITH ev AS (
      |  SELECT o_orderkey * 3 AS sequence, o_orderkey, 'INSERT' AS event_type,
      |         o_orderstatus AS status
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey * 3 + 1, o_orderkey, 'PATCH', 'R'
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 3 + 2, o_orderkey, 'SOFT_DELETE', o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT sequence, o_orderkey AS pk_key, event_type, status
      |FROM ev WHERE o_orderkey % 100 = 0
      |ORDER BY pk_key, sequence""".stripMargin) { (s, dir) =>
    val ev = ordersEventLog(s, dir)
    StateView.history(ev)
      .where(col("payload.o_orderkey") % 100 === 0)
      .select(col("sequence"), col("payload.o_orderkey").as("pk_key"),
        col("event_type"), col("payload.o_orderstatus").as("status"))
      .orderBy("pk_key", "sequence")
  }

  /** FOR SYSTEM_TIME FROM..TO superset (unsupported in the reference —
    * README.md:94-96): change stream within a sequence range. */
  val qChangesBetween = Q(
    "q_changes_between",
    """WITH ev AS (
      |  SELECT o_orderkey * 3 AS sequence, o_orderkey, 'INSERT' AS event_type
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey * 3 + 1, o_orderkey, 'PATCH'
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey * 3 + 2, o_orderkey, 'SOFT_DELETE'
      |  FROM orders WHERE o_orderkey % 11 = 0)
      |SELECT sequence, o_orderkey AS pk_key, event_type
      |FROM ev WHERE sequence BETWEEN 3000 AND 4500
      |ORDER BY sequence, event_type""".stripMargin) { (s, dir) =>
    StateView.changesBetween(ordersEventLog(s, dir), 3000L, 4500L)
      .select(col("sequence"), col("payload.o_orderkey").as("pk_key"),
        col("event_type"))
      .orderBy("sequence", "event_type")
  }

  /** Partial-patch merge fidelity (table_storage.rs:364-427): PATCH
    * events carrying only the changed column; per-column last-non-null
    * fold must recover the full row. */
  val qStateMergePatches = Q(
    "q_state_merge_patches",
    """SELECT o_orderkey,
      |       CASE WHEN o_orderkey % 7 = 0 THEN 'R' ELSE o_orderstatus END AS status,
      |       CAST(o_totalprice AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderkey % 11 <> 0 AND o_orderkey <= 5000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .where(col("o_orderkey") <= 5000)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val ins = EventLog.fromBatch(o, "o_orderkey",
      col("o_orderkey") * 3, lit(null), EventLog.INSERT)
    // partial patch: only o_orderstatus set, other payload columns null
    val patched = o.where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        lit("R").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"))
    val pat = EventLog.fromBatch(patched, "o_orderkey",
        col("o_orderkey") * 3 + 1, lit(null), EventLog.PATCH)
      // a partial patch must not resurrect the pk payload column either:
      .withColumn("payload", struct(
        lit(null).cast("long").as("o_orderkey"),
        col("payload.o_orderstatus").as("o_orderstatus"),
        col("payload.o_totalprice").as("o_totalprice")))
    val del = EventLog.fromBatch(o.where(col("o_orderkey") % 11 === 0),
      "o_orderkey", col("o_orderkey") * 3 + 2, lit(null), EventLog.SOFT_DELETE)
    val ev = ins.union(pat).union(del)
      .withColumn("ts", (lit(1577836800L) + col("sequence")).cast("timestamp"))
    StateView.stateMergingPatches(ev,
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_totalprice").cast("double").as("total"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(
    qStateCurrent, qStateAsOfSeq, qStateAsOfTs, qDriftHistory,
    qChangesBetween, qStateMergePatches)
}
