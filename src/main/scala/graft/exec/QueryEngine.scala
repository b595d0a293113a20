package graft.exec

import graft.catalog.{ColumnDef, TableCatalog, TableDef}
import graft.log.EventLog
import graft.sql.{IncrementalView, SqlText, Statement, StatementRouter, SystemTime, TemporalPre}
import graft.state.{Snapshots, StateView}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StructField, StructType}

/** The engine shell: `engine.sql(query): DataFrame` — the single entry
  * point the reference exposes as `execute_sql` (sql_bridge.rs:234-237).
  *
  * Lifecycle of a statement (mirrors execute_sql_inner,
  * sql_bridge.rs:274-757, re-expressed Spark-first — SURVEY §3.3):
  *   1. StatementRouter classifies DDL / DML / utility / query.
  *   2. Queries: TemporalPre strips `FOR SYSTEM_TIME ...` at string
  *      level (sql_bridge.rs:304-320); every referenced engine table is
  *      registered as a temp view resolved at that point in time
  *      (state collapse, history, or change range); stored views are
  *      expanded recursively (sql_bridge.rs:1203-1259); the cleaned
  *      text is delegated to `spark.sql` — Catalyst owns parsing,
  *      optimization, and execution from there.
  *   3. DML: INSERT / UPDATE / DELETE / TRUNCATE become Insert / Patch
  *      / SoftDelete event appends with monotonic sequence assignment
  *      and parquet persistence (sql_bridge.rs:3505-3663, 5473-5668,
  *      5981-6088; table_storage.rs:212). UPDATE emits full-row
  *      patches, exactly like the reference's SQL layer
  *      (sql_bridge.rs:5534-5537, 5637-5649).
  *
  * Every statement returns a DataFrame (DML returns an affected-rows
  * summary), so the surface is uniform and lazy where possible.
  *
  * Name scoping: engine tables resolve through session temp views that
  * are (re-)registered by every statement before it runs, so multiple
  * engines over different base dirs can share one SparkSession with
  * SERIAL use — each statement re-resolves its own names even if
  * another engine registered the same name in between (covered by the
  * two-engines test in QueryEngineSpec). Concurrent statements from two
  * engines sharing a session are not supported — same discipline as the
  * reference's process-global write lock (index.rs:22-26); use one
  * SparkSession per concurrent engine. Two engines over the same BASE
  * DIR are guarded harder: the first write takes an exclusive lock file
  * (BaseDirLock), so a second live writer fails fast instead of
  * corrupting sequence assignment; close() releases it for handover.
  *
  * Multi-session MVCC: `newSession()` gives independent client
  * sessions over this engine, each with its own transaction — snapshot
  * isolation with first-committer-wins conflict detection (mvcc.rs,
  * transaction_coordinator.rs; see Session). Statements across
  * sessions serialize on the engine's write-lock monitor.
  */
final class QueryEngine(val spark: SparkSession, val baseDir: String) {

  /** Per-statement span recorder — SET TRACE ON|OFF, SHOW TRACES,
    * SHOW TRACE <id> (observability.rs:1-10,323). Off by default; off
    * costs one volatile read per potential span. Declared FIRST: the
    * constructor's crash-recovery sweep runs instrumented code. */
  val tracer = new Tracer

  val catalog = new TableCatalog(spark, baseDir)

  /** Identity for the base-dir write lock (BaseDirLock). */
  private val engineId = java.util.UUID.randomUUID().toString
  private var writeLockHeld = false

  /** Take the base-dir write lock before the first state-changing
    * operation — a second live engine writing the same base dir would
    * duplicate sequences (the reference's process write lock,
    * index.rs:22-26, guards the same hazard). Read-only engines never
    * lock, so concurrent readers stay free. */
  private def ensureWriteLock(): Unit =
    if (!writeLockHeld) {
      BaseDirLock.acquire(spark, baseDir, engineId)
      writeLockHeld = true
      closed = false // a write through a closed engine re-opens it
      // construction skipped recovery if a live writer held the dir at
      // the time; we may have just stolen that writer's now-stale lock,
      // so its committed-but-unpublished manifests (and counters) must
      // land before we assign any sequence
      sweepStaging()
    }

  /** Release the base-dir write lock. Call when done with an engine
    * whose base dir another engine should take over. Idempotent; the
    * engine object must not be used for writes afterwards without
    * re-acquiring (which happens automatically on the next write). */
  def close(): Unit = {
    flushAudit() // the buffered audit tail lands with the lock still held
    dropAllCached() // free the result cache's executor blocks with the engine
    freeStatementPins() // and every statement-path localCheckpoint pin
    if (writeLockHeld) {
      BaseDirLock.release(spark, baseDir, engineId)
      writeLockHeld = false
    }
    // replication links die with the engine: a closed replica must not
    // linger in its primary's SHOW CLUSTER (phantom link, unbounded
    // apparent lag, and a strong reference pinning the dead engine),
    // and a closed primary unhooks from its followers symmetrically
    followsFrom.forEach((t, p) => p.followedBy.remove((t, engineId)))
    followsFrom.clear()
    followedBy.forEach((k, f) => f.followsFrom.remove(k._1, this))
    followedBy.clear()
    closed = true // readiness probes 503 until a write re-opens
  }

  /** True between close() and the next lock re-acquisition — the
    * window where the owner has declared the engine done and a
    * readiness probe must stop routing traffic to it. */
  @volatile private var closed = false

  // ------------------------------------------------------- pin registry

  /** Statement-path `localCheckpoint` pins, registered for
    * deterministic release at close(). The ContextCleaner frees such
    * blocks only after a natural driver GC — which a 128 GiB-heap
    * driver may not run across a whole bench suite, so each query's
    * DML pins stranded in the block manager and inflated later heavy
    * queries 4-18x (r9 verdict). References are WEAK so a GC that does
    * happen still lets the ContextCleaner reclaim pins early; close()
    * frees whatever survives. */
  private val pinRegistry =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]()

  /** `localCheckpoint` + register the checkpoint blocks for release at
    * close(). Every statement-scoped pin (DML batches, probe
    * materializations) goes through here; the result cache keeps its
    * own eviction-time release instead — its pins outlive statements
    * by design. */
  /** Pin a batch UNLESS its optimized plan already IS a LocalRelation:
    * literal VALUES rows live on the driver, nothing in their lineage
    * can re-read the log being appended to, their parallelize layout
    * is deterministic (so sequence assignment is stable across the
    * counts job and the write), and any non-deterministic expression
    * would have blocked constant folding and left a Project above —
    * failing this gate and keeping the real checkpoint. Skipping the
    * pin removes one materialization job from every literal INSERT,
    * the floor under OLTP-shaped statement streams. */
  private def pinUnlessLiteral(df: DataFrame): DataFrame =
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => df
      case _ => pinCheckpoint(df)
    }

  private def pinCheckpoint(df: DataFrame): DataFrame = tracer.span("pin-batch") {
    // opportunistically drop nodes whose referent a GC already let the
    // ContextCleaner reclaim — without this the queue grows one node
    // per DML statement for the engine's whole life (a long-lived wire
    // server would accumulate millions of dead nodes awaiting close())
    pinRegistry.removeIf(_.get() == null)
    val p = df.localCheckpoint()
    p.queryExecution.logical.collectLeaves().foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        pinRegistry.add(new java.lang.ref.WeakReference(r.rdd))
      case _ => ()
    }
    p
  }

  /** Pin a batch AND capture its per-partition row counts in ONE job:
    * the persisted blocks materialize under the same pass that computes
    * the counts sequence assignment needs anyway, replacing the
    * localCheckpoint-then-count pair (two jobs) every DML statement
    * used to pay. Row-preserving narrow projections over the pin
    * (physical casts, event shaping, SET-clause application) keep the
    * partition layout, so the counts stay valid for
    * EventLog.assignWithOffsets downstream. The blocks go through the
    * same pinRegistry release path as pinCheckpoint's. */
  private def pinCheckpointCounted(df: DataFrame): (DataFrame, Array[Long]) =
    tracer.span("pin-batch") {
      pinRegistry.removeIf(_.get() == null)
      // small batches come back as a driver LocalRelation from the
      // same job (pinCountedOrLocal) and ride the literal fast path
      // end to end — driver probe folding, job-free sequencing, and
      // the driver-side staging write. Unlike the PRE-collect
      // plan-proven path (pinUnlessLiteralCounted, where only row
      // bounds are provable), this job SEES the materialized bytes:
      // pinCountedOrLocal's total-byte gate (round 18) bounds what
      // may literalize, so the row cap no longer needs to assume
      // worst-case strings — ~1000-row short-string DML batches (the
      // OLTP scenario shape) now ride the driver write instead of a
      // distributed staging write. Binary stays distributed: blobs
      // do not belong in driver plans even under the byte gate.
      val cap = if (literalizableSchema(df)) PinLiteralizeMaxRows else -1L
      val (pinned, counts, rddOpt) =
        org.apache.spark.sql.GraftBridge.pinCountedOrLocal(df, cap)
      rddOpt.foreach(r =>
        pinRegistry.add(new java.lang.ref.WeakReference(r)))
      (pinned, counts)
    }

  /** pinCheckpointCounted's siblings for the streaming ingest paths:
    * same one-job pin discipline, but the fold-in is the measurement
    * the batch's probe gating needs — total row count
    * (pinCheckpointRows: rows bound the distinct-key probe exactly
    * when the frame is one-row-per-key) or Σ array lengths of one
    * column (pinCheckpointSized: postings bound the distinct-token
    * probe from above). No literalization: streaming batches publish
    * through the staged-manifest path regardless of size. */
  private def pinCheckpointRows(df: DataFrame): (DataFrame, Long) =
    tracer.span("pin-batch") {
      pinRegistry.removeIf(_.get() == null)
      val (pinned, counts, rdd) =
        org.apache.spark.sql.GraftBridge.pinCounted(df)
      pinRegistry.add(new java.lang.ref.WeakReference(rdd))
      (pinned, counts.sum)
    }

  private def pinCheckpointSized(df: DataFrame, arrayOrdinal: Int)
      : (DataFrame, Long) =
    tracer.span("pin-batch") {
      pinRegistry.removeIf(_.get() == null)
      val (pinned, _, elems, rdd) =
        org.apache.spark.sql.GraftBridge.pinCountedSized(df, arrayOrdinal)
      pinRegistry.add(new java.lang.ref.WeakReference(rdd))
      (pinned, elems)
    }

  /** Row-count cap for collecting a BOUNDED batch source to a driver
    * LocalRelation instead of checkpoint-pinning it. Conservative:
    * covers the shapes that matter (a global aggregate proves 1 row, a
    * small LIMIT proves its bound) while keeping worst-case driver
    * memory trivial even for wide payload rows. */
  private val LiteralizeMaxRows = 1024L

  /** Row cap for the PIN-JOB literalization (pinCheckpointCounted →
    * pinCountedOrLocal), which — unlike the plan-proven pre-collect
    * path — measures the batch's actual bytes inside the job and
    * gates on GraftBridge.LiteralizeByteBudget (1 MB total), so the
    * row bound is a plan-size guard, not a memory guard. 8192 rows of
    * any literalizable schema under 1 MB embed safely in a driver
    * plan. */
  private val PinLiteralizeMaxRows = 8192L

  /** Tighter cap when the schema carries any STRING column. Row-count
    * bounds don't bound BYTES, and strings are unbounded exactly like
    * binary: `INSERT ... SELECT text ... LIMIT 1000` over multi-MB
    * document text would collect gigabytes into the driver heap and
    * embed them in the LocalRelation plan. Catalyst's non-CBO
    * `sizeInBytes` can't catch this (limit stats use schema-default
    * widths — 20 bytes per string — not data), so the guard is a row
    * bound small enough that even pathological per-row strings stay
    * driver-trivial. The floor-critical shape (1-row aggregate
    * batches from trigger/procedure bodies, string action labels
    * included) sits far under it; wider string batches take the
    * distributed pin path instead. */
  private val StringLiteralizeMaxRows = 16L

  /** pinCheckpointCounted unless the batch is literal-scale:
    *   - a LocalRelation (literal VALUES) passes through untouched;
    *   - a plan whose OPTIMIZER-PROVEN row bound (`maxRows`: global
    *     aggregate -> 1, small LIMIT -> n) is at or under
    *     [[LiteralizeMaxRows]] collects to a driver LocalRelation.
    * Either way the batch then rides the whole literal fast path —
    * driver-side guard folding, job-free sequence assignment,
    * single-file staging — replacing the pin job plus a per-partition
    * staging write with ONE collect job and a one-task write. This is
    * THE floor under trigger/procedure bodies of the
    * `INSERT ... SELECT <aggregate>` shape (audit counters, MAX+1 id
    * assignment), which pay it once per fired statement. Cost parity
    * elsewhere: the collect runs the source exactly once, same as the
    * pin job it replaces; order determinism matches the literal
    * contract (one driver-resident row seq, collected once, feeding
    * probes, sequencing and the write identically). */
  /** Binary columns never literalize at any row count: a single
    * multimodal blob row can be arbitrarily large, and blobs belong
    * in distributed checkpoint blocks, not embedded in a driver-side
    * plan. (Strings are bounded by the tighter row cap above
    * instead — they carry SQL semantics the literal fast path still
    * wants for 1-row counter/label batches.) */
  private def literalizableSchema(df: DataFrame): Boolean =
    !df.schema.exists(f => hasType(f.dataType,
      _ == org.apache.spark.sql.types.BinaryType))

  /** The plan-proven row bound this batch may carry and still collect:
    * [[StringLiteralizeMaxRows]] when any (possibly nested) column is
    * a string, [[LiteralizeMaxRows]] for fixed-width-only schemas. */
  private def literalizeRowCap(df: DataFrame): Long =
    if (df.schema.exists(f => hasType(f.dataType,
        _ == org.apache.spark.sql.types.StringType)))
      StringLiteralizeMaxRows
    else LiteralizeMaxRows

  private def hasType(dt: org.apache.spark.sql.types.DataType,
      p: org.apache.spark.sql.types.DataType => Boolean): Boolean =
    dt match {
      case s: org.apache.spark.sql.types.StructType =>
        s.exists(f => hasType(f.dataType, p))
      case a: org.apache.spark.sql.types.ArrayType => hasType(a.elementType, p)
      case m: org.apache.spark.sql.types.MapType =>
        hasType(m.keyType, p) || hasType(m.valueType, p)
      case other => p(other)
    }

  private def pinUnlessLiteralCounted(df: DataFrame): (DataFrame, Option[Array[Long]]) =
    df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => (df, None)
      case p if p.maxRows.exists(_ <= literalizeRowCap(df)) && literalizableSchema(df) =>
        tracer.span("collect-literal") {
          val rows = df.collect()
          (spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema),
            None)
        }
      case _ =>
        val (p, c) = pinCheckpointCounted(df)
        (p, Some(c))
    }

  private def freeStatementPins(): Unit = {
    var ref = pinRegistry.poll()
    while (ref != null) {
      Option(ref.get()).foreach(r =>
        scala.util.Try(r.unpersist(blocking = false)))
      ref = pinRegistry.poll()
    }
  }

  /** Recovery sweep over COMMIT staging dirs. A staging dir WITH a
    * `manifest` file passed its commit point — the crash hit
    * mid-publish, so roll it forward (catalog counters + file renames,
    * both idempotent). A dir WITHOUT one never committed and never will
    * — discard it, or repeated failures would accumulate parquet copies
    * forever. Skipped entirely while another LIVE engine holds the
    * write lock: its in-flight staging must not be touched. (While WE
    * hold the lock it is always safe: publishAtomic only runs under the
    * statement write lock, so no staging of our own is in flight.) */
  private def sweepStaging(): Unit = {
    val base = new Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base) && !BaseDirLock.heldByLiveOther(spark, baseDir, engineId))
      for (st <- fs.listStatus(base)
          if st.getPath.getName.startsWith(".txn-staging-")) {
        if (fs.exists(new Path(st.getPath, "manifest")))
          completePublish(st.getPath)
        else scala.util.Try(fs.delete(st.getPath, true))
      }
  }

  sweepStaging() // crash recovery at open

  /** PK-uniqueness enforcement on INSERT, as in the reference
    * (sql_bridge.rs:3543-3570). Two extra jobs per insert — switch off
    * for bulk ingestion where the source is known-unique. */
  var enforcePkUniqueness: Boolean = true

  // ======================================================= transactions

  /** A buffered multi-statement transaction (sql_bridge.rs:453-568,
    * transaction.rs). DML inside BEGIN...COMMIT appends pinned event
    * batches to this buffer instead of the parquet log; reads union
    * the buffer back in (read-your-writes); COMMIT flushes the batches
    * in order, ROLLBACK discards them. Catalog DDL stays immediate
    * (non-transactional), like most engines. Buffered sequence numbers
    * are PROVISIONAL: if a concurrent direct writer (streaming ingest)
    * advances the log while the transaction is open, COMMIT shifts each
    * batch by the table's offset so flushed sequences stay unique and
    * contiguous.
    *
    * Scale note: the buffer holds `localCheckpoint`-pinned DataFrames
    * (executor block storage, not driver heap), so a large transaction
    * costs the same memory as the same statements outside one. */
  private final class Txn {
    // (table, pinned event frame, last provisional sequence in batch)
    val pending = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame, Long)]
    // tables whose buffered writes revoke the flat-log certificate at
    // COMMIT (PATCH/SOFT_DELETE or unprobed INSERT). A savepoint
    // rollback may leave a table here whose mutating writes were all
    // rolled back — the certificate is then revoked unnecessarily,
    // which is conservative (reads fall back to the keyed collapse),
    // never wrong
    val mutated = scala.collection.mutable.HashSet.empty[String]
    val seqs = scala.collection.mutable.HashMap.empty[String, Long]
    // catalog.lastSeq at the first buffered append per table — the
    // anchor for the commit-time re-sequencing offset
    val baseSeqs = scala.collection.mutable.HashMap.empty[String, Long]
    // snapshot-isolation read horizon: catalog.lastSeq at this table's
    // FIRST access (read or write) inside the transaction. Reads see
    // the durable log only up to this sequence (plus own buffered
    // writes); COMMIT detects write-write conflicts against events
    // other writers landed past it (mvcc.rs snapshot semantics).
    // Deliberately NOT restored by savepoint rollback — the snapshot
    // is transaction-wide, like PG REPEATABLE READ.
    val snapSeqs = scala.collection.mutable.HashMap.empty[String, Long]
    // (name, pending length, seq snapshot); later entries shadow earlier
    val savepoints =
      scala.collection.mutable.ArrayBuffer.empty[(String, Int, Map[String, Long])]
    /** PG-style abort: any failed statement inside the transaction
      * blocks everything except COMMIT (treated as ROLLBACK), ROLLBACK,
      * and ROLLBACK TO SAVEPOINT (sql_bridge.rs:330-345). */
    var aborted = false

    def restore(len: Int, seqSnap: Map[String, Long]): Unit = {
      pending.dropRightInPlace(pending.length - len)
      seqs.clear(); seqs ++= seqSnap
      // a table whose every batch was rolled away must re-anchor on its
      // next append — a stale anchor would over-shift the new batches
      // at COMMIT and leave a permanent sequence gap
      baseSeqs.filterInPlace { case (tbl, _) => pending.exists(_._1 == tbl) }
    }
  }
  /** An independent client session over this engine — its own
    * transaction state, sharing the engine's storage, catalog, and
    * single-writer lock (the reference's MVCC runs one transaction per
    * connection the same way — mvcc.rs, transaction_coordinator.rs:
    * 1-441). Sessions interleave statements safely: each BEGIN gets a
    * snapshot-isolated view (repeatable reads, own writes visible) and
    * COMMIT aborts with a serialization failure when another session
    * committed a write to the same primary key first. Statements across
    * sessions serialize on the engine's write lock; sessions are not
    * for intra-statement parallelism. */
  final class Session private[QueryEngine] () {
    private[QueryEngine] var txn: Option[Txn] = None
    // security context (row_level_security.rs:130-162): row policies
    // filter reads/writes for non-superusers once a table enables RLS.
    // The default context is the superuser — engine-internal work
    // (FK probes, snapshots, matview refresh) always bypasses policies.
    private[QueryEngine] var user: String = "root"
    private[QueryEngine] var roles: Set[String] = Set.empty
    private[QueryEngine] var superuser: Boolean = true
    // the session's BASE security context — what RESET ROLE restores.
    // setAuth moves it (it establishes how the session authenticated);
    // SET ROLE never does, so a restricted session cannot escalate
    // back to the engine superuser with one statement.
    private[QueryEngine] var baseUser: String = "root"
    private[QueryEngine] var baseRoles: Set[String] = Set.empty
    private[QueryEngine] var baseSuperuser: Boolean = true
    // SET STATEMENT_TIMEOUT, per session like PG; 0 = off
    private[QueryEngine] var statementTimeoutMs: Long = 0L
    // token bucket for SET RATE_LIMIT (rate_limit/mod.rs: per-client
    // queries/sec + burst); -1 marks "not yet filled"
    private[QueryEngine] var rlTokens: Double = -1.0
    private[QueryEngine] var rlLastNs: Long = 0L
    // statement nesting (trigger/procedure bodies re-enter sqlAs): the
    // rate limiter charges only depth-1 statements, so a body can
    // never be rejected mid-statement after data already landed
    private[QueryEngine] var stmtDepth: Int = 0
    def inTransaction: Boolean = txn.isDefined
    def currentUser: String = user
    /** Switch this session's security context (SET ROLE does the same
      * from SQL; this form also carries role membership). */
    def setAuth(user: String, roles: Set[String] = Set.empty,
        superuser: Boolean = false): Unit = {
      this.user = user; this.roles = roles; this.superuser = superuser
      this.baseUser = user; this.baseRoles = roles; this.baseSuperuser = superuser
    }
    def sql(statement: String): DataFrame = sqlAs(this, statement)
    def sql(statement: String, params: Seq[Any]): DataFrame =
      sqlAs(this, graft.sql.Params.bind(statement, params))
    /** Pre-flight a privilege check under this session's context —
      * the wire server gates a COPY FROM STDIN transfer BEFORE
      * CopyInResponse, so an ungranted client is refused with zero
      * bytes transferred instead of after a multi-GiB spool. Raises
      * the same SecurityException the statement itself would. */
    def requirePrivilege(table: String, priv: String): Unit =
      writeLock.synchronized {
        val prev = current
        current = this
        try { catalog.require(table); checkPrivilege(table, priv) }
        finally current = prev
      }
  }

  private val defaultSession = new Session()
  // the session whose statement is currently executing — swapped by
  // sqlAs under the write lock (statements, including nested trigger/
  // procedure bodies, run single-threaded per engine)
  private var current: Session = defaultSession

  /** A fresh session with independent transaction state. The engine's
    * own `sql` is the default session. */
  def newSession(): Session = new Session()

  private def txn: Option[Txn] = current.txn
  private def txn_=(v: Option[Txn]): Unit = current.txn = v

  /** Serializes every state-changing entry point — SQL statements and
    * streaming micro-batches — the same single-writer discipline the
    * reference enforces with its process write lock (index.rs:22-26).
    * Without it a micro-batch and a statement could read the same
    * lastSeq and assign duplicate sequences. */
  private val writeLock = new Object

  def inTransaction: Boolean = txn.isDefined

  private def begin(): DataFrame = {
    // idempotent, like the reference (sql_bridge.rs:454-460)
    if (txn.isEmpty) txn = Some(new Txn)
    summary("begin", 0L, 0L)
  }

  private def commitTxn(): DataFrame = txn match {
    case None => summary("commit", 0L, 0L) // PG: COMMIT outside txn is a no-op
    case Some(tx) if tx.aborted =>
      txn = None
      metricTxnRollbacks += 1
      summary("rollback", 0L, 0L) // PG: COMMIT of aborted = ROLLBACK
    case Some(tx) if tx.pending.isEmpty =>
      // a read-only transaction publishes nothing — in particular it
      // must NOT take the base-dir write lock (isMutating agrees)
      txn = None
      metricTxnCommits += 1
      summary("commit", 0L, 0L)
    case Some(tx) =>
      ensureWriteLock()
      // first-committer-wins write-write conflict detection (snapshot
      // isolation, mvcc.rs): an event any other writer landed after
      // this transaction's per-table snapshot, on a pk this
      // transaction also writes, aborts the COMMIT (PG 40001). The
      // probe is one set-based semi join per written table, and is
      // skipped entirely when the table's log never advanced past the
      // snapshot — the zero-interleave case costs a counter lookup.
      for ((tbl, evs) <- tx.pending.groupBy(_._1); t <- catalog.get(tbl)) {
        val snap = tx.snapSeqs.getOrElse(tbl,
          tx.baseSeqs.getOrElse(tbl, catalog.lastSeq(tbl)))
        if (catalog.lastSeq(tbl) > snap) {
          val mine = evs.map(_._2.select(col("pk")))
            .reduce(_ unionByName _).distinct()
          val theirs = baseEvents(t).where(col("sequence") > snap)
            .select(col("pk"))
          if (theirs.join(mine, Seq("pk"), "left_semi").limit(1).count() > 0) {
            txn = None // the transaction is aborted, not retryable as-is
            throw new QueryEngine.SerializationFailureException(
              s"could not serialize access: concurrent update on $tbl " +
                s"committed after this transaction's snapshot ($snap)")
          }
        }
      }
      // per-table shift for concurrent direct appends (streaming
      // ingest) that advanced the log past this txn's provisional
      // sequences; 0 when nothing interleaved
      val offsets = tx.baseSeqs.map { case (tbl, base) =>
        tbl -> (catalog.lastSeq(tbl) - base)
      }
      val batches = tx.pending.toSeq.map { case (table, ev, _) =>
        (table, shiftSequences(ev, offsets.getOrElse(table, 0L)))
      }
      val finalSeqs = tx.pending.groupBy(_._1).map { case (table, bs) =>
        table -> (bs.map(_._3).max + offsets.getOrElse(table, 0L))
      }.toMap
      val n = tx.pending.length.toLong
      // all-or-nothing: every batch stages first (invisible to readers;
      // a failure there aborts with the log untouched and the
      // transaction intact for ROLLBACK), then ONE manifest rename is
      // the commit point — a crash on either side of it leaves either
      // nothing or (after the reopen sweep) everything visible
      try {
        publishAtomic(batches, finalSeqs, None, mutated = tx.mutated.toSet)
        txn = None
        metricTxnCommits += 1
        summary("commit", n, 0L)
      } catch {
        case e: CommitIncompleteException =>
          // past the commit point: durable, completes at next engine
          // open — clear the txn (it IS committed) and surface the
          // incomplete in-process visibility instead of masking it
          txn = None
          throw e
        case e: Throwable =>
          throw new IllegalStateException(
            s"COMMIT aborted while staging (log untouched, transaction still open): ${e.getMessage}", e)
      }
  }

  /** Thrown when a commit passed its manifest commit point but the
    * publish into the logs did not finish (injected fault or I/O
    * error). The data is durable: the next engine open on this base dir
    * rolls the manifest forward. In-process reads may miss part of the
    * batch until then — close() and reopen. */
  final class CommitIncompleteException(msg: String, cause: Throwable)
    extends IllegalStateException(msg, cause)

  /** Test-only fault injection for the crash-atomicity specs: thrown
    * exceptions simulate a crash just before the manifest rename (commit
    * point) or before the i-th post-commit-point publish rename. */
  private[graft] var testFailBeforeManifestRename: () => Unit = () => ()
  private[graft] var testFailBeforePublishRename: Int => Unit = _ => ()

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  private def dec(s: String) =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Atomically land event batches + the matching catalog updates.
    *
    * Protocol (the classic write-ahead manifest, same job the
    * reference's WAL does for its transactions — wal.rs,
    * tests/wal_crash_recovery_test.rs):
    *   1. every batch writes its parquet under a fresh staging dir
    *      (parallel, multi-file — no coalesce bottleneck);
    *   2. a manifest listing every staged file, the per-table final
    *      sequence counters, and any stream batch-id lands via ONE
    *      atomic rename — this is the commit point;
    *   3. the publish applies the catalog updates (counters before data:
    *      a fault between the two leaves a harmless sequence hole, never
    *      a duplicate) and renames the staged files into the logs.
    * A failure before 2 deletes staging and rethrows — nothing
    * happened. A failure after 2 throws CommitIncompleteException — the
    * engine-open sweep replays step 3, which is idempotent (counters
    * max-merge; a missing staged file means it already moved). */
  /** Optional pre-commit fence, run immediately before every atomic
    * publish's commit point (the manifest rename).
    * graft.cluster.Leadership installs its stale-epoch check here so
    * a deposed leader (raft.rs term fencing, re-expressed for shared
    * storage) aborts BEFORE its write becomes durable — the statement
    * fails whole and staging is cleaned, leaving the successor's log
    * untouched. */
  @volatile private var commitFence: () => Unit = () => ()
  def setCommitFence(f: () => Unit): Unit = commitFence = f

  // ------------------------------------------------ cluster visibility
  // SHOW CLUSTER's data: replication links registered by
  // Replication.follow (both directions — a replica knows its
  // primaries, a primary knows its followers) and the leadership
  // lease installed by Leadership.Lease.attach. All metadata-scale;
  // probing a link reads two catalog counters, no Spark job.
  private val followsFrom =
    new java.util.concurrent.ConcurrentHashMap[String, QueryEngine]()
  private val followedBy =
    new java.util.concurrent.ConcurrentHashMap[(String, String), QueryEngine]()
  @volatile private var leaseStatus: Option[() => (Long, Long, Option[String])] =
    None

  /** Called by Replication.follow: this engine replays `table` from
    * `primary`. */
  private[graft] def registerFollow(table: String, primary: QueryEngine): Unit = {
    followsFrom.put(table, primary)
    primary.followedBy.put((table, engineId), this)
  }

  /** Called by Leadership.Lease.attach alongside the commit fence:
    * () => (lease epoch, current epoch, current leader id). */
  def setLeaseStatus(f: () => (Long, Long, Option[String])): Unit =
    leaseStatus = Some(f)

  /** SHOW CLUSTER: one row per replication link this engine is party
    * to — as replica (role `replica`, peer = the primary) and as
    * primary (role `primary`, peer = the follower engine) — with both
    * sides' sequence high-water marks and the event lag between them,
    * plus a `leadership` row when an HA lease is attached. */
  private def showCluster(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rep = followsFrom.asScala.toSeq.sortBy(_._1).map { case (t, p) =>
      val (ps, ls) = (p.catalog.lastSeq(t), catalog.lastSeq(t))
      ("replication", t, "replica", p.engineId, ls, ps, ps - ls)
    }
    val fol = followedBy.asScala.toSeq.sortBy(_._1).map { case ((t, _), r) =>
      val (ps, rs) = (catalog.lastSeq(t), r.catalog.lastSeq(t))
      ("replication", t, "primary", r.engineId, ps, rs, ps - rs)
    }
    val lead = leaseStatus.toSeq.map { f =>
      val (mine, cur, leader) = f()
      ("leadership", leader.getOrElse(""),
        if (cur == mine) "leader" else "deposed",
        s"epoch $mine of $cur", mine, cur, cur - mine)
    }
    import spark.implicits._
    (rep ++ fol ++ lead)
      .toDF("kind", "subject", "role", "peer", "local_seq", "peer_seq", "lag")
  }

  // wall-clock of the last completed publish, for the health probe's
  // "last publish age" (health.rs reports the same freshness signal);
  // -1 until this engine publishes
  @volatile private var lastPublishAtMs = -1L

  /** Health-probe snapshot (served by graft.server.HttpAdmin /health;
    * the reference's health endpoint reports the same shape,
    * driftdb-server/src/health.rs:1-272): engine liveness facts that
    * cost no Spark job — catalog size, write-lock state, and the age
    * of the last durable publish. */
  def healthSnapshot: Map[String, String] = writeLock.synchronized {
    // under the statement lock: the probe runs on HttpAdmin's
    // dispatcher thread and would otherwise iterate the catalog's
    // mutable maps mid-DDL (torn reads / CME → a healthy server 500s
    // its liveness probe). No Spark job runs here, so the hold is
    // microseconds; a probe blocking behind a long statement is the
    // intended "hung engine = hung probe" signal anyway.
    Map(
      "status" -> (if (closed) "closed" else "ok"),
      "tables" -> catalog.tableNames.size.toString,
      "views" -> catalog.viewNames.size.toString,
      "write_lock_held" -> writeLockHeld.toString,
      "last_publish_age_ms" ->
        (if (lastPublishAtMs < 0) "-1"
         else (System.currentTimeMillis() - lastPublishAtMs).toString))
  }

  private def publishAtomic(batches: Seq[(String, DataFrame)],
      seqs: Map[String, Long], stream: Option[(String, Long)],
      marks: Map[String, Long] = Map.empty,
      mutated: Set[String] = Set.empty,
      validate: () => Unit = () => ()): Unit = {
    val stagingRoot = new Path(s"$baseDir/.txn-staging-${System.nanoTime()}")
    val fs = stagingRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val lines = new StringBuilder
      batches.zipWithIndex.foreach { case ((table, ev), i) =>
        val dir = new Path(stagingRoot, s"batch-$i")
        // staging-only committer trims: direct task-commit renames (v2)
        // and no _SUCCESS marker — the manifest is this protocol's
        // commit record, and the files are listed right below, so the
        // extra rename pass and marker write buy nothing here.
        // Snapshots keep the default committer: their _SUCCESS IS the
        // version-dir completeness marker.
        tracer.span("stage-write", table) {
          val opts = catalog.get(table).map(bloomOptions).getOrElse(Map.empty) ++
            (if (encryptionOn)
              Map("parquet.encryption.uniform.key" -> Encryption.MasterKeyId)
            else Map.empty)
          // literal batches (LocalRelation — VALUES rows and
          // literalized small query batches) stage with a DRIVER-side
          // parquet write: the rows never left the driver, so a Spark
          // job would pay scheduling + task launch + committer
          // protocol to produce the identical file. Since round 17
          // encrypted writes take this path too — writeLocalParquet
          // loads the same modular-encryption factory the job path
          // uses, so SET ENCRYPTION KEY no longer forfeits the OLTP
          // statement floor (measured A/B in EncryptionSpec /
          // SURVEY §8); ANY driver-write failure falls back to the
          // job path after clearing partial output.
          val droveIt =
            try org.apache.spark.sql.GraftBridge.writeLocalParquet(ev,
              dir.toString, opts)
            catch {
              case scala.util.control.NonFatal(e) =>
                scala.util.Try(fs.delete(dir, true))
                System.err.println(
                  s"[graft] driver-side staging of $table fell back " +
                    s"to the job write: ${e.getMessage}")
                false
            }
          if (!droveIt)
            encrypted(ev.write)
              .options(opts)
              .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
              .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
              .parquet(dir.toString)
        }
        for (f <- fs.listStatus(dir) if f.getPath.getName.startsWith("part-"))
          lines.append(s"file\tbatch-$i/${f.getPath.getName}\t${enc(table)}\n")
      }
      seqs.foreach { case (t, s) => lines.append(s"seq\t${enc(t)}\t$s\n") }
      stream.foreach { case (id, b) => lines.append(s"stream\t${enc(id)}\t$b\n") }
      marks.foreach { case (t, v) => lines.append(s"wmark\t${enc(t)}\t$v\n") }
      // flat-log revocations commit atomically with the events that
      // cause them — a crash can never leave a mutated log marked flat
      mutated.foreach(t => lines.append(s"mut\t${enc(t)}\n"))
      val tmp = new Path(stagingRoot, "manifest.tmp")
      val out = fs.create(tmp, true)
      try out.write(lines.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // join the concurrent guard probes — abort pre-commit
      tracer.span("probe-join")(validate())
      commitFence() // HA epoch check — abort while still pre-commit
      testFailBeforeManifestRename()
      if (!fs.rename(tmp, new Path(stagingRoot, "manifest")))
        throw new java.io.IOException(s"manifest rename failed: $stagingRoot")
    } catch {
      case e: Throwable =>
        scala.util.Try(fs.delete(stagingRoot, true))
        throw e
    }
    // ---- commit point passed ----
    lastPublishAtMs = System.currentTimeMillis()
    // roll-forward: completePublish is idempotent, so a transient I/O
    // fault gets ONE immediate in-process retry (the reference replays
    // its WAL without a restart the same way — wal.rs). A fault that
    // persists through the retry surfaces as CommitIncomplete and the
    // next statement's healing sweep (or the reopen sweep) finishes it.
    tracer.span("publish") {
      try completePublish(stagingRoot, hooked = true)
      catch {
        case _: Throwable =>
          try completePublish(stagingRoot, hooked = true)
          catch {
            case e: Throwable =>
              publishIncomplete = true
              throw new CommitIncompleteException(
                s"commit is durable but its publish did not finish; it " +
                  s"completes on the next statement or engine open " +
                  s"(staging: $stagingRoot): ${e.getMessage}", e)
          }
      }
    }
  }

  /** Set when a commit passed its manifest commit point but the publish
    * faulted twice — the next statement retries the (idempotent) sweep
    * so in-process reads heal without a reopen. */
  @volatile private var publishIncomplete = false

  /** Parquet modular encryption for data-bearing writes (event-log
    * batches, snapshots, matviews) — toggled by SET ENCRYPTION KEY /
    * OFF. Uniform mode: footer + every column under keys wrapped by
    * the registered master key (file magic becomes PARE; nothing is
    * readable without the key). */
  private var encryptionOn = false

  private def encrypted[T](w: org.apache.spark.sql.DataFrameWriter[T])
      : org.apache.spark.sql.DataFrameWriter[T] =
    if (encryptionOn)
      w.option("parquet.encryption.uniform.key", Encryption.MasterKeyId)
    else w

  /** CREATE INDEX made physical: every log/snapshot write of a table
    * with declared indexes adds a parquet BLOOM FILTER on the indexed
    * payload columns. Min/max stats already serve range predicates;
    * blooms serve the equality/IN point lookups the reference's B-tree
    * indexes exist for (index.rs:9-36) — a scan with `col = x` skips
    * every row group whose bloom excludes x, which min/max cannot do
    * for high-cardinality unsorted columns. Event-feed reads
    * (FOR SYSTEM_TIME ALL/BETWEEN, CDC) and external consumers of the
    * files benefit directly. */
  private def bloomOptions(t: TableDef): Map[String, String] =
    catalog.indexedColumns(t.name).flatMap(cn =>
      t.columns.find(_.logical.equalsIgnoreCase(cn)).map(c =>
        s"parquet.bloom.filter.enabled#payload.${c.physical}" -> "true")).toMap

  /** Step 3 of publishAtomic — also the recovery path the engine-open
    * sweep replays for a manifest that crashed mid-publish. Idempotent:
    * catalog updates max-merge, already-moved files are skipped. */
  private def completePublish(stagingRoot: Path, hooked: Boolean = false): Unit = {
    val fs = stagingRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(stagingRoot, "manifest"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val files = Vector.newBuilder[(String, String)] // (relPath, table)
    val seqs = Map.newBuilder[String, Long]
    val marks = Map.newBuilder[String, Long]
    val mutated = Set.newBuilder[String]
    var stream: Option[(String, Long)] = None
    for (line <- text.split("\n") if line.nonEmpty) line.split("\t") match {
      case Array("file", rel, table) => files += ((rel, dec(table)))
      case Array("seq", table, s) => seqs += (dec(table) -> s.toLong)
      case Array("stream", id, b) => stream = Some((dec(id), b.toLong))
      case Array("wmark", table, v) => marks += (dec(table) -> v.toLong)
      case Array("mut", table) => mutated += dec(table)
      case other =>
        throw new IllegalStateException(s"corrupt manifest line: ${other.mkString("\t")}")
    }
    catalog.commitPublished(seqs.result(), stream, marks.result(),
      mutated.result()) // counters first: hole > duplicate
    for (((rel, table), i) <- files.result().zipWithIndex
        if catalog.get(table).isDefined) {
      if (hooked) testFailBeforePublishRename(i)
      val src = new Path(stagingRoot, rel)
      if (fs.exists(src)) { // absent = already published by a prior pass
        val target = new Path(logDir(table))
        if (!fs.exists(target)) fs.mkdirs(target)
        // parquet part files carry job UUIDs, so names never collide
        if (!fs.rename(src, new Path(target, src.getName)))
          throw new java.io.IOException(s"rename failed: $src")
      }
    }
    // best-effort: a leftover dir with its manifest replays as a no-op
    scala.util.Try(fs.delete(stagingRoot, true))
  }

  private def rollbackTxn(toSavepoint: Option[String]): DataFrame = {
    val tx = txn.getOrElse(throw new IllegalStateException(
      "no active transaction to rollback"))
    toSavepoint match {
      case None =>
        txn = None
        metricTxnRollbacks += 1
        summary("rollback", 0L, 0L)
      case Some(name) =>
        val i = tx.savepoints.lastIndexWhere(_._1 == name.toLowerCase)
        if (i < 0) throw new IllegalArgumentException(s"savepoint not found: $name")
        val (_, len, seqSnap) = tx.savepoints(i)
        tx.restore(len, seqSnap)
        // keep the savepoint itself (PG: you can roll back to it again)
        tx.savepoints.dropRightInPlace(tx.savepoints.length - (i + 1))
        tx.aborted = false // PG: ROLLBACK TO clears the abort state
        summary("rollback_to_savepoint", 0L, 0L)
    }
  }

  private def savepoint(name: String): DataFrame = {
    val tx = txn.getOrElse(throw new IllegalStateException(
      "SAVEPOINT can only be used in transaction blocks"))
    // unquoted identifiers fold case, as in PG
    tx.savepoints += ((name.toLowerCase, tx.pending.length, tx.seqs.toMap))
    summary("savepoint", 0L, 0L)
  }

  private def releaseSavepoint(name: String): DataFrame = {
    val tx = txn.getOrElse(throw new IllegalStateException(
      "RELEASE SAVEPOINT can only be used in transaction blocks"))
    val i = tx.savepoints.lastIndexWhere(_._1 == name.toLowerCase)
    if (i < 0) throw new IllegalArgumentException(s"savepoint not found: $name")
    // PG: releases this savepoint and all later ones; writes are kept
    tx.savepoints.dropRightInPlace(tx.savepoints.length - i)
    summary("release", 0L, 0L)
  }

  // ================================================================ sql

  /** Parameterized statement: `$1 $2 ...` placeholders bound to
    * `params` as SQL literals before routing (the reference's
    * `execute_sql_with_params`, sql_bridge.rs:183-226 — ours covers
    * every statement kind, not just SELECT/CREATE). */
  def sql(statement: String, params: Seq[Any]): DataFrame =
    sql(graft.sql.Params.bind(statement, params))

  /** A `;`-separated script, statement by statement (the reference
    * CLI's script mode, driftdb-cli main.rs). Statements run in order
    * — including transaction control — and the LAST statement's result
    * is returned. Semicolons inside string literals don't split. */
  def sqlScript(script: String): DataFrame = {
    val stmts = StatementRouter.splitTopLevel(script, ';')
      .filter(s => SqlText.maskNonCode(s).trim.nonEmpty) // drop comment-only tails
    require(stmts.nonEmpty, "empty script")
    stmts.map(sql).last
  }

  /** Statement kinds that change durable state — these take the
    * base-dir write lock before running. COMMIT mutates only when the
    * transaction has buffered writes to publish. */
  private def isMutating(st: Statement): Boolean = st match {
    case _: Statement.Select | _: Statement.Explain | Statement.ShowTables |
        Statement.ShowTriggers | Statement.ShowProcedures |
        Statement.ShowSequences | Statement.ShowMatviews |
        Statement.ShowPolicies |
        _: Statement.SetRole | _: Statement.VerifyBackup |
        _: Statement.ShowBackups | Statement.ShowCluster |
        _: Statement.SetAudit | Statement.ShowAudit |
        Statement.ShowGrants | _: Statement.SetPrivileges |
        _: Statement.SetCache | Statement.ShowCache | Statement.ClearCache |
        Statement.ShowMigrations | _: Statement.SetStatementTimeout |
        Statement.ShowMetrics | _: Statement.SetSlowLog | Statement.ShowPerf |
        _: Statement.SetTrace | Statement.ShowTraces | _: Statement.ShowTrace |
        _: Statement.ShowStats | _: Statement.ShowHistogram |
        _: Statement.SetSecurityMonitor | _: Statement.SetSecurityAutoblock |
        Statement.ShowSecurityThreats | Statement.ShowSecurityStats |
        Statement.ShowSessions | Statement.ShowAlerts |
        Statement.ShowOptimizations |
        _: Statement.SetEncryptionKey | Statement.SetEncryptionOff |
        _: Statement.CopyTo | _: Statement.DiffTable |
        _: Statement.Describe | _: Statement.Analyze |
        _: Statement.CheckTable |
        Statement.Begin | _: Statement.Rollback | _: Statement.Savepoint |
        _: Statement.ReleaseSavepoint => false
    case Statement.Commit => txn.exists(t => t.pending.nonEmpty && !t.aborted)
    case _ => true
  }

  def sql(statement: String): DataFrame = sqlAs(current, statement)

  /** Run one statement in the given session's transaction context.
    * Reentrant (trigger/procedure bodies dispatch through the current
    * session); the write-lock monitor serializes sessions on different
    * threads. */
  private def sqlAs(session: Session, statement: String): DataFrame =
    writeLock.synchronized {
      val prev = current
      current = session
      session.stmtDepth += 1
      // the security monitor sees each TOP-LEVEL statement once (nested
      // trigger/procedure bodies are the statement's own work, same
      // boundary the rate limiter draws); affected-row side channel
      // resets here so a failed statement never reports its
      // predecessor's count
      val top = session.stmtDepth == 1
      if (top) lastAffected = None
      var ok = true
      try {
        val out = sqlCurrent(statement)
        if (top) {
          // the refresh's own summaries must not clobber the affected-
          // row side channel the security monitor records for THE
          // USER'S statement (mass-write exfiltration detection)
          val affected = lastAffected
          maybeAutoRefresh()
          lastAffected = affected
        }
        out
      }
      catch { case e: Throwable => ok = false; throw e }
      finally {
        if (top && security.enabled)
          security.recordStatement(session, session.user, statement, ok,
            if (ok) lastAffected else None)
        session.stmtDepth -= 1; current = prev
      }
    }

  /** Always-fresh views (round 14): after a successful TOP-LEVEL
    * statement outside a transaction, incrementally refresh every
    * AUTOREFRESH view whose base table advanced past its horizon. The
    * due check is a driver-side catalog walk — zero Spark jobs when
    * nothing changed, so read-only statements pay one map lookup. The
    * refresh dispatches reentrantly like a trigger body (traced and
    * serialized as part of the statement). A refresh failure must not
    * fail the statement whose write already committed: it is counted
    * (SHOW METRICS autorefresh_failed) and the view stays stale for
    * the next statement or an explicit REFRESH. Only incrementally
    * maintainable shapes can be flagged AUTOREFRESH, and every
    * aggregate in them maintains under retraction (the sketch's
    * touched-group recompute included), so no shape precondition can
    * fire here; the residual failure class is vacuumed horizons.
    * Inside BEGIN..COMMIT, DML is buffered (horizons unchanged) and
    * the refresh lands after the COMMIT statement publishes. */
  private var inAutoRefresh = false
  private var metricAutoRefreshRuns = 0L
  private var metricAutoRefreshFailed = 0L
  // views whose auto refresh FAILED (vacuumed horizon, dropped base):
  // muted so a permanently broken view is not re-attempted after every
  // statement forever. In-memory — a reopen retries once; an explicit
  // REFRESH, re-ALTER, or re-CREATE of the view clears the mute.
  private val autoRefreshMuted = scala.collection.mutable.HashSet.empty[String]
  // the refresh runs under a SYSTEM session, not the writer's: the
  // flag was superuser-authorized at ALTER time, and a restricted
  // writer's INSERT must neither starve the view (REFRESH is gated
  // under SET PRIVILEGES) nor let an RLS-filtered context near the
  // shared materialization
  private lazy val autoRefreshSession = new Session()
  private def maybeAutoRefresh(): Unit =
    if (!inAutoRefresh && txn.isEmpty) {
      val due = catalog.autoRefreshViews.collect {
        case (n, every)
          if !autoRefreshMuted.contains(n) && catalog.isMaterialized(n) && {
            val bases = catalog.mviewBaseAll(n)
            // every base must exist with its counter AT OR PAST the
            // horizon (a drop-and-recreate resets the counter below it —
            // the view is unmaintainable until a full REFRESH), and the
            // staleness must have reached the view's debounce threshold
            // (EVERY n EVENTS; 1 = refresh after every statement) — a
            // hot single-row ingest loop pays the warm refresh once per
            // n events, not per statement
            bases.nonEmpty && bases.forall { case (t, r) =>
              catalog.get(t).isDefined && catalog.lastSeq(t) >= r } &&
              bases.map { case (t, r) => catalog.lastSeq(t) - r }.max >= every
          } => n
      }
      if (due.nonEmpty) {
        inAutoRefresh = true
        val prevSession = current
        current = autoRefreshSession
        try due.foreach { n =>
          try {
            sqlCurrent(s"REFRESH MATERIALIZED VIEW $n INCREMENTALLY")
            metricAutoRefreshRuns += 1
          } catch {
            // fatal errors (OOM, interrupt) must propagate; a refresh
            // whose SQL-level failure is swallowed here is muted so it
            // is not doomed to re-fail after every later statement
            case scala.util.control.NonFatal(e) =>
              metricAutoRefreshFailed += 1
              autoRefreshMuted += n
              System.err.println(
                s"[graft] AUTOREFRESH of $n failed (muted until an " +
                  s"explicit REFRESH): ${e.getMessage}")
          }
        } finally { current = prevSession; inAutoRefresh = false }
      }
    }

  /** Security monitoring / intrusion detection over the statement and
    * authentication streams (security_monitor.rs) — the wire server
    * feeds failed logins and consults the auto-block list. */
  val security = new SecurityMonitor(() => catalog.tableNames)

  // ------------------------------------------------------ rate limiting

  /** Engine-wide statement rate limit for NON-superuser sessions
    * (superusers are exempt, the simplification of the reference's
    * superuser_multiplier — rate_limit/mod.rs:40-42). 0 = off. Each
    * session holds its own token bucket: `rateLimitQps` tokens accrue
    * per second up to `rateLimitBurst`; a statement spends one. */
  private var rateLimitQps: Double = 0.0
  private var rateLimitBurst: Double = 0.0
  /** Injectable clock (tests drive the bucket deterministically). */
  private[exec] var rateClockNs: () => Long = () => System.nanoTime()
  private var metricRateLimited = 0L

  private def checkRateLimit(s: Session): Unit =
    if (rateLimitQps > 0 && !s.superuser && s.stmtDepth <= 1) {
      val now = rateClockNs()
      if (s.rlTokens < 0) { s.rlTokens = rateLimitBurst; s.rlLastNs = now }
      else {
        s.rlTokens = math.min(rateLimitBurst,
          s.rlTokens + (now - s.rlLastNs) / 1e9 * rateLimitQps)
        s.rlLastNs = now
      }
      if (s.rlTokens < 1.0) {
        metricRateLimited += 1
        throw new IllegalStateException(
          f"rate limit exceeded: $rateLimitQps%.0f statements/s " +
            f"(burst $rateLimitBurst%.0f) — retry later")
      }
      s.rlTokens -= 1.0
    }

  /** Statement body runs as a trace span when tracing is on; the
    * reentrant dispatch makes trigger/procedure statements children
    * of the statement that fired them. */
  private def sqlCurrent(statement: String): DataFrame =
    tracer.statement(statement)(sqlCurrentInner(statement))

  private def sqlCurrentInner(statement: String): DataFrame = {
    checkRateLimit(current)
    // heal a stranded post-commit-point publish before the statement
    // reads or writes anything: the sweep is idempotent, we hold the
    // write lock, and once it succeeds in-process reads see the whole
    // batch — no reopen required
    if (publishIncomplete) {
      sweepStaging()
      publishIncomplete = false
    }
    val parsed = tracer.span("parse")(StatementRouter.parse(statement))
    if (isMutating(parsed)) ensureWriteLock()
    def run(): DataFrame = parsed match {
    case Statement.Begin => begin()
    case Statement.Commit => commitTxn()
    case Statement.Rollback(sp) => rollbackTxn(sp)
    case Statement.Savepoint(name) => savepoint(name)
    case Statement.ReleaseSavepoint(name) => releaseSavepoint(name)
    case st =>
      txn match {
        case Some(tx) if tx.aborted =>
          throw new IllegalStateException(
            "current transaction is aborted, commands ignored until end of transaction block")
        case Some(tx) =>
          // statement-level atomicity inside the transaction: a failed
          // statement leaves no partial batches behind, then aborts the
          // transaction (PG semantics, sql_bridge.rs:251-264)
          val (len, seqSnap) = (tx.pending.length, tx.seqs.toMap)
          try dispatch(st)
          catch {
            case e: Throwable =>
              tx.restore(len, seqSnap)
              tx.aborted = true
              throw e
          }
        case None => dispatch(st)
      }
    }
    // statement timeout wraps the eager work (DML, probes, writes,
    // pinned reads); a purely lazy SELECT's later actions run on the
    // caller's clock — the reference cancels eager server-side
    // execution the same way (query_cancellation.rs:200)
    def timed(): DataFrame = {
      val ms = current.statementTimeoutMs
      if (ms <= 0 || parsed.isInstanceOf[Statement.SetStatementTimeout]) run()
      else withStatementTimeout(ms)(run())
    }
    metricStatements += 1
    // auditing checks the flag from BEFORE the statement, so SET AUDIT
    // ON records everything AFTER itself (and SET AUDIT OFF is the
    // last recorded statement)
    val perfT0 = System.nanoTime()
    try {
      if (!auditEnabled) {
        try timed()
        catch { case e: Throwable => metricFailed += 1; throw e }
      } else {
        lastAffected = None
        try { val r = timed(); auditRecord(parsed, ok = true, None); r }
        catch {
          case e: Throwable =>
            metricFailed += 1
            auditRecord(parsed, ok = false, Option(e.getMessage))
            throw e
        }
      }
    } finally recordPerf(statement, (System.nanoTime() - perfT0) / 1e6)
  }

  /** Run `f` under a fresh Spark job group that a watchdog cancels
    * after `ms` — the cancelled jobs surface as SparkExceptions, which
    * map to a clear timeout error (the reference's cancel path tags
    * handles the same way, query_cancellation.rs:147-233). */
  private def withStatementTimeout[T](ms: Long)(f: => T): T = {
    val sc = spark.sparkContext
    val group = s"graft-stmt-${java.util.UUID.randomUUID()}"
    sc.setJobGroup(group, s"graft statement (timeout ${ms}ms)",
      interruptOnCancel = true)
    @volatile var fired = false
    val task = new java.util.TimerTask {
      // the STICKY variant: a plain cancelJobGroup only kills jobs
      // already running, and a statement still in planning/codegen at
      // the deadline would submit its jobs AFTER the cancel and run
      // unbounded — AndFutureJobs kills those on submission too
      def run(): Unit = { fired = true; sc.cancelJobGroupAndFutureJobs(group) }
    }
    QueryEngine.timeoutTimer.schedule(task, ms)
    try f
    catch {
      case e: Throwable if fired =>
        metricTimeouts += 1
        throw new QueryEngine.StatementTimeoutException(
          s"canceling statement due to statement timeout (${ms} ms)", e)
    } finally { task.cancel(); sc.clearJobGroup() }
  }

  private def dispatch(statement: Statement): DataFrame = statement match {
    case Statement.CreateTable(name, cols, pk, fkDefs, conDefs) =>
      requirePerm("CREATE TABLE", "CREATE_TABLE")
      // __graft_* is the engine's hidden-column namespace (IVM
      // accumulators, fused-read flags, minted join keys): a user
      // column inside it would ambiguously capture a minted column in
      // some later plan — reject at declaration, where the error is
      // actionable (legacy catalogs that predate this check still
      // load; read paths fall back defensively)
      for ((c, _) <- cols)
        require(!IncrementalView.hidden(c),
          s"column name $c is reserved: __graft_ is the engine's " +
            "hidden-column namespace")
      // FK declarations are validated up front: child column must be
      // declared, parent table (self-reference allowed) and parent
      // column must exist (fk.rs:44-66; inline form sql_bridge.rs:5738)
      for (fk <- fkDefs) {
        require(cols.exists(_._1 == fk.column),
          s"foreign key column not declared: ${fk.column}")
        val parentCols =
          if (fk.refTable == name) cols.map(_._1)
          else catalog.get(fk.refTable).getOrElse(throw new IllegalArgumentException(
            s"referenced table not found: ${fk.refTable}")).columns.map(_.logical)
        require(parentCols.contains(fk.refColumn),
          s"referenced column not found: ${fk.refTable}.${fk.refColumn}")
      }
      // constraint columns must be declared (constraints.rs:60-96
      // validates at registration the same way); CHECK expressions are
      // validated lazily at first enforcement (they may reference any
      // Catalyst function)
      val constraintCols = conDefs.flatMap {
        case Statement.NotNullDef(c) => Seq(c)
        case Statement.DefaultDef(c, _) => Seq(c)
        case Statement.UniqueDef(cs) => cs
        case Statement.AutoIncrementDef(c) => Seq(c)
        case _: Statement.CheckDef => Nil
      }
      for (c <- constraintCols)
        require(cols.exists(_._1 == c), s"constraint column not declared: $c")
      catalog.createTable(name, pk,
        cols.map { case (c, ddl) => (c, DataType.fromDDL(ddl)) })
      if (fkDefs.nonEmpty)
        catalog.setForeignKeys(name, fkDefs.map(f => (f.column, f.refTable, f.refColumn)))
      if (conDefs.nonEmpty)
        catalog.setConstraints(name, conDefs.collect {
          case Statement.NotNullDef(c) => graft.catalog.Constraint.NotNull(c)
          case Statement.DefaultDef(c, e) => graft.catalog.Constraint.Default(c, e)
          case Statement.UniqueDef(cs) => graft.catalog.Constraint.Unique(cs)
          case Statement.CheckDef(e) => graft.catalog.Constraint.Check(e)
        })
      // AUTO_INCREMENT mints a table-owned sequence named like the
      // reference's `{table}_{column}_seq` (sequences.rs:85-90)
      val autoIncCols = conDefs.collect { case Statement.AutoIncrementDef(c) => c }
      require(autoIncCols.size <= 1,
        s"at most one AUTO_INCREMENT column per table: ${autoIncCols.mkString(", ")}")
      for (c <- autoIncCols)
        catalog.createSequence(s"${name}_${c}_seq", 1L, 1L, None, None,
          cycle = false, ownedBy = Some((name, c)))
      summary("created", 0L, catalog.lastSeq(name))
    case Statement.CreateIndex(idx, table, colNames) =>
      requirePerm("CREATE INDEX", "CREATE_INDEX")
      // catalog metadata + physical effect: subsequent log/snapshot
      // writes stamp a parquet bloom filter on EVERY indexed column
      // (bloomOptions) — range predicates were already served by
      // min/max pruning and pushdown (SURVEY §1.4). A composite
      // index also becomes the bare-OPTIMIZE Z-order hint.
      val t = catalog.require(table)
      for (cn <- colNames)
        if (!t.columns.exists(_.logical.equalsIgnoreCase(cn)))
          throw new IllegalArgumentException(
            s"column $cn not found in $table")
      catalog.createIndex(idx, table, colNames)
      summary("indexed", 0L, catalog.lastSeq(table))
    case Statement.DropIndex(idx, ifEx) =>
      requirePerm("DROP INDEX", "DROP_INDEX")
      catalog.dropIndex(idx, ifEx)
      summary("index_dropped", 0L, 0L)
    case Statement.CreateView(name, viewSql, materialized, orReplace) =>
      if (!materialized) {
        if (orReplace && catalog.isMaterialized(name))
          catalog.dropView(name) // matview (and its storage) replaced
        catalog.createView(name, viewSql)
        summary("view_created", 0L, 0L)
      } else {
        // materializes current state, which inside a txn would include
        // (and persist) uncommitted buffered writes
        if (txn.isDefined)
          throw new IllegalStateException(
            "CREATE MATERIALIZED VIEW cannot run inside a transaction")
        if (orReplace) catalog.dropView(name, ifExists = true)
        if (catalog.get(name).isDefined || catalog.getView(name).isDefined)
          throw new IllegalArgumentException(s"table or view already exists: $name")
        requireUnfilteredPopulation("CREATE MATERIALIZED VIEW", viewSql)
        // data lands before the registration: a registered matview is
        // always readable (crash between the two leaves only an
        // unreferenced data dir, cleaned by the next CREATE or DROP)
        incShapeOf(viewSql) match {
          case Some(sh) =>
            // maintainable shape: populate WITH the hidden support
            // columns at a pinned sequence, so INCREMENTALLY can later
            // merge deltas from exactly this horizon
            val r = catalog.lastSeq(sh.table)
            val st0 = stateAt(sh.table, Some(r).filter(_ > 0))
            val agged = IncrementalView.aggregate(st0, sh)
            // HAVING resolves against the view's VISIBLE output
            // columns plus the rewrite-minted __graft_h_* having
            // accumulators — analysis-check it against that frame NOW
            // so a typo (or a reference to a __graft_* support column
            // the read path strips) fails the CREATE, not the first
            // read (the filter itself applies at read time)
            sh.having.foreach(h => agged
              .drop(agged.columns.filter(c => IncrementalView.hidden(c) &&
                !c.startsWith(IncrementalView.HavingAggPrefix)).toIndexedSeq: _*)
              .where(expr(h)).queryExecution.analyzed)
            encrypted(agged.write)
              .mode("overwrite").parquet(catalog.mviewDataPath(name, 0L))
            writeAuxes(sh.filtered(st0),
              sh.groupKeys, IncrementalView.auxAggs(sh.aggs), name, 0L)
            catalog.createMaterializedView(name, viewSql)
            catalog.setMviewRefreshed(name, 0L, Map(sh.table -> r))
          case None => joinShapeOf(viewSql) match {
            case Some(js) =>
              // maintainable join shape: populate through the same
              // aliased-join aggregation (hidden columns included) at
              // pinned sequences of EVERY side; horizons land in ONE
              // catalog save (a crash mid-way must not leave partial
              // horizons)
              val hs = js.tables.map(tn => tn -> catalog.lastSeq(tn)).toMap
              val frames0 = js.tables.map(tn =>
                stateAt(tn, Some(hs(tn)).filter(_ > 0)))
              val agged = IncrementalView.aggregateJoin(frames0, js)
              js.having.foreach(h => agged
                .drop(agged.columns.filter(c => IncrementalView.hidden(c) &&
                  !c.startsWith(IncrementalView.HavingAggPrefix)).toIndexedSeq: _*)
                .where(expr(h)).queryExecution.analyzed)
              encrypted(agged.write)
                .mode("overwrite").parquet(catalog.mviewDataPath(name, 0L))
              writeAuxes(js.joined(frames0), js.groupKeys,
                IncrementalView.auxAggs(js.aggs), name, 0L)
              catalog.createMaterializedView(name, viewSql)
              catalog.setMviewRefreshed(name, 0L, hs)
            case None =>
              encrypted(select(viewSql).write).mode("overwrite")
                .parquet(catalog.mviewDataPath(name, 0L))
              catalog.createMaterializedView(name, viewSql)
          }
        }
        summary("materialized_view_created", 0L, 0L)
      }
    case Statement.RefreshMatView(name, incremental) =>
      if (txn.isDefined)
        throw new IllegalStateException(
          "REFRESH MATERIALIZED VIEW cannot run inside a transaction")
      if (!catalog.isMaterialized(name))
        throw new IllegalArgumentException(s"materialized view not found: $name")
      val viewSql = catalog.getView(name).get
      requireUnfilteredPopulation("REFRESH MATERIALIZED VIEW", viewSql)
      // the NEXT version dir, then swap the catalog pointer — readers
      // see the old version until the new one is complete
      // (views.rs:40-123 refresh; the versioned-dir swap is how an
      // object store serves this without read-write races)
      val prev = catalog.mviewVersion(name)
      val op = (incShapeOf(viewSql), incremental) match {
        case (Some(sh), true) =>
          // INCREMENTAL: merge the signed contributions of only the
          // rows TOUCHED since the last refresh horizon. The two state
          // reads are semi-join-restricted to touched pks; the
          // aggregation shuffles O(touched) rows and the merge joins on
          // the view's own key space — never a full re-aggregation.
          val (baseT, r) = catalog.mviewBase(name).getOrElse(
            throw new IllegalStateException(
              s"$name has no recorded refresh horizon — run a full REFRESH first"))
          val t = catalog.require(baseT)
          val horizon = catalog.lastSeq(baseT)
          if (catalog.retentionFloor(baseT) > r)
            throw new IllegalStateException(
              s"events since the last refresh horizon @SEQ:$r of $name were " +
                "vacuumed — run a full (non-incremental) REFRESH")
          // a sequence counter BELOW the horizon means the base was
          // dropped and recreated — the view's content refers to a
          // table that no longer exists, which no delta can mend
          if (horizon < r)
            throw new IllegalStateException(
              s"$name's refresh horizon @SEQ:$r is ahead of $baseT's " +
                s"sequence counter ($horizon) — the table was dropped " +
                "and recreated. Run a full (non-incremental) REFRESH")
          if (horizon > r) {
            val restrict = touchedRestrictor(t, r, horizon)
            val stored = spark.read.parquet(catalog.mviewDataPath(name, prev))
            // both horizon states from ONE pruned scan where the
            // bounds share a checkpoint source (round 16) — the pin
            // makes the single scan + Exchange serve the old side,
            // the new side, the retraction probe and the delta
            val fusedPin = fusedHorizonStates(t, r, horizon).map(f =>
              restrict(f).persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
            // everything from here on — including the retraction
            // probe, a real action — runs under the finally that
            // releases the pin: a refresh that throws mid-way must
            // not leak cache entries into the engine's lifetime
            try {
            val (oldSide, newSide) = fusedPin match {
              case Some(p) => fusedSides(p)
              case None => (restrict(stateAt(baseT, Some(r))),
                restrict(stateAt(baseT, Some(horizon))))
            }
            // A sketch (ACD's HLL, APPROX_PERCENTILE's KLL) unions but
            // cannot retract, so the
            // sketch merge is a plain union ONLY
            // when no touched pk CONTRIBUTED to the view at the old
            // horizon. The probe applies the view's own WHERE: a
            // touched pre-horizon row the predicate excluded
            // contributed nothing, so its change lands like a fresh
            // insert. One pruned limit-1 job, paid only by
            // sketch-bearing views; tail-local churn (insert-then-
            // update/delete since the horizon) stays on the union
            // path, because only surviving new-state rows contribute.
            // When the probe DOES find a contributing row (round 15 —
            // previously a refusal gate), only the TOUCHED groups'
            // sketches recompute from current state filtered to those
            // groups (full-refresh semantics per touched group;
            // see pruneToTouchedGroups for the honest cost model);
            // untouched groups keep their stored
            // sketch, so the refresh never re-aggregates the table.
            // MIN/MAX never probe: they retract exactly through their
            // aux frames.
            val acds = IncrementalView.sketchAggs(sh.aggs)
            val acdRetracts = sh.hasSketch &&
              sh.where.fold(oldSide)(w => oldSide.where(expr(w)))
                .limit(1).count() > 0
            val cds = IncrementalView.auxAggs(sh.aggs)
            // the delta frame feeds the main merge, every aux merge,
            // every overlay's touched set and the ACD recompute's
            // touched-group prune — persist it across those consumers
            // instead of re-running the touched state reads per plan,
            // then release it with the writes done
            val sdPin =
              if (cds.isEmpty && !acdRetracts) None
              else Some(
                IncrementalView.signedDelta(stored, oldSide, newSide, sh)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
            // released in the finally: a refresh that throws mid-way
            // (job failure, missing aux frame) must not leak the pin
            try {
              val (merged0, auxWrites) = sdPin match {
                case None =>
                  (IncrementalView.merge(stored, oldSide, newSide, sh),
                    Seq.empty[Long => Unit])
                case Some(sd) if cds.isEmpty =>
                  (IncrementalView.mergeSigned(stored, sd, sh.groupCols,
                    sh.aggs), Seq.empty[Long => Unit])
                case Some(sd) =>
                  mergeWithAux(name, prev,
                    IncrementalView.mergeSigned(stored, sd, sh.groupCols, sh.aggs),
                    sd, sh.groupCols, cds)
              }
              val merged =
                if (!acdRetracts) merged0
                else IncrementalView.overlaySketches(merged0,
                  IncrementalView.recomputeSketches(
                    pruneToTouchedGroups(
                      sh.filtered(stateAt(baseT, Some(horizon))),
                      sdPin.get, sh.groupKeys),
                    sh.groupKeys, acds),
                  sdPin.get, sh.groupCols, acds)
              tracer.span("mview-write") {
                encrypted(merged.write).mode("overwrite")
                  .parquet(catalog.mviewDataPath(name, prev + 1))
                // bucketed aux store + manifests, after the main
                // overwrite truncated the version dir
                auxWrites.foreach(_(prev + 1))
              }
              // ONE atomic catalog save: a version bump without the
              // horizon re-anchor would double-apply this delta on the
              // next refresh
              catalog.setMviewRefreshed(name, prev + 1, Map(baseT -> horizon))
            } finally sdPin.foreach(_.unpersist(false))
            } finally fusedPin.foreach(_.unpersist(false))
          }
          "refreshed_incremental"
        case (None, true) => joinShapeOf(viewSql) match {
          case Some(js) =>
            // INCREMENTAL join view: the counting-algorithm
            // TELESCOPING delta (round 17; for two tables,
            //   ΔA⋈B_new + A_old⋈ΔB)
            // over the touched rows of each side — exact under
            // ARBITRARY updates/deletes (join views carry only
            // retractable aggregates; a sketch-bearing join view
            // additionally probes the delta for negative-signed
            // sketch values — see the dispatch below).
            // Each Δ side is touched-pk-restricted like the
            // single-table path; every delta term carries at least
            // one Δ side, and for two-table views each FULL side
            // prunes to the other delta's join-key values when they
            // inline (≤ cap), so a small refresh reads only the
            // matching row groups of a 100 TB partner table instead
            // of scanning it.
            val bases = catalog.mviewBaseAll(name)
            val sides = js.tables
            if (!sides.forall(bases.contains))
              throw new IllegalStateException(
                s"$name has no recorded refresh horizon — run a full " +
                  "REFRESH first")
            for (tn <- sides) {
              catalog.require(tn)
              if (catalog.retentionFloor(tn) > bases(tn))
                throw new IllegalStateException(
                  s"events since the last refresh horizon " +
                    s"@SEQ:${bases(tn)} of $name were vacuumed — run a " +
                    "full (non-incremental) REFRESH")
              if (catalog.lastSeq(tn) < bases(tn))
                throw new IllegalStateException(
                  s"$name's refresh horizon @SEQ:${bases(tn)} is ahead " +
                    s"of $tn's sequence counter (${catalog.lastSeq(tn)}) " +
                    "— the table was dropped and recreated. Run a full " +
                    "(non-incremental) REFRESH")
            }
            val horizons = sides.map(tn => tn -> catalog.lastSeq(tn)).toMap
            if (sides.exists(tn => horizons(tn) > bases(tn))) {
              // Pin the touched delta sides (lazy — the cascade's
              // hop-0 key collect is the first materialization): the
              // k telescoping terms and the cascade sources each
              // re-reference these frames, and without the cache
              // every consumer would re-plan the touched-pk state
              // reads. O(touched) rows, so the pin is bounded.
              val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
              // every pin registers here and is released in the
              // finally below — a refresh that throws mid-way (job
              // failure, missing aux frame) must not leak cache
              // entries into the engine's lifetime
              val refreshPins =
                scala.collection.mutable.ArrayBuffer.empty[DataFrame]
              // synchronized: cascade hops pin from probe-pool threads
              def pin(df: DataFrame): DataFrame = {
                refreshPins.synchronized { refreshPins += df.persist(lvl) }
                df
              }
              // old/new state of the touched pks; an untouched side
              // contributes an empty delta (its terms vanish). Where
              // the two bounds share a checkpoint source, BOTH sides
              // come off one pinned two-bound collapse (round 16 —
              // one scan + one Exchange per table instead of two).
              // one touched-key collection per table, shared between
              // the delta restrictors (semi) and the derived
              // old-prefix anti filters below
              val touchedFiltersFor = scala.collection.mutable
                .Map.empty[String, (DataFrame => DataFrame, DataFrame => DataFrame)]
              def touchedFor(tn: String) =
                touchedFiltersFor.getOrElseUpdate(tn,
                  touchedFilters(catalog.require(tn), bases(tn), horizons(tn)))
              def deltaSides(tn: String): (DataFrame, DataFrame) =
                if (horizons(tn) <= bases(tn)) {
                  val empty = stateAt(tn, Some(horizons(tn))).where(lit(false))
                  (empty, empty)
                } else {
                  val td = catalog.require(tn)
                  val restrict = touchedFor(tn)._1
                  fusedHorizonStates(td, bases(tn), horizons(tn)) match {
                    case Some(f) => fusedSides(pin(restrict(f)))
                    case None =>
                      (pin(restrict(stateAt(tn, Some(bases(tn))))),
                        pin(restrict(stateAt(tn, Some(horizons(tn))))))
                  }
                }
              try {
              // pre-warm the per-table touched-key collections in
              // parallel: each is an independent pruned inline-key
              // collect (span-profiled ~0.1–0.3 s apiece, serial in
              // sides.map(deltaSides) otherwise); results land in the
              // share map on the statement thread, so deltaSides below
              // reads them back single-threaded
              tracer.span("touched-keys-warm", s"${sides.size} sides") {
                val touchedNames = sides.filter(tn => horizons(tn) > bases(tn))
                for ((tn, f) <- joinParallel(touchedNames)(tn =>
                    tn -> touchedFilters(catalog.require(tn), bases(tn),
                      horizons(tn))))
                  touchedFiltersFor(tn) = f
              }
              val deltas = sides.map(deltaSides)
              // Full-side pruning, any chain length (round 15,
              // generalizing the round-14 two-table case): every
              // telescoping term joins its full sides against exactly
              // one delta somewhere along the chain, so a full
              // side only contributes rows that REACH some touched
              // table's delta through the links. From each touched
              // table, cascade its delta's join-key values outward:
              // restrict the neighbor to those keys (a pruned scan by
              // pushdown below the cap, a left-semi against the
              // distributed distinct-key frame past it — round 16, no
              // hop ever abandons the path), derive the neighbor's
              // outgoing link keys from that restricted frame,
              // continue to ITS neighbors. Reachability passes through
              // full NEW state unioned with each hop table's OLD delta
              // rows — a term's Δ side can carry old-state rows
              // (deleted since the horizon) that a new-state-only
              // cascade would miss. A full side is pruned to the OR of
              // its per-source restrictions: a row reaching NO delta
              // can contribute to no term (for the singleton term {j}
              // it would have to reach Δj through full state — exactly
              // the cascade's reach relation). At 100 TB this is the
              // difference between a one-row refresh of a 4-table view
              // reading matching row groups of each partner vs
              // scanning every partner per term — and a bulk
              // backfill touching thousands of keys now degrades to
              // semi-joins on O(touched reach) key frames, never to
              // raw full partner scans.
              val fullNew = sides.map(tn => stateAt(tn, Some(horizons(tn))))
              val idxOf = sides.zipWithIndex
                .map { case (t, i) => t.toLowerCase -> i }.toMap
              // the chain's links as an adjacency list (a tree: each
              // link joins the new table to one earlier table)
              val adj = Array.fill(sides.size)(
                List.empty[(Int, String, String)])
              for ((q1, c1, q2, c2) <- js.links) {
                val (i1, i2) = (idxOf(q1.toLowerCase), idxOf(q2.toLowerCase))
                adj(i1) ::= ((i2, c1, c2))
                adj(i2) ::= ((i1, c2, c1))
              }
              val touchedIdx = sides.indices
                .filter(i => horizons(sides(i)) > bases(sides(i)))
              // legacy pre-r16 tables carrying __graft_ user columns
              // would collide with the cascade's minted key frames —
              // they skip pruning (unpruned full sides are correct,
              // just slower); see carriesHiddenCols
              val legacyHidden =
                sides.exists(tn => carriesHiddenCols(catalog.require(tn)))
              // preds(i): one restriction per touched source whose
              // cascade reached table i — inline predicate or
              // distributed key frame, always bounding
              val preds = Array.fill(sides.size)(List.empty[CascRestrict])
              // Each touched source's BFS is independent — it reads
              // only the pinned deltas, the full-new frames and the
              // adjacency, and every hop blocks on a driver-side key
              // collect. Serially that is k sources × up to (k−1)
              // hops of job latency back to back (span-profiled at
              // ~6 s of the all-five-churned refresh, 20 join-keys
              // collects); on the probe pool the refresh pays the
              // LONGEST source chain, not the sum. Results merge in
              // source order so the plan (the OR order of preds) is
              // identical to the sequential construction; hop tags
              // come off an atomic so minted key-frame columns stay
              // unique. pin() synchronizes on the pin registry.
              val hopTag = new java.util.concurrent.atomic.AtomicInteger(0)
              def cascadeOf(s: Int): List[(Int, CascRestrict)] = {
                val out = List.newBuilder[(Int, CascRestrict)]
                val visited = scala.collection.mutable.Set(s)
                var frontier: List[(Int, DataFrame)] =
                  List(s -> deltas(s)._1.unionByName(deltas(s)._2))
                while (frontier.nonEmpty) {
                  val next = List.newBuilder[(Int, DataFrame)]
                  for ((t, frame) <- frontier;
                       (u, ct, cu) <- adj(t) if !visited(u)) {
                    visited += u
                    val (r, restricted) = cascadeHop(frame, ct,
                      fullNew(u).unionByName(deltas(u)._1), cu, pin,
                      hopTag.getAndIncrement())
                    out += ((u, r))
                    next += ((u, restricted))
                  }
                  frontier = next.result()
                }
                out.result()
              }
              if (!legacyHidden)
                tracer.span("cascade-join", s"${touchedIdx.size} sources") {
                  for (rs <- joinParallel(touchedIdx)(cascadeOf);
                       (u, r) <- rs)
                    preds(u) ::= r
                }
              // Key-pruned fulls pin too when the chain has 3+ tables
              // (each full side then appears in 2^(n-1)−1 ≥ 3 terms;
              // at n=2 a full sits in exactly ONE term, so a pin only
              // costs) — but ONLY when every restriction is inline
              // (≤ cap keys per source): a semi-join restriction's
              // reach is unbounded relative to cache capacity (a bulk
              // backfill can make the "pruned" partner ≈ the partner
              // table), and caching ~a 100 TB table to executor disk
              // is worse than rescanning it — there the pinned KEY
              // frames keep the semi-join rebuild cheap and the plain
              // scan is the right plan, as before round 16.
              // Empty frames optimize to local relations, no pin.
              val fulls: Seq[DataFrame] =
                sides.indices.map { i =>
                  val ps = preds(i)
                  if (!touchedIdx.exists(_ != i))
                    // the only touched table is i itself: no term uses
                    // full_i (i sits in every nonvanishing S as a delta)
                    fullNew(i).where(lit(false))
                  else if (legacyHidden) fullNew(i)
                  else {
                    val pruned = applyCascade(fullNew(i), ps)
                    val bounded = ps.forall(_.isInstanceOf[CascInline])
                    if (sides.size >= 3 && bounded) pin(pruned) else pruned
                  }
                }
              val stored = spark.read.parquet(catalog.mviewDataPath(name, prev))
              // The telescoping delta's term for touched side i joins
              // OLD state for every side before i — for an untouched
              // side old equals new (reuse the pruned full), and a
              // TOUCHED side that precedes another touched side
              // DERIVES its old prefix from frames already in hand
              // (round 18, retiring the k−1 extra old-horizon scans
              // this branch used to pay): old state is exactly
              // (new state − touched pks) ∪ old rows of touched pks,
              // so the pruned-and-pinned full-new frame anti-filtered
              // by the same touched-key set, unioned with the pinned
              // old-delta side, IS the (pruned) old state — zero new
              // scans, one broadcast-able anti filter over a pinned
              // frame plus a churn-bounded union. Pruning stays sound:
              // rows the cascade dropped from full-new can reach no
              // delta in any term, and the delta-old rows ride in
              // unpruned (bounded by churn; over-inclusion never
              // changes a term's value, only its cost). Legacy
              // hidden-column tables keep the raw two-scan fallback —
              // their refresh path minted no touched-key frames.
              val fullOlds: Seq[DataFrame] = sides.indices.map { j =>
                if (touchedIdx.contains(j) && touchedIdx.exists(_ > j)) {
                  if (legacyHidden) stateAt(sides(j), Some(bases(sides(j))))
                  else touchedFor(sides(j))._2(fulls(j))
                    .unionByName(deltas(j)._1)
                } else fulls(j)
              }
              // statically-empty deltas drop their terms at
              // construction: k terms for k TOUCHED tables, so a
              // one-fact refresh of a 6-table view plans one term.
              // MULTI-touched refreshes (round 19, guide §2.6) build,
              // analyze and MATERIALIZE each term concurrently on the
              // probe pool: the merge consumes every term, so the
              // serial form executed one ~k·n-join action whose AQE
              // stage-jobs ran back to back — per-term pin jobs
              // overlap instead, and the merge then reads k pinned
              // O(touched-reach) frames (the same bound as every
              // other refresh pin; a pinned term is the term's
              // grouped-contribution rows, never a partner scan).
              // Item order through joinParallel keeps the union order
              // identical to the sequential construction.
              val sideFrames = sides.indices.map(i =>
                (deltas(i)._1, deltas(i)._2, fullOlds(i), fulls(i)))
              val untouchedSet =
                sides.indices.filterNot(touchedIdx.contains).toSet
              val delta =
                if (touchedIdx.size <= 1)
                  IncrementalView.joinSignedDelta(js, stored, sideFrames,
                    untouched = untouchedSet)
                else tracer.span("delta-terms", s"${touchedIdx.size} terms") {
                  joinParallel(sides.indices.filterNot(untouchedSet)) { i =>
                    val p = pin(IncrementalView.joinSignedDeltaTerm(
                      js, stored, sideFrames, i))
                    p.count() // materialize the pinned blocks
                    p
                  }.reduce(_ unionByName _)
                }
              val cds = IncrementalView.auxAggs(js.aggs)
              val acds = IncrementalView.sketchAggs(js.aggs)
              // persist the k-term delta across its consumers
              // (main merge, aux merges, overlays, the ACD probe),
              // like the single-table path
              val sdOpt =
                if (cds.isEmpty && acds.isEmpty) None else Some(pin(delta))
              // A sketch cannot retract a joined row, and the union
              // merge folds EVERY +1 row's value in — so it is sound
              // only when every +1 (group, value) pair truly exists in
              // the new joined state, EXACTLY ONCE. That holds when the
              // delta carries NO negative-signed sketch-value rows at
              // all: appends whose new rows join only pre-existing
              // partner rows (facts landing against stable dims — the
              // common shape) produce positive singleton terms only,
              // while telescoping's partition property (a joined row
              // enters the term of the FIRST side whose row is new)
              // keeps each pair to exactly once. Any negative row
              // means a retraction OR a cancelling cross-term pair —
              // a DELETE dim + INSERT fact in one window puts a −1 in
              // the dim's term (Δdim_old × fact_new) cancelled by a
              // +1 in the fact's term (dim_old × Δfact_new), and that
              // +1 is a PHANTOM that never existed in either state,
              // which a net-support probe would wave through into the
              // sketch. So the probe is the strictest
              // cheap condition: one limit-1 job over the pinned delta,
              // no aggregation, all ACD value columns at once; a
              // positive dispatches to the touched-group recompute over
              // the joined current state, exactly like the single-table
              // path. Conservative by design — a false positive costs
              // a recompute, never correctness.
              val acdRetracts = acds.nonEmpty && {
                val anyVal = acds.map(a =>
                  col(s"__val_${a.alias}").isNotNull).reduce(_ || _)
                sdOpt.get.where(col("__sign") === -1 && anyVal)
                  .limit(1).count() > 0
              }
              val (merged0, auxWrites) =
                if (cds.isEmpty)
                  (IncrementalView.mergeSigned(stored,
                    sdOpt.getOrElse(delta), js.groupCols, js.aggs),
                    Seq.empty[Long => Unit])
                else
                  mergeWithAux(name, prev,
                    IncrementalView.mergeSigned(stored, sdOpt.get,
                      js.groupCols, js.aggs),
                    sdOpt.get, js.groupCols, cds)
              val merged =
                if (!acdRetracts) merged0
                else IncrementalView.overlaySketches(merged0,
                  IncrementalView.recomputeSketches(
                    pruneToTouchedGroups(
                      recomputeJoinInput(js, sides, adj, fullNew,
                        sdOpt.get, pin),
                      sdOpt.get, js.groupKeys),
                    js.groupKeys, acds),
                  sdOpt.get, js.groupCols, acds)
              tracer.span("mview-write") {
                encrypted(merged.write).mode("overwrite")
                  .parquet(catalog.mviewDataPath(name, prev + 1))
                auxWrites.foreach(_(prev + 1))
              }
              catalog.setMviewRefreshed(name, prev + 1, horizons)
              } finally refreshPins.foreach(_.unpersist(false))
            }
            "refreshed_incremental"
          case None =>
            throw new IllegalArgumentException(
              s"$name is not incrementally maintainable: the view must be " +
                "SELECT <group cols>, COUNT/SUM/AVG/COUNT(DISTINCT)/" +
                "SUM(DISTINCT)/AVG(DISTINCT)/APPROX_COUNT_DISTINCT/" +
                "APPROX_PERCENTILE(e, p)/" +
                "MIN/MAX aggregates FROM " +
                "<engine table> [WHERE ...] GROUP BY <group cols>, or the " +
                "same aggregates FROM <table> JOIN <table> ON " +
                "<t1>.<col> = <t2>.<col> [WHERE ...] GROUP BY ... — run " +
                "a full REFRESH instead")
        }
        case (shapeOpt, false) =>
          // FULL refresh; maintainable shapes re-materialize through the
          // same aggregate (hidden support columns included) at a pinned
          // horizon so a later INCREMENTALLY continues from here
          shapeOpt match {
            case Some(sh) =>
              val horizon = catalog.lastSeq(sh.table)
              val st0 = stateAt(sh.table, Some(horizon).filter(_ > 0))
              encrypted(IncrementalView.aggregate(st0, sh).write)
                .mode("overwrite").parquet(catalog.mviewDataPath(name, prev + 1))
              writeAuxes(sh.filtered(st0),
                sh.groupKeys, IncrementalView.auxAggs(sh.aggs),
                name, prev + 1)
              catalog.setMviewRefreshed(name, prev + 1, Map(sh.table -> horizon))
            case None => joinShapeOf(viewSql) match {
              case Some(js) =>
                val hs = js.tables.map(tn => tn -> catalog.lastSeq(tn)).toMap
                val frames0 = js.tables.map(tn =>
                  stateAt(tn, Some(hs(tn)).filter(_ > 0)))
                encrypted(IncrementalView.aggregateJoin(frames0, js).write)
                  .mode("overwrite").parquet(catalog.mviewDataPath(name, prev + 1))
                writeAuxes(js.joined(frames0), js.groupKeys,
                  IncrementalView.auxAggs(js.aggs), name, prev + 1)
                catalog.setMviewRefreshed(name, prev + 1, hs)
              case None =>
                encrypted(select(viewSql).write).mode("overwrite")
                  .parquet(catalog.mviewDataPath(name, prev + 1))
                catalog.setMviewVersion(name, prev + 1)
            }
          }
          "refreshed"
      }
      // a successful explicit refresh un-mutes a previously failed
      // auto refresh — the operator's documented recovery path
      autoRefreshMuted -= name
      if (prev >= 1 && catalog.mviewVersion(name) > prev) {
        // reclaim version prev-1, NOT prev: a concurrent lock-free
        // reader may hold an already-analyzed plan over the version we
        // just superseded — one grace version keeps it scannable, and
        // storage stays bounded at two versions
        val p = new Path(catalog.mviewDataPath(name, prev - 1))
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        scala.util.Try(fs.delete(p, true))
        // bucketed aux stores (round 18): a store version stays alive
        // exactly as long as a RETAINED manifest (versions prev and
        // prev+1) points at one of its buckets; everything else —
        // including versions orphaned by a crash between bucket write
        // and catalog publish — reclaims here
        val auxAliases = (incShapeOf(viewSql).map(_.aggs)
          .orElse(joinShapeOf(viewSql).map(_.aggs)))
          .map(IncrementalView.auxGroups).getOrElse(Nil).map(_._1.alias)
        for (alias <- auxAliases) {
          val referenced = Seq(prev, prev + 1).flatMap(v =>
            readAuxManifest(catalog.mviewDataPath(name, v), alias)
              .toSeq.flatten).toSet
          val root = new Path(catalog.mviewAuxStoreRoot(name, alias))
          if (referenced.nonEmpty && fs.exists(root))
            scala.util.Try(fs.listStatus(root).foreach { st =>
              val n = st.getPath.getName
              if (n.startsWith("v=") &&
                  !referenced.contains(n.stripPrefix("v=").toLong))
                fs.delete(st.getPath, true)
            })
        }
      }
      summary(op, 0L, 0L)
    case Statement.CreateTrigger(name, timing, event, table, body) =>
      // UNCONDITIONAL superuser gate: a trigger body executes at fire
      // time under the FIRING session's authority — letting a
      // restricted session plant one is arbitrary-SQL escalation into
      // every other session that touches the table (PG gates trigger
      // DDL behind the TRIGGER privilege for the same reason)
      requireSuperuserAlways("CREATE TRIGGER")
      parseTriggerBody(body) // reject a malformed action at CREATE, not at first fire
      catalog.createTrigger(name, timing, event, table, body)
      summary("trigger_created", 0L, 0L)
    case Statement.DropTrigger(name, ifEx) =>
      requireSuperuserAlways("DROP TRIGGER")
      catalog.dropTrigger(name, ifEx)
      summary("trigger_dropped", 0L, 0L)
    case Statement.AlterTrigger(name, enable) =>
      requireSuperuserAlways("ALTER TRIGGER")
      catalog.setTriggerEnabled(name, enable)
      summary(if (enable) "trigger_enabled" else "trigger_disabled", 0L, 0L)
    case Statement.ShowTriggers =>
      import spark.implicits._
      catalog.triggerList
        .toDF("name", "timing", "event", "table", "body", "enabled")
    case Statement.CreateProcedure(name, params, body, orReplace) =>
      require(body.trim.nonEmpty, "procedure body is empty")
      catalog.createProcedure(name, params, body, orReplace)
      summary("procedure_created", 0L, 0L)
    case Statement.DropProcedure(name, ifEx) =>
      catalog.dropProcedure(name, ifEx)
      summary("procedure_dropped", 0L, 0L)
    case Statement.ShowProcedures =>
      import spark.implicits._
      catalog.procedureList.map { case (n, ps, b) => (n, ps.mkString(", "), b) }
        .toDF("name", "parameters", "body")
    case Statement.CreateSequence(name, start, inc, min, max, cycle) =>
      val increment = inc.getOrElse(1L)
      // PG/reference default start: 1 ascending, MAXVALUE descending
      val startV = start.getOrElse(
        if (increment > 0) min.getOrElse(1L) else max.getOrElse(-1L))
      catalog.createSequence(name, startV, increment, min, max, cycle)
      summary("sequence_created", 0L, 0L)
    case Statement.DropSequence(name, ifEx) =>
      catalog.dropSequence(name, ifEx)
      summary("sequence_dropped", 0L, 0L)
    case Statement.AlterSequenceRestart(name, withV) =>
      catalog.restartSequence(name, withV)
      summary("sequence_restarted", 0L, 0L)
    case Statement.ShowIndexes =>
      import spark.implicits._
      catalog.indexList.toDF("index", "table", "column")
    case Statement.RefreshAllMatViews(incremental) =>
      if (txn.isDefined)
        throw new IllegalStateException(
          "REFRESH ALL MATERIALIZED VIEWS cannot run inside a transaction")
      import spark.implicits._
      // one reentrant refresh per view, alphabetical; with
      // INCREMENTALLY, maintainable views merge their deltas and a
      // refused merge (vacuumed or recreated horizon)
      // falls back to a FULL refresh — the operator asked for
      // everything fresh, not for errors
      val rows = catalog.matviewList.map(_._1).sorted.map { n =>
        val viewSql = catalog.getView(n).get
        val op =
          if (incremental &&
              (incShapeOf(viewSql).isDefined ||
                joinShapeOf(viewSql).isDefined) &&
              catalog.mviewBaseAll(n).nonEmpty)
            try {
              sqlCurrent(s"REFRESH MATERIALIZED VIEW $n INCREMENTALLY")
              "refreshed_incremental"
            } catch {
              case scala.util.control.NonFatal(_) =>
                sqlCurrent(s"REFRESH MATERIALIZED VIEW $n")
                "refreshed_full_fallback"
            }
          else {
            sqlCurrent(s"REFRESH MATERIALIZED VIEW $n")
            "refreshed"
          }
        (n, op)
      }
      rows.toDF("name", "op")
    case Statement.AlterMatviewAutoRefresh(name, on, every) =>
      // authorization happens at FLAG time: the auto refresh itself
      // executes under a system session (a restricted writer's INSERT
      // must neither starve the view nor persist an RLS-filtered one)
      requireSuperuser("ALTER MATERIALIZED VIEW ... SET AUTOREFRESH")
      if (!catalog.isMaterialized(name))
        throw new IllegalArgumentException(s"materialized view not found: $name")
      if (!on && every.isDefined)
        throw new IllegalArgumentException(
          "EVERY n EVENTS applies to AUTOREFRESH ON, not OFF")
      if (every.exists(_ < 1))
        throw new IllegalArgumentException(
          "AUTOREFRESH EVERY must be at least 1 event")
      if (on) {
        // only incrementally MAINTAINABLE shapes qualify — since round
        // 15 that includes APPROX_COUNT_DISTINCT views (a retraction
        // dispatches to the touched-group sketch recompute instead of
        // refusing), so an auto refresh can never fail a statement
        // that already committed
        val viewSql = catalog.getView(name).get
        val retractable = incShapeOf(viewSql).isDefined ||
          joinShapeOf(viewSql).isDefined
        if (!retractable)
          throw new IllegalArgumentException(
            s"$name cannot AUTOREFRESH: only incrementally maintainable " +
              "views (COUNT/SUM/AVG/COUNT(DISTINCT)/SUM(DISTINCT)/" +
              "AVG(DISTINCT)/MIN/MAX/APPROX_COUNT_DISTINCT/" +
              "APPROX_PERCENTILE, single-table or join shape) " +
              "qualify — this view refreshes by full rerun")
        // without recorded horizons the due check can never fire and
        // the flag would be silently inert (e.g. a view stored by an
        // older engine as full-rerun)
        if (catalog.mviewBaseAll(name).isEmpty)
          throw new IllegalStateException(
            s"$name has no recorded refresh horizon — run a full " +
              "REFRESH first, then enable AUTOREFRESH")
        // an aux-backed view whose stored version predates its aux
        // frames (e.g. a MIN/MAX view from before exact retraction)
        // would pass the shape check, then the FIRST auto refresh
        // would fail and mute — fail the ALTER now with the fix
        // instead of turning "always fresh" into "silently stale"
        val auxAliases = incShapeOf(viewSql).map(_.aggs)
          .orElse(joinShapeOf(viewSql).map(_.aggs))
          .map(IncrementalView.auxGroups).getOrElse(Nil).map(_._1.alias)
        if (auxAliases.nonEmpty) {
          val ver = catalog.mviewVersion(name)
          val fs = new Path(catalog.mviewDataPath(name, ver))
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          // a bucketed manifest (round 18) or a legacy monolithic
          // dir both count as "aux present"
          val missing = auxAliases.filterNot(a =>
            fs.exists(new Path(catalog.mviewDataPath(name, ver) + "/" +
              IncrementalView.auxManifestFile(a))) ||
            fs.exists(new Path(catalog.mviewDataPath(name, ver) + "/" +
              IncrementalView.auxDir(a))))
          if (missing.nonEmpty)
            throw new IllegalStateException(
              s"$name's stored version predates its aux frames " +
                s"(${missing.mkString(", ")}) — run a full REFRESH " +
                "once to build them, then enable AUTOREFRESH")
        }
      }
      autoRefreshMuted -= name
      catalog.setMviewAutoRefresh(name, on, every.getOrElse(1L))
      summary(if (on) "autorefresh_enabled" else "autorefresh_disabled", 0L, 0L)
    case Statement.ShowMatviews =>
      // driver-side catalog walk: kind re-derives from the stored SQL
      // (the same shape tests the refresh dispatch uses), staleness =
      // events appended to any base table since its recorded horizon —
      // the number the operator needs to decide whether REFRESH
      // INCREMENTALLY is due. Zero Spark jobs EXCEPT for views carrying
      // APPROX_PERCENTILE, which pay one bounded aggregation over the
      // stored view (group-cardinality rows, not base-table rows) to
      // report the per-group exactness regime
      import spark.implicits._
      catalog.matviewList.map { case (n, viewSql, ver) =>
        val single = incShapeOf(viewSql)
        val join = if (single.isEmpty) joinShapeOf(viewSql) else None
        val kind =
          if (single.isDefined) "incremental"
          else if (join.isDefined) "incremental_join"
          else "full_rerun"
        // APPROX_PERCENTILE's maintainable form has a conditional
        // exactness contract (see PctlExpr) — surface it where the
        // operator looks, not only in scaladoc
        val pctlSupports: Seq[String] =
          single.map(_.aggs).orElse(join.map(_.aggs)).getOrElse(Nil)
            .collect { case p: IncrementalView.PctlExpr =>
              IncrementalView.supportCol(p.alias) }
        val notes: Option[String] =
          if (pctlSupports.isEmpty) None
          else Some("approx_percentile surfaces DOUBLE; exact " +
            s"quantile while a group holds <= ${IncrementalView.KllK} " +
            "values, ~0.58% KLL rank error past it (incremental and " +
            "full refresh may differ within that bound)")
        // quantile_exact: 'all' while EVERY group's sketch is still in
        // its exact (uncompacted) regime, 'partial' once any group has
        // folded more than KllK values. Sound because every refresh
        // leaves each sketch fed with exactly the group's live values
        // (append merges add them; any retraction dispatches the
        // touched-group recompute, which rebuilds from live state), so
        // the hidden per-group support count IS the sketch's n.
        val quantileExact: Option[String] =
          if (pctlSupports.isEmpty) None
          else Some {
            val maxN = spark.read.parquet(catalog.mviewDataPath(n, ver))
              .agg(max(greatest(
                pctlSupports.map(c => coalesce(col(c), lit(0L)))
                  :+ lit(0L): _*)))
              .head().get(0)
            // an empty view aggregates to NULL — vacuously all-exact
            if (maxN == null ||
                maxN.asInstanceOf[Long] <= IncrementalView.KllK) "all"
            else "partial"
          }
        val bases = catalog.mviewBaseAll(n).toSeq.sortBy(_._1)
        (n, ver, kind, catalog.isMviewAutoRefresh(n),
          if (bases.isEmpty) None else Some(bases.map(_._1).mkString(",")),
          if (bases.isEmpty) None
          else Some(bases.map { case (t, r) => s"$t@$r" }.mkString(",")),
          // a DROPPED base has no sequence counter, and a RECREATED
          // one restarts below the horizon — either way the difference
          // would go negative; staleness is unknowable, report NULL
          // like a full-rerun view
          if (bases.isEmpty || bases.exists { case (t, r) =>
            catalog.get(t).isEmpty || catalog.lastSeq(t) < r })
            None
          else Some(bases.map { case (t, r) => catalog.lastSeq(t) - r }.max),
          // muted = an AUTOREFRESH attempt failed and the view is
          // waiting for an explicit REFRESH — the answer to "why is
          // my always-fresh view stale?"
          autoRefreshMuted.contains(n),
          // the debounce threshold (EVERY n EVENTS), NULL when not
          // flagged, then the exactness-contract note and the live
          // regime — appended last so no index-addressed consumer
          // shifts
          catalog.mviewAutoEvery(n), notes, quantileExact)
      }.toDF("name", "version", "kind", "autorefresh", "base_tables",
        "horizons", "stale_events", "muted", "autorefresh_every", "notes",
        "quantile_exact")
    case Statement.ShowSequences =>
      import spark.implicits._
      catalog.sequenceList.map(s => (s.name, s.start, s.increment,
        s.minValue, s.maxValue, s.cycle, s.current,
        s.ownedBy.map(o => s"${o._1}.${o._2}")))
        .toDF("name", "start", "increment", "min_value", "max_value",
          "cycle", "last_value", "owned_by")
    case Statement.AlterTableRls(table, enable) =>
      // UNCONDITIONAL: RLS filters apply regardless of the privilege
      // gate, so a restricted session must never be able to switch
      // them off (or rewrite the policies) for itself
      requireSuperuserAlways("ALTER TABLE ... ROW LEVEL SECURITY")
      catalog.setRlsEnabled(table, enable)
      summary(if (enable) "rls_enabled" else "rls_disabled", 0L, 0L)
    case Statement.CreatePolicy(name, table, cmd, roles, permissive, usingE, checkE) =>
      requireSuperuserAlways("CREATE POLICY")
      catalog.createPolicy(graft.catalog.PolicyDef(
        name, table, cmd, roles, permissive, usingE, checkE))
      summary("policy_created", 0L, 0L)
    case Statement.DropPolicy(name, table, ifEx) =>
      requireSuperuserAlways("DROP POLICY")
      catalog.dropPolicy(table, name, ifEx)
      summary("policy_dropped", 0L, 0L)
    case Statement.ShowPolicies =>
      import spark.implicits._
      catalog.policyList.map(p => (p.name, p.table, p.command,
        if (p.roles.isEmpty) "PUBLIC" else p.roles.mkString(", "),
        if (p.permissive) "PERMISSIVE" else "RESTRICTIVE",
        p.usingExpr.getOrElse(""), p.checkExpr.getOrElse("")))
        .toDF("name", "table", "command", "roles", "kind", "using", "check")
    case Statement.SetRole(user) =>
      // SET ROLE narrows to a role the session's BASE context is a
      // member of (PG gates membership the same way); RESET ROLE
      // restores that base context — never an unconditional superuser,
      // which would let any restricted session escalate past RLS and
      // GRANT checks with one statement.
      user match {
        case Some(u) =>
          if (!current.baseSuperuser && u != current.baseUser &&
              !current.baseRoles.contains(u) &&
              // memberships store lowercased role keys — match them
              !catalog.rolesOf(current.baseUser).contains(u.toLowerCase))
            throw new SecurityException(s"permission denied to set role: $u")
          current.user = u; current.roles = Set(u); current.superuser = false
        case None =>
          current.user = current.baseUser
          current.roles = current.baseRoles
          current.superuser = current.baseSuperuser
      }
      summary("role_set", 0L, 0L)
    case Statement.Grant(privs, table, grantees) =>
      requireSuperuser("GRANT")
      catalog.grant(table, privs, grantees)
      summary("granted", 0L, 0L)
    case Statement.Revoke(privs, table, grantees) =>
      requireSuperuser("REVOKE")
      catalog.revoke(table, privs, grantees)
      summary("revoked", 0L, 0L)
    case Statement.ShowGrants =>
      import spark.implicits._
      catalog.grantList.toDF("table", "privilege", "grantee")
    case Statement.CreateRole(name, perms) =>
      requireSuperuser("CREATE ROLE")
      catalog.createRole(name, perms.toSet)
      summary("role_created", 0L, 0L)
    case Statement.DropRole(name, ifEx) =>
      requireSuperuser("DROP ROLE")
      catalog.dropRole(name, ifEx)
      summary("role_dropped", 0L, 0L)
    case Statement.GrantRole(role, users) =>
      // the reference's Admin bundle carries GrantRole but not
      // GrantPermission (rbac.rs:268-295): role membership is
      // delegable one level below superuser — EXCEPT membership in a
      // SUPERUSER-bundle role, which would let an admin self-escalate
      // past every gate with one statement (a deliberate deviation:
      // rbac.rs:381 grant_role checks only the role's existence)
      if (catalog.rolePerms(role).contains("SUPERUSER"))
        requireSuperuserAlways("GRANT ROLE (superuser bundle)")
      else requirePerm("GRANT ROLE", "GRANT_ROLE")
      users.foreach(catalog.grantRole(_, role))
      summary("role_granted", 0L, 0L)
    case Statement.RevokeRole(role, users) =>
      // symmetric: only a superuser may strip superuser membership
      if (catalog.rolePerms(role).contains("SUPERUSER"))
        requireSuperuserAlways("REVOKE ROLE (superuser bundle)")
      else requirePerm("REVOKE ROLE", "GRANT_ROLE")
      users.foreach(catalog.revokeRole(_, role))
      summary("role_revoked", 0L, 0L)
    case Statement.ShowRoles =>
      import spark.implicits._
      val members = catalog.roleMembers.groupBy(_._2)
        .view.mapValues(_.map(_._1).sorted.mkString(", ")).toMap
      catalog.roleList.map { case (r, sys, ps) =>
        (r, if (sys) "SYSTEM" else "CUSTOM",
          ps.toSeq.sorted.mkString(", "), members.getOrElse(r, ""))
      }.toDF("role", "kind", "permissions", "members")
    case Statement.SetPrivileges(on) =>
      requireSuperuser("SET PRIVILEGES")
      privilegesEnabled = on
      summary(if (on) "privileges_enabled" else "privileges_disabled", 0L, 0L)
    case Statement.SetAudit(on) =>
      // UNCONDITIONAL: a session that can silence the audit trail can
      // cover its own tracks — trail integrity must not depend on the
      // separate privilege gate being switched on
      requireSuperuserAlways("SET AUDIT")
      auditEnabled = on
      summary(if (on) "audit_enabled" else "audit_disabled", 0L, 0L)
    case Statement.ShowAudit =>
      requirePerm("SHOW AUDIT", "VIEW_AUDIT")
      showAudit()
    case Statement.BackupDb(dir, parent) =>
      // a backup copies the RAW table files — every row, regardless of
      // RLS visibility — so it is superuser-only once the gate is on
      requireSuperuser("BACKUP")
      // the audit tail flushes first so the backup carries the full
      // trail up to (excluding) the BACKUP statement itself
      flushAudit()
      // runs under the statement lock, so no publish is in flight and
      // the copied file set is a consistent committed state; staging
      // dirs and the liveness lock are excluded by the lister
      if (txn.isDefined)
        throw new IllegalStateException("BACKUP cannot run inside a transaction")
      // the manifest records each table's sequence high-water mark —
      // the identification data SHOW BACKUPS lists and RESTORE ... AS
      // OF @SEQ:N cuts the chain by
      val (recorded, copied) = Backup.create(spark, baseDir, dir, parent,
        tableSeqs = catalog.tableNames.map(t => t -> catalog.lastSeq(t)).toMap)
      spark.range(1).select(lit("backup").as("op"),
        lit(recorded).as("files"), lit(copied).as("copied"),
        lit(dir).as("path"))
    case Statement.ShowCluster =>
      requirePerm("SHOW CLUSTER", "VIEW_METRICS")
      showCluster()
    case Statement.ShowBackups(dir) =>
      requireSuperuser("SHOW BACKUPS") // paths + sizes are operator data
      import spark.implicits._
      Backup.list(spark, dir)
        .map(b => (b.path, b.parent.getOrElse(""),
          b.created.map(ms => new java.sql.Timestamp(ms)).orNull,
          b.seq, b.tables, b.files, b.copied, b.bytes))
        .toDF("path", "parent", "created", "seq", "tables", "files",
          "copied", "bytes")
    case Statement.PruneBackups(dir, keep, olderDays, dryRun) =>
      requireSuperuser("PRUNE BACKUPS") // deletes restore points
      if (txn.isDefined)
        throw new IllegalStateException(
          "PRUNE BACKUPS cannot run inside a transaction")
      import spark.implicits._
      Backup.prune(spark, dir, keep,
          olderDays.map(_.toLong * 24L * 60L * 60L * 1000L), dryRun)
        .toDF("path", "action")
    case Statement.RestoreDb(dir, asOfSeq) =>
      requireSuperuser("RESTORE") // replaces the whole database
      if (txn.isDefined)
        throw new IllegalStateException("RESTORE cannot run inside a transaction")
      ensureWriteLock() // exclusive: no other live writer during the swap
      val prevTables = catalog.tableNames
      val (restoredFrom, n) = asOfSeq match {
        case Some(seq) => Backup.restoreAsOf(spark, dir, baseDir, seq)
        case None => (dir, Backup.restore(spark, dir, baseDir))
      }
      catalog.reload()
      lastSnapSeqs.clear()
      // the audit trail is database state: the restore swapped its
      // files, so the unflushed tail is void and ids re-prime from the
      // restored log (the RESTORE record itself lands after, re-primed)
      auditBuf.clear()
      auditNextId = None
      // stale temp views for tables that no longer exist must stop
      // resolving (the select path re-registers live ones lazily)
      for (t <- prevTables if catalog.get(t).isEmpty)
        spark.catalog.dropTempView(t)
      spark.range(1).select(lit("restore").as("op"),
        lit(n).as("files"), lit(restoredFrom).as("path"))
    case Statement.VerifyBackup(dir) =>
      val (checked, bad) = Backup.verify(spark, dir)
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"backup verification failed (${bad.size}/${checked}): " +
            bad.take(3).mkString("; "))
      spark.range(1).select(lit("verify").as("op"),
        lit(checked).as("files"), lit("ok").as("status"))
    case Statement.Call(name, args) => callProcedure(name, args)
    case Statement.DropTable(name, ifEx) =>
      // destructive DDL under the gate; the admin bundle carries
      // DropTable (rbac.rs:268)
      requirePerm("DROP TABLE", "DROP_TABLE")
      // dropping a table with buffered writes would orphan them, and the
      // storage delete cannot be rolled back — keep DROP out of txns
      if (txn.isDefined)
        throw new IllegalStateException("DROP TABLE cannot run inside a transaction")
      // RESTRICT, like FK deletes: dropping a parent would leave child
      // FKs pointing at a vanished table (a dangling-registry state the
      // reference tolerates — fk.rs:68-71 forgets only the child side)
      if (catalog.get(name).isDefined) {
        val children = catalog.referencingFks(name).collect {
          case (child, c, _) if child != name => s"$child.$c"
        }
        if (children.nonEmpty)
          throw new IllegalStateException(
            s"cannot drop $name: referenced by ${children.mkString(", ")}")
      }
      catalog.dropTable(name, ifEx)
      lastSnapSeqs.remove(name) // a recreated table starts fresh
      // the select path registers session temp views lazily; drop any
      // stale one so the name stops resolving immediately
      spark.catalog.dropTempView(name)
      summary("dropped", 0L, 0L)
    case Statement.DropView(name, ifEx) =>
      catalog.dropView(name, ifEx)
      spark.catalog.dropTempView(name)
      summary("dropped", 0L, 0L)
    // TRUNCATE routes through delete(), which already enforces the
    // DELETE privilege and removes only RLS-visible rows
    case Statement.Truncate(table) =>
      // TRUNCATE is its own permission class (PG does the same): full
      // DML rights do not include emptying a shared table wholesale.
      // The DELETE privilege check inside delete() still applies too.
      requirePerm("TRUNCATE", "TRUNCATE")
      truncate(table)
    case Statement.AlterAdd(table, c, ddl) =>
      requirePerm("ALTER TABLE", "ALTER_TABLE")
      require(!IncrementalView.hidden(c),
        s"column name $c is reserved: __graft_ is the engine's " +
          "hidden-column namespace")
      catalog.addColumn(table, c, DataType.fromDDL(ddl))
      summary("altered", 0L, catalog.lastSeq(table))
    case Statement.AlterRename(table, from, to) =>
      requirePerm("ALTER TABLE", "ALTER_TABLE")
      require(!IncrementalView.hidden(to),
        s"column name $to is reserved: __graft_ is the engine's " +
          "hidden-column namespace")
      catalog.renameColumn(table, from, to)
      summary("altered", 0L, catalog.lastSeq(table))
    case Statement.AlterDrop(table, c) =>
      requirePerm("ALTER TABLE", "ALTER_TABLE")
      catalog.dropColumn(table, c)
      summary("altered", 0L, catalog.lastSeq(table))
    case Statement.InsertValues(table, cols, valuesSql) =>
      insertFrom(table, cols,
        spark.sql(s"SELECT * FROM ${rewriteSequenceCalls(valuesSql)}"))
    case Statement.InsertSelect(table, cols, sel) =>
      // a textual rewrite would draw ONCE for all N source rows; the
      // per-row shape is an AUTO_INCREMENT column (block-reserved,
      // distributed) — fail clearly instead of silently mis-assigning
      if (mentionsSequenceCall(sel))
        throw new IllegalArgumentException(
          "nextval/currval in INSERT ... SELECT draws once per statement, " +
            "not per row — use an AUTO_INCREMENT column instead")
      // the source's row order becomes per-row sequence assignment, so
      // every table read inside it must pin the keyed plan (the same
      // invariant update/delete hold): a flat-certified source would
      // otherwise serve log-file order bare but windowed order inside
      // a transaction with buffered writes on it. The scope flag covers
      // arbitrarily nested source reads; plan choice happens at build
      // time, and statements are monitor-serialized, so a var suffices.
      val src = {
        dmlReadScope = true
        try select(sel) finally dmlReadScope = false
      }
      insertFrom(table, cols, src)
    case Statement.Update(table, assigns, where) => update(table, assigns, where)
    case Statement.Delete(table, where) => delete(table, where)
    case Statement.Snapshot(table) =>
      requirePerm("SNAPSHOT", "CREATE_SNAPSHOT")
      // a snapshot reads events() which includes buffered uncommitted
      // writes — persisting those would leak rolled-back data
      if (txn.isDefined)
        throw new IllegalStateException("SNAPSHOT cannot run inside a transaction")
      snapshot(table)
    case Statement.Optimize(table, zcols) =>
      if (txn.isDefined)
        throw new IllegalStateException("OPTIMIZE cannot run inside a transaction")
      // a bare OPTIMIZE adopts the composite index declaration as its
      // Z-order hint: the operator already said which columns arrive
      // together in point probes
      optimize(table,
        if (zcols.nonEmpty) zcols else catalog.compositeIndexColumns(table))
    case Statement.VacuumRetain(table, retainSeq) =>
      if (txn.isDefined)
        throw new IllegalStateException("VACUUM RETAIN cannot run inside a transaction")
      vacuumRetain(table, retainSeq)
    case Statement.DiffTable(table, a, b) => diff(table, a, b)
    case Statement.Explain(inner, analyze, format) => explain(inner, analyze, format)
    case Statement.Analyze(table) => analyze(table)
    case Statement.CheckTable(table, full) => checkTable(table, full)
    case Statement.RepairTable(table) => repairTable(table)
    case Statement.ShowTables => showTables()
    case Statement.ShowCreateTable(table) => showCreateTable(table)
    case Statement.Describe(table) => describe(table)
    case Statement.CopyFrom(table, path, format) =>
      ingestFile(table, path, format.getOrElse(inferCopyFormat(path)))
    case Statement.CopyTo(source, path, format, zorderBy) =>
      // through select(): RLS filters and the SELECT privilege apply,
      // and both a bare table name and a (subquery) work
      val inner =
        if (source.startsWith("(")) source.substring(1, source.length - 1)
        else s"SELECT * FROM $source"
      val selected = select(inner)
      // ZORDER (c1, ...): cluster the export layout so the CONSUMER's
      // filtered scans skip row groups on every listed column — the
      // shape a training-data shard hand-off wants
      val df =
        if (zorderBy.isEmpty) selected
        else {
          val missing = zorderBy.filterNot(z =>
            selected.columns.exists(_.equalsIgnoreCase(z)))
          require(missing.isEmpty,
            s"ZORDER column(s) not in the exported result: ${missing.mkString(", ")}")
          // ZOrder.cluster re-reads its input (count + one boundary
          // sample per column + the write) — pin the governed select
          // once so an expensive export query never runs 3-4x; the
          // OPTIMIZE path gets the same for free by reading its
          // materialized checkpoint
          graft.operators.ZOrder.cluster(pinCheckpoint(selected), zorderBy,
            spark.sessionState.conf.numShufflePartitions)
        }
      try {
        val w = encrypted(df.write).mode("overwrite")
        format.getOrElse(inferCopyFormat(path)) match {
          case "jsonl" | "json" => w.json(path)
          case "parquet" => w.parquet(path)
          case "csv" => w.option("header", "true").csv(path)
          case other => throw new IllegalArgumentException(
            s"unsupported COPY format: $other (JSONL | PARQUET | CSV)")
        }
      } finally if (zorderBy.nonEmpty) unpersistPinned(df)
      spark.range(1).select(lit("export").as("op"),
        lit(path).as("path"))
    case Statement.SetCache(on) =>
      cacheEnabled = on
      if (!on) { dropAllCached(); cacheHits = 0L; cacheMisses = 0L }
      summary(if (on) "cache_enabled" else "cache_disabled", 0L, 0L)
    case Statement.ShowCache =>
      spark.range(1).select(lit(cacheEnabled).as("enabled"),
        lit(resultCache.size().toLong).as("entries"),
        lit(cacheHits).as("hits"), lit(cacheMisses).as("misses"))
    case Statement.ClearCache =>
      dropAllCached()
      summary("cache_cleared", 0L, 0L)
    case Statement.SetStatementTimeout(ms) =>
      current.statementTimeoutMs = ms
      summary("timeout_set", ms, 0L)
    case Statement.ShowMetrics =>
      requirePerm("SHOW METRICS", "VIEW_METRICS")
      showMetrics()
    case Statement.ShowStorage(t) => showStorage(t)
    case Statement.ShowStats(t) => showStats(t)
    case Statement.ShowHistogram(t, c) => showHistogram(t, c)
    case Statement.SetSecurityMonitor(on) =>
      // like SET AUDIT: a session that can silence the monitor can hide
      // its own traces — unconditionally superuser-only
      requireSuperuserAlways("SET SECURITY_MONITOR")
      security.enabled = on
      summary(if (on) "security_enabled" else "security_disabled", 0L, 0L)
    case Statement.SetSecurityAutoblock(on) =>
      requireSuperuserAlways("SET SECURITY_AUTOBLOCK")
      security.autoBlock = on
      summary(if (on) "autoblock_enabled" else "autoblock_disabled", 0L, 0L)
    case Statement.ShowSecurityThreats =>
      requireSuperuser("SHOW SECURITY THREATS")
      import spark.implicits._
      security.threatRows.toDF("threat_id", "threat_type", "severity",
        "source", "user", "signal")
    case Statement.ShowSecurityStats =>
      requireSuperuser("SHOW SECURITY STATS")
      import spark.implicits._
      security.statRows.toDF("stat", "value")
    case Statement.ShowSessions =>
      requireSuperuser("SHOW SESSIONS")
      import spark.implicits._
      security.sessionRows.toDF("session_id", "user", "statements",
        "failed", "rows_accessed", "tables_accessed", "risk_score")
    case Statement.CreateAlert(name, metric, op, threshold, severity) =>
      // an alerting control, like SET AUDIT: always superuser-only
      requireSuperuserAlways("CREATE ALERT")
      createAlert(name, metric, op, threshold, severity)
    case Statement.DropAlert(name, ifExists) =>
      requireSuperuserAlways("DROP ALERT")
      val existed = catalog.dropAlert(name)
      alertFired.remove(name)
      alertState.remove(name) // history keeps the dropped rule's past
      if (!existed && !ifExists)
        throw new IllegalArgumentException(s"no alert named $name")
      summary("drop_alert", if (existed) 1L else 0L, 0L)
    case Statement.ShowAlerts =>
      requireSuperuser("SHOW ALERTS")
      showAlerts()
    case Statement.ShowOptimizations =>
      requirePerm("SHOW OPTIMIZATIONS", "VIEW_METRICS")
      import spark.implicits._
      optimizationSuggestions().toDF("category", "priority", "suggestion")
    case Statement.SetSlowLog(ms) =>
      slowLogThresholdMs = ms
      if (ms == 0) slowLog.clear()
      summary("slow_log_set", ms, 0L)
    case Statement.ShowPerf =>
      requirePerm("SHOW PERF", "VIEW_METRICS")
      showPerf()
    case Statement.SetTrace(on) =>
      tracer.enabled = on
      if (!on) tracer.clear()
      summary(if (on) "trace_enabled" else "trace_disabled", 0L, 0L)
    case Statement.ShowTraces =>
      requirePerm("SHOW TRACES", "VIEW_METRICS")
      import spark.implicits._
      tracer.traces.map(t => (t.traceId, t.statement, t.totalMs,
        t.spans.size.toLong))
        .toDF("trace_id", "statement", "total_ms", "spans")
    case Statement.ShowTrace(id) =>
      requirePerm("SHOW TRACE", "VIEW_METRICS")
      import spark.implicits._
      val tr = tracer.spansOf(id).getOrElse(throw new IllegalArgumentException(
        s"no trace $id (SHOW TRACES lists recorded ids; tracing keeps " +
          "the newest 64)"))
      tr.spans.map(s => (s.traceId, s.spanId, s.parentId, s.name,
        s.detail, s.startMs, s.durMs, s.ok))
        .toDF("trace_id", "span_id", "parent_span_id", "name", "detail",
          "start_ms", "dur_ms", "ok")
    case Statement.SetRateLimit(qps, burst) =>
      // a protection control, like SET AUDIT: active regardless of the
      // privilege gate, so only superusers may move it
      requireSuperuserAlways("SET RATE_LIMIT")
      rateLimitQps = qps.getOrElse(0.0)
      rateLimitBurst = qps.fold(0.0)(q =>
        burst.map(_.toDouble).getOrElse(math.max(1.0, q)))
      summary(if (qps.isDefined) "rate_limit_set" else "rate_limit_off",
        0L, rateLimitBurst.toLong)
    case Statement.SetEncryptionKey(b64) =>
      // unconditional (not just when the privilege gate is on): the key
      // registry is process-wide — a restricted session re-keying it
      // would break every other engine's encrypted reads in this JVM
      if (!current.superuser)
        throw new SecurityException(
          "permission denied: SET ENCRYPTION KEY requires superuser")
      val key = try java.util.Base64.getDecoder.decode(b64)
        catch { case _: IllegalArgumentException =>
          throw new IllegalArgumentException("encryption key is not valid base64") }
      Encryption.register(Encryption.MasterKeyId, key)
      // activates PME on the session for BOTH write and read — already-
      // encrypted files become readable the moment the key registers
      Encryption.HadoopConf.foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v) }
      encryptionOn = true
      summary("encryption_enabled", 0L, 0L)
    case Statement.SetEncryptionOff =>
      if (!current.superuser)
        throw new SecurityException(
          "permission denied: SET ENCRYPTION requires superuser")
      // stop encrypting NEW writes; leave the factory + key registered
      // so existing encrypted files stay readable
      encryptionOn = false
      summary("encryption_disabled", 0L, 0L)
    case Statement.CreateMigration(ver, up, down) =>
      require(up.trim.nonEmpty, "migration UP script is empty")
      catalog.createMigration(ver, up, down)
      summary("migration_created", 0L, 0L)
    case Statement.Migrate =>
      // migrations run DDL (non-transactional) — same rule as DDL itself
      if (txn.isDefined)
        throw new IllegalStateException("MIGRATE cannot run inside a transaction")
      val pending = catalog.migrationList.filter(!_._4)
      // apply in version order; a failing migration stops the chain
      // with everything before it applied (migration.rs:489-530
      // migrate_all applies one at a time the same way)
      for ((ver, up, _, _) <- pending) {
        sqlScript(up)
        catalog.markMigrationApplied(ver, applied = true)
      }
      summary("migrated", pending.size.toLong, 0L)
    case Statement.RollbackMigration =>
      if (txn.isDefined)
        throw new IllegalStateException(
          "ROLLBACK MIGRATION cannot run inside a transaction")
      val applied = catalog.migrationList.filter(_._4)
      if (applied.isEmpty)
        throw new IllegalStateException("no applied migration to roll back")
      val (ver, _, down, _) = applied.last // newest by version order
      val script = down.getOrElse(throw new IllegalStateException(
        s"migration $ver has no DOWN script"))
      sqlScript(script)
      catalog.markMigrationApplied(ver, applied = false)
      summary("migration_rolled_back", 1L, 0L)
    case Statement.ShowMigrations =>
      import spark.implicits._
      catalog.migrationList
        .map { case (v, _, down, applied) => (v, applied, down.isDefined) }
        .toDF("version", "applied", "has_down")
    case Statement.Select(q) => cachedSelect(q)
    case Statement.Begin | Statement.Commit | _: Statement.Rollback |
        _: Statement.Savepoint | _: Statement.ReleaseSavepoint =>
      throw new IllegalStateException("unreachable: txn control is handled in sql()")
  }

  // ========================================================== read path

  def select(sqlText: String): DataFrame = {
    val (clean, st) = TemporalPre.extract(sqlText)
    val cache = scala.collection.mutable.Map.empty[(String, SystemTime), DataFrame]
    val bound = scala.collection.mutable.Map.empty[String, SystemTime]
    val masked = maskNonCode(clean)
    // the views the statement references directly, with the spec each
    // must END UP bound at (its own FOR SYSTEM_TIME, else the
    // statement's)
    val directViews = catalog.viewNames
      .filter(referencesWord(masked, _))
      .map { v =>
        if (catalog.isMaterialized(v)) {
          // a matview is a snapshot of its last REFRESH — it has no
          // event history to travel; serving current data under an
          // explicit temporal spec would be silently wrong, so raise
          if (st != SystemTime.Current)
            throw new IllegalArgumentException(
              s"materialized view $v is not temporal: FOR SYSTEM_TIME does not apply to it")
          v -> SystemTime.Current
        } else {
          val (_, vSt) = TemporalPre.extract(catalog.getView(v).get)
          v -> (if (vSt == SystemTime.Current) st else vSt)
        }
      }
    // fixpoint over view registration: a pinned view's subtree can
    // rebind a shared sub-view away from the spec the statement (or an
    // earlier sibling) needs; each pass re-expands only mis-bound
    // views, so it converges within the view-nesting depth. Silent
    // non-convergence would return data from the wrong point in time,
    // so it raises like the expansion-depth guard does.
    var pass = 0
    var again = directViews.nonEmpty
    while (again && pass < 10) {
      registerViews(clean, st, depth = 0, bound, cache)
      again = directViews.exists { case (v, eff) => !bound.get(v).contains(eff) }
      pass += 1
    }
    if (again)
      throw new IllegalStateException(
        "view temporal bindings did not converge (conflicting view nest > 10 deep?)")
    // statement-referenced tables are registered LAST, at the
    // statement's spec: views above already captured their own
    // resolutions, so this overwrites nothing they depend on
    for (t <- catalog.tableNames if referencesWord(masked, t))
      resolveCached(t, st, cache).createOrReplaceTempView(tempName(t))
    val out = spark.sql(rewriteDotted(clean))
    // engine-side exchange sizing (round 18 — the SCALE.md harness
    // finding moved into the engine): a SELECT over a 1000×-scale
    // table must not inherit a fixture-sized shuffle-partition count;
    // size AQE's initial partition number from the bytes this
    // statement actually scans (4× covers typical join/agg exchange
    // expansion; explode-heavy operators size their own call sites).
    // Raise-only and driver-side — zero Spark jobs, and the optimized
    // plan it forces is the one execution reuses.
    graft.ShuffleSizing.ensureForScan(out, expansion = 4.0)
    out
  }

  /** Spark temp views are single-part names, but the engine's
    * namespace is FLAT with dots legal inside a name — the reference
    * flattens `ObjectName.to_string()`, so "app.t" IS the table name,
    * dot included (sql_bridge.rs:3665, 678). A dotted catalog name
    * therefore registers under a mangled single-part temp name and
    * statement text rewrites references to it before `spark.sql`. */
  private def tempName(n: String): String =
    if (n.indexOf('.') < 0) n
    else {
      // injective mangling: a plain dot→underscore map would collide
      // "a.b_c" with "a_b.c" on one temp-view name (the second
      // registration silently shadowing the first) — a short digest
      // of the ORIGINAL name keeps distinct names distinct
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString
      s"__graft_dn__${n.replace('.', '_')}_$digest"
    }

  /** Rewrite every referenced dotted catalog name in `text` to its
    * mangled temp-view name — CODE regions only (maskNonCode keeps a
    * name inside a string literal or comment untouched), longest name
    * first so overlapping names (`a.b.c` vs `a.b`) resolve to the
    * most specific match. */
  private def rewriteDotted(text: String): String = {
    val dotted = (catalog.tableNames ++ catalog.viewNames)
      .filter(_.indexOf('.') >= 0).distinct.sortBy(-_.length)
    var out = text
    for (n <- dotted) {
      val masked = maskNonCode(out)
      val re = ("""(?i)(?<![\w.])""" + java.util.regex.Pattern.quote(n) +
        """(?![\w.])""").r
      val ms = re.findAllMatchIn(masked).toSeq
      if (ms.nonEmpty) {
        val sb = new StringBuilder(out)
        // right-to-left so earlier offsets stay valid
        for (m <- ms.reverseIterator)
          sb.replace(m.start, m.end, tempName(n))
        out = sb.toString
      }
    }
    out
  }

  /** Depth-first stored-view expansion into session temp views.
    *
    * `spark.sql` analyzes eagerly, so creating a view's temp view
    * CAPTURES the logical plans of whatever the names it references
    * resolve to at that moment — re-registering a base table afterward
    * does not rebind an already-created view. That capture property
    * makes temporal precedence work in a single namespace:
    *   1. sub-views expand first (each capturing its own resolution);
    *   2. the view's base tables register at the view's effective
    *      spec — its own FOR SYSTEM_TIME clause if it names one, else
    *      the spec inherited from its consumer (the reference threads
    *      the statement spec through expansion the same way,
    *      sql_bridge.rs:309-320, 1203-1259);
    *   3. the view's temp view is created, freezing those choices;
    * and select() then re-registers the statement's own tables at the
    * statement spec. A view with an explicit AS OF keeps it even when
    * the statement reads the same table at another time, and vice
    * versa. */
  private def registerViews(text: String, st: SystemTime, depth: Int,
      bound: scala.collection.mutable.Map[String, SystemTime],
      cache: scala.collection.mutable.Map[(String, SystemTime), DataFrame]): Unit = {
    if (depth > 10)
      throw new IllegalStateException("view expansion depth > 10 (cycle?)")
    val masked = maskNonCode(text)
    for (v <- catalog.viewNames if referencesWord(masked, v)) {
      if (catalog.isMaterialized(v)) {
        // a materialized view serves its stored data, frozen at its
        // last REFRESH — no SQL expansion, and the statement's temporal
        // spec does not rebind it (it has no live base tables to rebind)
        if (!bound.contains(v)) {
          bound(v) = SystemTime.Current
          val mv = spark.read.parquet(catalog.mviewDataPath(v, catalog.mviewVersion(v)))
          // a maintainable view's HAVING applies at READ time: storage
          // keeps every group so deltas can move groups across the
          // predicate boundary (IncrementalView scaladoc). The filter
          // comes from the PARSE alone, not the catalog-gated shape
          // tests — a dropped or re-attached base must not silently
          // drop the predicate (the stored layout is what matters;
          // re-applying it to a full-rerun store whose rows already
          // satisfy it is a no-op). It applies BEFORE the hidden-column
          // strip: an aggregate-call predicate rewrote to hidden
          // `__graft_h_*` accumulators (rewriteHaving). A store written
          // BEFORE a view's SQL parsed into the maintainable shape
          // lacks those columns — its rows were filtered at population,
          // so the predicate is skipped rather than failed.
          val viewSql = catalog.getView(v).get
          val having = IncrementalView.parse(viewSql).flatMap(_.having)
            .orElse(IncrementalView.parseJoin(viewSql).flatMap(_.having))
            .filter(h => IncrementalView.HavingAggRefRe.findAllIn(h)
              .forall(mv.columns.contains))
          val filtered = having.fold(mv)(h => mv.where(expr(h)))
          // maintainable views carry hidden IVM support columns
          // (__graft_*) — internal bookkeeping, not part of the view
          filtered
            .drop(mv.columns.filter(IncrementalView.hidden).toIndexedSeq: _*)
            .createOrReplaceTempView(tempName(v))
        }
      } else {
      val (vClean, vSt) = TemporalPre.extract(catalog.getView(v).get)
      val effSt = vSt match {
        case SystemTime.Current => st
        case explicit => explicit
      }
      // re-expand whenever the current temp-view binding is at a
      // different spec than this consumer needs — already-created
      // consumers are immune (they captured), and the select()-level
      // fixpoint restores the statement's own bindings afterward
      if (!bound.get(v).contains(effSt)) {
        bound(v) = effSt // before recursion: breaks self-reference loops
        registerViews(vClean, effSt, depth + 1, bound, cache)
        val vMasked = maskNonCode(vClean)
        for (t <- catalog.tableNames if referencesWord(vMasked, t))
          resolveCached(t, effSt, cache).createOrReplaceTempView(tempName(t))
        spark.sql(rewriteDotted(vClean)).createOrReplaceTempView(tempName(v))
      }
      }
    }
  }

  /** resolve() memoized per statement — AS-OF-timestamp resolution
    * runs a bounds job, which shouldn't repeat per referencing view. */
  private def resolveCached(table: String, st: SystemTime,
      cache: scala.collection.mutable.Map[(String, SystemTime), DataFrame]): DataFrame =
    cache.getOrElseUpdate((table, st), resolve(table, st))

  /** Does the (pre-masked) statement text reference `name` as a word?
    * Callers mask string literals and `--` comments out of the text
    * once via maskNonCode, so a table name inside a quoted value or
    * comment doesn't trigger a spurious registration. */
  private def referencesWord(maskedSql: String, name: String): Boolean =
    ("""(?i)\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
      .findFirstIn(maskedSql).isDefined

  private def maskNonCode(sqlText: String): String = SqlText.maskNonCode(sqlText)

  /** A table at a point in (system) time, with logical column names.
    * Row policies filter here — the user-facing read surface (select()
    * and view expansion resolve through this); engine-internal reads
    * (FK probes, snapshots, conflict detection) call stateAt directly
    * and stay unfiltered, like PG's RLS-exempt integrity checks. */
  def resolve(table: String, st: SystemTime): DataFrame = {
    val t = catalog.require(table)
    checkPrivilege(table, "SELECT")
    val frame = st match {
      case SystemTime.Current => stateAt(table, None)
      case SystemTime.AsOfSeq(s) => stateAt(table, Some(s))
      case SystemTime.AsOfTs(ts) =>
        val maxSeq = events(t)
          .where(col("ts") <= to_timestamp(lit(ts)))
          .agg(max("sequence")).head()
        if (maxSeq.isNullAt(0)) stateAt(table, Some(-1L))
        else stateAt(table, Some(maxSeq.getLong(0)))
      case SystemTime.All =>
        // same raise-don't-truncate contract as AS OF and BETWEEN: a
        // vacuum physically deleted events at/below the floor, and the
        // at-floor snapshot is state, not an event feed — ALL cannot
        // reconstruct the full history any more
        val floor =
          if (t.attached.isDefined) 0L else catalog.retentionFloor(t.name)
        if (floor > 0)
          throw new IllegalStateException(
            s"FOR SYSTEM_TIME ALL on $table: events at or below the " +
              s"retention floor $floor were vacuumed — full history is " +
              s"gone; use FOR SYSTEM_TIME BETWEEN ${floor + 1} AND <end>")
        frameWithLogicalPayload(t, StateView.history(events(t)))
      case SystemTime.Between(a, b) =>
        val floor =
          if (t.attached.isDefined) 0L else catalog.retentionFloor(t.name)
        // state AT the floor survives via the snapshot, but the floor's
        // EVENTS are vacuumed — an event-range read needs start > floor
        if (floor > 0 && a <= floor)
          throw new IllegalStateException(
            s"BETWEEN start $a is at or below the retention floor $floor " +
              s"of $table — those events were vacuumed")
        frameWithLogicalPayload(t, StateView.changesBetween(events(t), a, b))
    }
    rlsFilter(table, "SELECT").fold(frame)(frame.where)
  }

  /** Flatten an event frame to (sequence, ts, event_type, pk, cols...)
    * with logical column names — the FOR SYSTEM_TIME ALL row shape
    * (Query::ShowDrift, query/executor.rs:327-354). */
  private def frameWithLogicalPayload(t: TableDef, frame: DataFrame): DataFrame = {
    val have = frame.schema("payload").dataType
      .asInstanceOf[StructType].fieldNames.toSet
    frame.select(
      Seq(col("sequence"), col("ts"), col("event_type"), col("pk")) ++
        t.columns.map(c =>
          (if (have(c.physical)) col(s"payload.${c.physical}")
           else lit(null).cast(c.dataType)).as(c.logical)): _*)
  }

  /** Raw event log of a table: attached in-memory frame, or the
    * persisted parquet log (mergeSchema absorbs payload-struct widening
    * from ALTER ADD COLUMN), plus any event batches buffered by an open
    * transaction (read-your-writes — the reference reads through its
    * txn write set too, transaction.rs). Missing/empty log → empty
    * typed frame. */
  def events(t: TableDef): DataFrame = {
    val base0 = baseEvents(t)
    txn.fold(base0) { tx =>
      // snapshot isolation: inside a transaction the durable log reads
      // at the sequence pinned at this table's first access — writes
      // other sessions commit later stay invisible until our COMMIT
      // (mvcc.rs snapshot reads). Attached frames are immutable inputs
      // and need no horizon.
      val base = if (t.attached.isDefined) base0
        else base0.where(col("sequence") <= lit(snapSeqFor(tx, t.name)))
      // buffered events are read back SHIFTED by the same offset COMMIT
      // will apply — if a concurrent direct append (streaming ingest)
      // took the buffered batch's provisional sequences, mid-txn reads
      // must not show two events on one sequence or an AS OF view that
      // contradicts post-commit history
      val off = tx.baseSeqs.get(t.name)
        .map(b => catalog.lastSeq(t.name) - b).getOrElse(0L)
      tx.pending.iterator.collect { case (n, ev, _) if n == t.name => ev }
        .foldLeft(base)((acc, ev) =>
          acc.unionByName(shiftSequences(ev, off), allowMissingColumns = true))
    }
  }

  /** The durable event log only — no transaction buffer, no snapshot
    * horizon. COMMIT's conflict probe reads this directly.
    *
    * The read uses the CATALOG's event schema, not schema merging: the
    * catalog is the source of truth for the payload struct, parquet
    * resolves its fields by (physical) name, and a field absent from an
    * older file reads as NULL — exactly the ALTER ADD/DROP semantics.
    * mergeSchema would spend a Spark job collecting every log file's
    * footer on every statement's state read, and at 100 TB that footer
    * sweep is itself a full metadata scan. */
  private def baseEvents(t: TableDef): DataFrame =
    t.attached.getOrElse {
      val p = new Path(logDir(t.name))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.schema(EventLog.schema(t.payloadSchema)).parquet(p.toString)
      else
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          EventLog.schema(t.payloadSchema))
    }

  /** Pin (at first access) and return the transaction's snapshot
    * horizon for a table. */
  private def snapSeqFor(tx: Txn, table: String): Long =
    tx.snapSeqs.getOrElseUpdate(table, catalog.lastSeq(table))

  /** Shift an event frame's sequences (and the sequence-derived clock)
    * by `off` — identity when nothing interleaved. */
  private def shiftSequences(ev: DataFrame, off: Long): DataFrame =
    if (off == 0L) ev
    else ev.withColumn("sequence", col("sequence") + off)
      .withColumn("ts", timestamp_seconds(lit(EventLog.ClockEpoch) + col("sequence")))

  private def logDir(table: String) = catalog.logPath(table)

  /** State at a sequence, snapshot-accelerated: replay starts from the
    * nearest checkpoint <= target instead of sequence 0
    * (optimizer.rs:296-307). */
  def stateAt(table: String, asOf: Option[Long]): DataFrame =
    stateAt(table, asOf, dmlRead = false)

  /** `dmlRead = true` marks a state read whose ROW ORDER becomes event
    * order (UPDATE/DELETE matching batches — their PATCH/SOFT_DELETE
    * frames are sequence-assigned in read order, and trigger bodies
    * insert from the same frames). Those reads pin the keyed-collapse
    * plan in every mode: the flat/checkpoint fast paths serve log-file
    * row order, a transaction's buffered-union read serves window
    * order, and the same statement must emit identically-sequenced
    * events whether it runs bare or inside BEGIN..COMMIT. Pure reads
    * (SELECT, probe joins, registry lookups) keep the fast paths. */
  /** While true, every stateAt read pins the keyed plan — set around
    * the building of an INSERT ... SELECT source, whose row order
    * becomes event order (see the dmlRead scaladoc). Statements are
    * monitor-serialized, so a plain var is safe. */
  private var dmlReadScope = false

  private[graft] def stateAt(table: String, asOf: Option[Long],
      dmlRead: Boolean): DataFrame =
    // plan construction only (the read itself is lazy) — a span here
    // shows which statements replan state and which hit the fast paths
    tracer.span("state-plan", asOf.fold(table)(a => s"$table@$a"))(
      stateAtInner(table, asOf, dmlRead))

  private def stateAtInner(table: String, asOf: Option[Long],
      dmlRead: Boolean): DataFrame = {
    val t = catalog.require(table)
    // below the retention floor the events are physically gone
    // (VACUUM RETAIN) — raise instead of silently collapsing a prefix
    // that no longer exists
    val floor = if (t.attached.isDefined) 0L else catalog.retentionFloor(t.name)
    for (a <- asOf if a < floor)
      throw new IllegalStateException(
        s"AS OF sequence $a is below the retention floor $floor of " +
          s"$table — the events were vacuumed")
    val ev = events(t)
    // inside a transaction the checkpoint choice is bounded by the
    // snapshot horizon too — an auto-snapshot another session took
    // AFTER our snapshot would otherwise leak its post-snapshot events
    // into our collapsed read (ev is horizon-capped, so the tail could
    // not subtract them back out)
    val snapCap = txn.collect {
      case tx if t.attached.isEmpty => snapSeqFor(tx, t.name)
    }
    val bound = (asOf, snapCap) match {
      case (Some(a), Some(c)) => Some(math.min(a, c))
      case _ => asOf.orElse(snapCap)
    }
    val base = Snapshots.nearest(spark, catalog.snapshotPath(table), bound)
    // flat-log certificate: the live log holds only INSERT events with
    // distinct pks (every landed batch was probe- or construction-
    // certified), so the keyed collapse is an identity — serve the log
    // (or snapshot + tail) as a FLAT scan with no window exchange. At
    // 100 TB this is THE read path for append-only fact tables: filters
    // and column pruning reach the parquet scan directly, at any AS OF
    // bound, snapshot or not. In-transaction reads keep the windowed
    // path (buffered events union in).
    // also valid INSIDE a transaction while the table has no buffered
    // writes: events(t) is already horizon-capped, and a first-access
    // read sees exactly the bare log
    val flat = !dmlRead && !dmlReadScope &&
      t.attached.isEmpty && catalog.isFlatLog(t.name) &&
      txn.forall(tx => !tx.pending.exists(_._1 == t.name))
    def payloadFlat(df: DataFrame): DataFrame = {
      val fields = df.schema("payload").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toIndexedSeq
      df.select(fields.map(f => col(s"payload.`$f`").as(f)): _*)
    }
    // keyed collapse: the pk output column IS the window partition
    // attribute, so pk predicates push below the collapse to the scan
    val collapsed = base match {
      case Some(snapSeq) if !dmlRead && !dmlReadScope &&
          txn.isEmpty && t.attached.isEmpty &&
          snapSeq >= math.min(
            asOf.getOrElse(Long.MaxValue), catalog.lastSeq(t.name)) =>
        // the checkpoint IS the state at the read bound — no tail
        // events past it, and a checkpoint holds each live pk exactly
        // once as a collapsed INSERT, so the keyed window would be an
        // identity. Serve the flat columnar scan instead: predicates
        // and column pruning reach the parquet scan with NO window
        // exchange in the plan. At 100 TB this makes every
        // post-checkpoint read a plain scan; in-transaction reads
        // keep the windowed path (buffered events union in), and
        // ATTACHED event logs are excluded — they carry no sequence
        // counter, so "no tail past the checkpoint" cannot be decided
        // from metadata for them.
        val snap = Snapshots.read(spark, catalog.snapshotPath(table), snapSeq,
          Some(EventLog.schema(t.payloadSchema)))
        snap.select(t.payloadSchema.fieldNames.toIndexedSeq
          .map(f => col(s"payload.`$f`").as(f)): _*)
      case Some(snapSeq) =>
        val tail = asOf.fold(ev.where(col("sequence") > snapSeq))(s =>
          ev.where(col("sequence") > snapSeq && col("sequence") <= s))
        val snap = Snapshots.read(spark, catalog.snapshotPath(table), snapSeq,
          Some(EventLog.schema(t.payloadSchema)))
        val union = snap.unionByName(tail, allowMissingColumns = true)
        // flat: snapshot pks (collapsed state at snapSeq) and tail pks
        // (all new inserts) are disjoint by the certificate, so the
        // union IS the state
        if (flat) payloadFlat(union)
        else StateView.stateAtKeyed(union, None, t.pkPhysical)
      case None if flat =>
        payloadFlat(asOf.fold(ev)(s => ev.where(col("sequence") <= s)))
      case None => StateView.stateAtKeyed(ev, asOf, t.pkPhysical)
    }
    // column mapping: physical payload fields -> logical names; a
    // column added by ALTER before any event carries it reads as NULL
    val have = collapsed.columns.toSet
    collapsed.select(t.columns.map(c =>
      (if (have(c.physical)) col(c.physical)
       else lit(null).cast(c.dataType)).as(c.logical)): _*)
  }

  // ========================================================= write path

  /** Append one batch of payload rows (logical columns) as events.
    * Returns the last assigned sequence. `direct = true` (streaming
    * micro-batches) always writes storage, bypassing any open
    * transaction's buffer — the stream's rows must not be captured by
    * (and dropped with) a user transaction. `streamMeta` rides the
    * publish manifest so a micro-batch's id commits atomically with its
    * data (exactly-once replay skipping). */
  private def append(t: TableDef, rowsLogical: DataFrame, eventType: String,
      direct: Boolean = false,
      streamMeta: Option[(String, Long)] = None,
      prePinned: Boolean = false,
      pkChecked: Boolean = false,
      uniqueCertified: Boolean = false,
      probes: () => Seq[DataFrame] = QueryEngine.NoProbes,
      pinnedCounts: Option[Array[Long]] = None): (Long, Long) = {
    if (t.attached.isDefined)
      throw new UnsupportedOperationException(
        s"table ${t.name} is an attached read-only event log")
    // logical -> physical payload, cast to declared types (loose-schema
    // writes are a [REF-GAP] we do NOT replicate: our tables are typed)
    val physical = rowsLogical.select(t.columns.map(c =>
      col(c.logical).cast(c.dataType).as(c.physical)): _*)
    val viaTxn = if (direct) None else txn
    // guard probes: buffered (transaction) writes validate inline —
    // nothing becomes visible before COMMIT anyway — while the
    // direct-publish path runs them CONCURRENTLY with the
    // sequence-count job and the staging write below (all independent
    // until the manifest-rename commit point, where publishAtomic
    // joins the probe task before anything becomes visible). Halves a
    // DML statement's critical path: probe jobs and staging I/O were
    // the two serial halves of its fixed floor.
    // `probes` is a THUNK: for the direct-publish path its evaluation
    // — which itself plans state reads and may run an inline-key
    // collect job — moves onto the probe pool, overlapping probe
    // CONSTRUCTION with the staging write alongside probe execution.
    // A literal batch instead evaluates it here and decides its
    // row-local probes driver-side first (dropFoldedProbes): a doomed
    // literal statement raises HERE, with zero jobs and no staging dir
    // ever created.
    val awaitProbes: () => Unit =
      if (probes eq QueryEngine.NoProbes) () => ()
      else if (physical.queryExecution.optimizedPlan
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) {
        val remaining = dropFoldedProbes(probes())
        if (remaining.isEmpty) () => ()
        else if (viaTxn.isDefined) { raiseFirstViolation(remaining); () => () }
        else backgroundViolationCheck(() => remaining)
      }
      else if (viaTxn.isDefined) { raiseFirstViolation(probes()); () => () }
      else backgroundViolationCheck(probes)
    // any failure between probe submission and the publish-time join
    // must still join the task: the probe verdict may be the better
    // error, and an unjoined probe union would keep running Spark jobs
    // with no consumer. The join handle is idempotent, so the publish
    // path's own catch and the tail call below stay as they are.
    def sequenceAndPublish(): (Long, Long) = {
    // inside a transaction, sequences continue from the buffered tail
    val base = viaTxn.flatMap(_.seqs.get(t.name)).getOrElse(catalog.lastSeq(t.name))
    // pin the batch before sequencing: assignSequencesCounted computes
    // partition offsets in one job and leaves the assignment lazy, so
    // the consuming write must see the exact same row-to-partition
    // layout — and the source reads the very log we append to. A
    // caller that already pinned the batch (DML paths pin once so
    // PK/FK probe jobs read blocks instead of re-executing the source)
    // skips the second materialization.
    val pinned = if (prePinned) physical else pinUnlessLiteral(physical)
    // a caller that pinned through pinCheckpointCounted already knows
    // the layout: sequence assignment is job-free. A batch that came
    // back LITERALIZED from the pin (small matched set → LocalRelation)
    // must NOT take the offsets path — assignWithOffsets goes through
    // .rdd, re-launching the job the literalization exists to skip;
    // assignSequencesCounted's LocalRelation branch sequences it
    // driver-side instead.
    def isLocal(df: DataFrame) = df.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    val (withSeq, n) = pinnedCounts match {
      case Some(cs) if !isLocal(pinned) =>
        (EventLog.assignWithOffsets(pinned, base, cs), cs.sum)
      case _ => EventLog.assignSequencesCounted(pinned, base)
    }
    // the flat-log certificate survives this batch only when it is an
    // INSERT whose pk uniqueness was actually established — by the
    // guard probes (insertFrom) or by the caller's construction
    // (ordered streaming dedup). COPY and plain stream ingest skip the
    // probes, so they revoke; PATCH/SOFT_DELETE always revoke.
    val keepsFlat = eventType == EventLog.INSERT && (pkChecked || uniqueCertified)
    if (n > 0) {
      val ev0 = withSeq.select(
        col("sequence"),
        timestamp_seconds(lit(EventLog.ClockEpoch) + col("sequence")).as("ts"),
        lit(eventType).as("event_type"),
        col(t.pkPhysical).cast("string").as("pk"),
        struct(t.columns.map(c => col(c.physical)): _*).as("payload"))
      // a small batch lands as ONE staged file: the write job runs one
      // task instead of one per pinned partition, the publish renames
      // one file, and the log stays compact — a tombstone batch
      // spread over 32 near-empty part-files would fan out every later
      // state read's scan. Large batches keep the parallel multi-file
      // write. coalesce AFTER sequence assignment is layout-safe: the
      // per-partition offsets were computed against the pinned layout,
      // and a CoalescedRDD computes its parents with their original
      // split indices.
      val ev = if (n <= EventLog.SmallBatchRows) ev0.coalesce(1) else ev0
      viaTxn match {
        case Some(tx) => // buffer; flushed at COMMIT, dropped at ROLLBACK
          snapSeqFor(tx, t.name) // a write also pins the conflict horizon
          tx.baseSeqs.getOrElseUpdate(t.name, catalog.lastSeq(t.name))
          tx.pending += ((t.name, ev, base + n))
          tx.seqs(t.name) = base + n
          if (!keepsFlat) tx.mutated += t.name
        case None =>
          // stage → manifest → publish, same all-or-nothing protocol as
          // COMMIT: a crash mid-statement either leaves the log
          // untouched or (via the reopen sweep) lands the whole batch +
          // counter together — never orphan events past the counter,
          // which a plain append-then-commitSeq would duplicate on
          // the next statement's sequence assignment
          try publishAtomic(Seq((t.name, ev)), Map(t.name -> (base + n)),
            streamMeta,
            mutated = if (keepsFlat) Set.empty else Set(t.name),
            validate = awaitProbes)
          catch {
            case e: Throwable =>
              // a concurrent probe violation outranks a staging fault —
              // the sequential path raised probes before staging ever
              // started, so a doomed statement keeps its probe error
              awaitProbes()
              throw e
          }
          maybeAutoSnapshot(t.name, base + n,
            // the first-load checkpoint shortcut requires the batch to
            // BE the collapsed state: empty table before this append,
            // INSERT events only, and pk uniqueness probes ACTUALLY
            // RAN on this batch (`pkChecked` — only insertFrom's path
            // sets it; COPY/stream ingestion skips the probes, and an
            // at-least-once stream's duplicates must go through the
            // real collapse)
            firstLoad = if (base == 0L && eventType == EventLog.INSERT &&
              pkChecked) Some(ev) else None)
      }
    }
    // an empty batch never publishes, but its probes still gate the
    // statement; the join handle is idempotent, so a second call after
    // the publish path already consumed it is free
    awaitProbes()
    (n, base + n)
    }
    try sequenceAndPublish()
    catch {
      case e: Throwable =>
        // a probe violation outranks a derivative failure (the same
        // preference the publish path applies)
        try awaitProbes()
        catch { case pe: Throwable if pe ne e => throw pe }
        throw e
    }
  }

  // ---------------------------------------------------- auto-snapshot

  /** Auto-checkpoint policy: after this many events append to a table
    * since its newest snapshot, SNAPSHOT it automatically, bounding
    * state-collapse replay cost as logs grow (the reference compacts on
    * the same trigger shape — engine.rs:739-845). 0 disables. The
    * threshold is deliberately high: snapshots cost a full collapse
    * job, so they should amortize over many statements. */
  var autoSnapshotEvery: Long = 100000L

  // newest snapshot sequence per table, lazily primed from storage —
  // saves a filesystem listing per statement
  private val lastSnapSeqs = scala.collection.mutable.HashMap.empty[String, Long]

  private def maybeAutoSnapshot(table: String, lastSeq: Long,
      firstLoad: Option[DataFrame] = None): Unit =
    if (autoSnapshotEvery > 0 && txn.isEmpty) {
      val snapAt = lastSnapSeqs.getOrElseUpdate(table,
        Snapshots.nearest(spark, catalog.snapshotPath(table), None).getOrElse(0L))
      if (lastSeq - snapAt >= autoSnapshotEvery) {
        firstLoad match {
          case Some(ev) if snapAt == 0L &&
              Snapshots.available(spark, catalog.snapshotPath(table)).isEmpty =>
            // first bulk load into an empty table: the appended batch
            // IS the collapsed state (unique pks enforced by the
            // guard, all INSERT-typed) and the just-published log
            // files carry exactly its bytes (same rows, same parquet
            // options) — small loads COPY those files into place with
            // no Spark job at all; large ones keep the distributed
            // write, skipping only the log re-read and the collapse
            // window
            val t = catalog.require(table)
            if (!Snapshots.copyFrom(spark, logDir(table),
                catalog.snapshotPath(table), lastSeq))
              Snapshots.writePrecollapsed(ev, catalog.snapshotPath(table),
                lastSeq,
                (if (encryptionOn)
                  Map("parquet.encryption.uniform.key" -> Encryption.MasterKeyId)
                else Map.empty[String, String]) ++ bloomOptions(t))
            metricSnapshots += 1
          case _ => snapshot(table)
        }
        lastSnapSeqs(table) = catalog.lastSeq(table)
      }
    }

  // ---------------------------------------------------- sequence calls

  private val SeqCallR = """(?i)\b(nextval|currval)\s*\(\s*'(\w+)'\s*\)""".r

  private def mentionsSequenceCall(sqlText: String): Boolean = {
    val lower = sqlText.toLowerCase
    (lower.contains("nextval") || lower.contains("currval")) && {
      val code = SqlText.codeMask(sqlText)
      SeqCallR.findAllMatchIn(sqlText).exists(m => code(m.start))
    }
  }

  /** Replace `nextval('s')` / `currval('s')` at code positions with
    * drawn literals, left to right — each textual occurrence is one
    * draw, so a multi-row VALUES list draws per row. Draws are
    * non-transactional (they survive ROLLBACK — PG semantics, and the
    * reference's SequenceManager sits outside transaction state the
    * same way). Statement-level, not row-level: a nextval over an
    * N-row FROM draws once (per-row assignment is what AUTO_INCREMENT
    * columns are for — block reservation, distributed assign). */
  private def rewriteSequenceCalls(sqlText: String): String = {
    val lower = sqlText.toLowerCase
    if (!lower.contains("nextval") && !lower.contains("currval")) return sqlText
    val code = SqlText.codeMask(sqlText)
    val sb = new StringBuilder
    var last = 0
    for (m <- SeqCallR.findAllMatchIn(sqlText)) if (code(m.start)) {
      sb.append(sqlText.substring(last, m.start))
      val v =
        if (m.group(1).equalsIgnoreCase("nextval")) {
          ensureWriteLock() // a draw persists catalog state
          catalog.nextval(m.group(2))
        } else catalog.currval(m.group(2))
      sb.append(s"CAST($v AS BIGINT)")
      last = m.end
    }
    if (last == 0) sqlText
    else { sb.append(sqlText.substring(last)); sb.toString }
  }

  private def summary(op: String, n: Long, lastSeq: Long): DataFrame = {
    lastAffected = Some(n) // side channel for the audit record
    spark.range(1).select(lit(op).as("op"), lit(n).as("n_affected"),
      lit(lastSeq).as("last_sequence"))
  }

  // ============================================================ audit

  /** Statement auditing (audit.rs:14-60 AuditSystem/AuditConfig,
    * :247 log_event, :504 query_logs). Records land in a driver-side
    * buffer and flush to immutable JSONL part files under
    * `<baseDir>/audit/` — named by their id range so re-priming after
    * reopen is a listing, not a scan. The buffer batches like the
    * reference's channel (a crash loses at most the unflushed tail);
    * SHOW AUDIT and close() force a flush. */
  private var auditEnabled = false
  private var lastAffected: Option[Long] = None
  private var auditNextId: Option[Long] = None // primed lazily from disk
  private val auditBuf =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Option[Long], Boolean, Option[String])]
  private val AuditFlushEvery = 64
  private def auditDir = new Path(s"$baseDir/audit")

  private def auditFs =
    auditDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // the engine-id suffix keeps a concurrent auditor (e.g. a read-only
  // engine auditing its SELECTs) from clobbering another's part file;
  // id ranges still prime from the names alone
  private val AuditFileR = """audit-(\d+)-(\d+)(?:-[0-9a-f-]+)?\.jsonl""".r

  private def primeAuditId(): Long = auditNextId.getOrElse {
    val fs = auditFs
    val next =
      if (!fs.exists(auditDir)) 1L
      else fs.listStatus(auditDir).toSeq.map(_.getPath.getName).collect {
        case AuditFileR(_, end) => end.toLong
      }.foldLeft(0L)(math.max) + 1L
    auditNextId = Some(next)
    next
  }

  private def auditRecord(st: Statement, ok: Boolean, err: Option[String]): Unit = {
    val (action, obj) = auditActionOf(st)
    val id = primeAuditId()
    auditNextId = Some(id + 1)
    auditBuf += ((id, current.user, action, obj,
      if (ok) lastAffected else None, ok, err))
    if (auditBuf.size >= AuditFlushEvery) flushAudit()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def flushAudit(): Unit = if (auditBuf.nonEmpty) {
    val fs = auditFs
    if (!fs.exists(auditDir)) fs.mkdirs(auditDir)
    val (lo, hi) = (auditBuf.head._1, auditBuf.last._1)
    val lines = auditBuf.iterator.map {
      case (id, user, action, obj, n, ok, err) =>
        s"""{"audit_id":$id,"user":${jstr(user)},"action":${jstr(action)},""" +
          s""""object":${jstr(obj)},"n_affected":${n.fold("null")(_.toString)},""" +
          s""""ok":$ok,"error":${err.fold("null")(jstr)}}"""
    }.mkString("", "\n", "\n")
    val out = fs.create(
      new Path(auditDir, f"audit-$lo%012d-$hi%012d-${engineId.take(8)}.jsonl"), true)
    try out.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    auditBuf.clear()
  }

  private def auditSchema = StructType.fromDDL(
    "audit_id LONG, user STRING, action STRING, object STRING, " +
      "n_affected LONG, ok BOOLEAN, error STRING")

  private def showAudit(): DataFrame = {
    flushAudit()
    val fs = auditFs
    val onDisk =
      if (fs.exists(auditDir))
        spark.read.schema(auditSchema).json(auditDir.toString)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], auditSchema)
    onDisk.select("audit_id", "user", "action", "object", "n_affected", "ok",
      "error").orderBy("audit_id")
  }

  private def auditActionOf(st: Statement): (String, String) = st match {
    case _: Statement.Select => ("SELECT", "")
    case Statement.InsertValues(t, _, _) => ("INSERT", t)
    case Statement.InsertSelect(t, _, _) => ("INSERT", t)
    case Statement.Update(t, _, _) => ("UPDATE", t)
    case Statement.Delete(t, _) => ("DELETE", t)
    case Statement.Truncate(t) => ("TRUNCATE", t)
    case Statement.CreateTable(n, _, _, _, _) => ("CREATE TABLE", n)
    case Statement.DropTable(n, _) => ("DROP TABLE", n)
    case Statement.CreateView(n, _, m, _) =>
      (if (m) "CREATE MATERIALIZED VIEW" else "CREATE VIEW", n)
    case Statement.DropView(n, _) => ("DROP VIEW", n)
    case Statement.RefreshMatView(n, _) => ("REFRESH MATERIALIZED VIEW", n)
    case Statement.CreateIndex(_, t, _) => ("CREATE INDEX", t)
    case _: Statement.AlterAdd | _: Statement.AlterRename |
        _: Statement.AlterDrop =>
      ("ALTER TABLE", st match {
        case Statement.AlterAdd(t, _, _) => t
        case Statement.AlterRename(t, _, _) => t
        case Statement.AlterDrop(t, _) => t
        case _ => ""
      })
    case Statement.AlterTableRls(t, _) => ("ALTER TABLE", t)
    case Statement.CreatePolicy(n, t, _, _, _, _, _) => ("CREATE POLICY", s"$t.$n")
    case Statement.DropPolicy(n, t, _) => ("DROP POLICY", s"$t.$n")
    case Statement.CreateTrigger(n, _, _, _, _) => ("CREATE TRIGGER", n)
    case Statement.DropTrigger(n, _) => ("DROP TRIGGER", n)
    case Statement.CreateProcedure(n, _, _, _) => ("CREATE PROCEDURE", n)
    case Statement.DropProcedure(n, _) => ("DROP PROCEDURE", n)
    case Statement.Call(n, _) => ("CALL", n)
    case Statement.CreateSequence(n, _, _, _, _, _) => ("CREATE SEQUENCE", n)
    case Statement.DropSequence(n, _) => ("DROP SEQUENCE", n)
    case Statement.Snapshot(t) => ("SNAPSHOT", t)
    case Statement.Optimize(t, _) => ("OPTIMIZE", t)
    case Statement.Analyze(t) => ("ANALYZE", t)
    case Statement.CheckTable(t, _) => ("CHECK", t)
    case Statement.RepairTable(t) => ("REPAIR", t)
    case Statement.CopyFrom(t, _, _) => ("COPY", t)
    case Statement.CopyTo(_, p, _, _) => ("COPY TO", p)
    case Statement.Begin => ("BEGIN", "")
    case Statement.Commit => ("COMMIT", "")
    case _: Statement.Rollback => ("ROLLBACK", "")
    case _: Statement.Savepoint => ("SAVEPOINT", "")
    case _: Statement.ReleaseSavepoint => ("RELEASE", "")
    case Statement.BackupDb(d, _) => ("BACKUP", d)
    case Statement.RestoreDb(d, _) => ("RESTORE", d)
    case _: Statement.SetRole => ("SET ROLE", "")
    case Statement.Grant(_, t, _) => ("GRANT", t)
    case Statement.Revoke(_, t, _) => ("REVOKE", t)
    case Statement.CreateRole(r, _) => ("CREATE ROLE", r)
    case Statement.DropRole(r, _) => ("DROP ROLE", r)
    case Statement.GrantRole(r, _) => ("GRANT ROLE", r)
    case Statement.RevokeRole(r, _) => ("REVOKE ROLE", r)
    case Statement.DiffTable(t, _, _) => ("DIFF", t)
    case Statement.CreateMigration(v, _, _) => ("CREATE MIGRATION", v)
    case Statement.Migrate => ("MIGRATE", "")
    case Statement.RollbackMigration => ("ROLLBACK MIGRATION", "")
    case other =>
      (other.getClass.getSimpleName.stripSuffix("$").toUpperCase, "")
  }

  // ============================================ triggers + procedures

  /** Nesting guard shared by trigger firing and procedure calls — a
    * trigger whose body writes the table it watches (or procedures
    * calling each other) must terminate (the reference caps the same
    * recursion in its execution context, triggers.rs:338-380). */
  private var callDepth = 0
  private val MaxCallDepth = 8

  private def withCallDepth[T](what: String)(f: => T): T = {
    if (callDepth >= MaxCallDepth)
      throw new IllegalStateException(
        s"$what nesting depth exceeds $MaxCallDepth (recursive trigger/procedure?)")
    callDepth += 1
    try f finally callDepth -= 1
  }

  /** Index of the `)` matching the `(` at `open`, paren-counting only
    * at code positions (literals/comments skipped), or -1. */
  private def matchingParen(s: String, open: Int): Int = {
    val code = SqlText.codeMask(s)
    var depth = 0
    var i = open
    while (i < s.length) {
      if (code(i)) s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private val TriggerForEach = """(?is)^FOR\s+EACH\s+(?:ROW|STATEMENT)\s+(.*)$""".r
  private val TriggerWhenHead = """(?is)^WHEN\s*\(.*""".r
  private val TriggerExec = """(?is)^EXECUTE\s+(.+)$""".r
  private val TriggerExecProc = """(?is)^PROCEDURE\s+(\w+\s*\(.*\))\s*$""".r

  /** Trigger action grammar (validated at CREATE TRIGGER):
    *
    *   [FOR EACH ROW | FOR EACH STATEMENT] [WHEN (cond)] EXECUTE <stmt>
    *
    * An empty body registers without firing (catalog parity for
    * reference DDL scripts). `EXECUTE PROCEDURE p(args)` — the PG
    * spelling the reference's CallProcedure action mirrors
    * (triggers.rs:506-530) — runs as `CALL p(args)`; any other
    * statement runs as-is. Returns (WHEN predicate, statement).
    *
    * Both FOR EACH forms parse but firing is always set-based — ONE
    * body execution per statement with the whole affected batch
    * exposed as a view, never a per-row loop (the reference iterates
    * rows, triggers.rs:383-420; at 100 TB a row loop is the scale
    * killer, so the batch IS the row set here). */
  private[graft] def parseTriggerBody(body: String): Option[(Option[String], String)] = {
    val b0 = body.trim
    if (b0.isEmpty) return None
    val b1 = b0 match { case TriggerForEach(rest) => rest.trim; case _ => b0 }
    val (cond, b2) =
      if (TriggerWhenHead.matches(b1)) {
        val open = b1.indexOf('(')
        val close = matchingParen(b1, open)
        if (close < 0)
          throw new IllegalArgumentException(s"unbalanced WHEN clause: $body")
        (Some(b1.substring(open + 1, close).trim), b1.substring(close + 1).trim)
      } else (None, b1)
    b2 match {
      case TriggerExec(stmt) =>
        val s = stmt.trim
        Some((cond, s match {
          case TriggerExecProc(call) => s"CALL $call"
          case _ => s
        }))
      case _ => throw new IllegalArgumentException(
        "trigger body must be [FOR EACH ROW|STATEMENT] [WHEN (cond)] " +
          s"EXECUTE <statement>: $body")
    }
  }

  /** Fire the enabled (table, event, timing) triggers, in creation
    * order. Set-based firing (the SQL Server inserted/deleted shape):
    * the affected batch registers as temp views `new_rows` (INSERT/
    * UPDATE) and `old_rows` (UPDATE/DELETE) for the body statement —
    * one execution per statement, scale-independent of row count. A
    * WHEN predicate filters the PRIMARY frame (new rows; old for
    * DELETE): the body sees only matching rows and is skipped when
    * none match; without WHEN the body always runs, like a PG
    * statement-level trigger. Body failures propagate — a BEFORE
    * trigger raising vetoes the DML (triggers.rs:383-420 propagates
    * errors the same way); an AFTER failure outside a transaction
    * surfaces after the batch is durable (wrap DML + triggers in
    * BEGIN/COMMIT for all-or-nothing). */
  private def fireTriggers(table: String, event: String, timing: String,
      oldRows: Option[DataFrame], newRows: Option[DataFrame]): Unit = {
    val trgs = catalog.triggersFor(table, event, timing)
    if (trgs.isEmpty) return
    withCallDepth("trigger") {
      // an enclosing firing (nested DML) may hold its own affected-row
      // views — capture their current bindings so they come back after
      // this firing instead of vanishing mid-body
      val savedNew = scala.util.Try(spark.table("new_rows")).toOption
      val savedOld = scala.util.Try(spark.table("old_rows")).toOption
      try {
        for ((trgName, body) <- trgs; (cond, stmt) <- parseTriggerBody(body)) {
          val primary = if (event == "DELETE") oldRows.get else newRows.get
          val filtered = cond.fold(primary)(c => primary.where(expr(c)))
          val fire = cond.isEmpty || filtered.limit(1).count() > 0
          if (fire) {
            // (re-)register per trigger: a previous trigger's nested DML
            // may have re-bound these views for its own firing
            val newView = if (event == "DELETE") None else Some(filtered)
            val oldView = if (event == "DELETE") Some(filtered) else oldRows
            spark.catalog.dropTempView("new_rows")
            spark.catalog.dropTempView("old_rows")
            newView.foreach(_.createOrReplaceTempView("new_rows"))
            oldView.foreach(_.createOrReplaceTempView("old_rows"))
            try {
              val res = this.sql(stmt)
              // DML executes eagerly inside sql(); a SELECT body (the
              // RAISE_ERROR-guard shape) is lazy — force the COMPILED
              // plan so its effect, or its veto, lands NOW (a plain
              // count() would let column pruning drop the very
              // raise_error projection being fired)
              if (StatementRouter.parse(stmt).isInstanceOf[Statement.Select]) {
                res.queryExecution.executedPlan.execute().count(); ()
              }
            } catch {
              case e: Throwable => throw new IllegalStateException(
                s"trigger $trgName failed: ${e.getMessage}", e)
            }
          }
        }
      } finally {
        spark.catalog.dropTempView("new_rows")
        spark.catalog.dropTempView("old_rows")
        savedNew.foreach(_.createOrReplaceTempView("new_rows"))
        savedOld.foreach(_.createOrReplaceTempView("old_rows"))
      }
    }
  }

  /** CALL name(args): evaluate the constant argument expressions (one
    * driver-local row), re-render each value as a properly escaped
    * literal, bind `$param` references in the body, run it as a
    * script, return the last statement's result (procedures.rs:533-630
    * — execute_procedure binds typed values the same way; rendering
    * through Params.render keeps value semantics, never text
    * splicing). */
  private def callProcedure(name: String, args: Seq[String]): DataFrame = {
    val (params, body) = catalog.getProcedure(name).getOrElse(
      throw new IllegalArgumentException(s"procedure not found: $name"))
    require(args.length == params.length,
      s"procedure $name expects ${params.length} argument(s), got ${args.length}")
    withCallDepth("procedure") {
      val bound =
        if (params.isEmpty) body
        else {
          val row = spark.sql(args.mkString("SELECT ", ", ", "")).head()
          val rendered = params.indices.map(i => graft.sql.Params.render(row.get(i)))
          graft.sql.Params.bindNamed(body, params, rendered)
        }
      val stmts = StatementRouter.splitTopLevel(bound, ';')
        .filter(s => SqlText.maskNonCode(s).trim.nonEmpty)
      require(stmts.nonEmpty, s"procedure $name has an empty body")
      stmts.map(sql).last
    }
  }

  // ------------------------------------------------------- constraints

  /** DEFAULT expressions of a table, by column (constraints.rs:9-35). */
  private def defaultsOf(table: String): Map[String, String] =
    catalog.constraintsOf(table).collect {
      case graft.catalog.Constraint.Default(c, e) => c -> e
    }.toMap

  /** Violation probes for the declared constraints over a batch of row
    * images about to land in `t` — message frames the caller unions
    * into its single guard job (the same one-job shape as the PK
    * probes; the reference checks row-by-row, constraints.rs:330-520).
    *
    * `survivors`: current rows still present after the statement, for
    * UNIQUE clashes (inserts: full state; updates: state minus matched
    * rows). `touched`: UPDATE's assigned columns — a UNIQUE set none of
    * whose columns are assigned cannot be violated, so its join is
    * skipped; NOT NULL and CHECK always probe (full-row images make
    * the probe one filter either way). NULLs never conflict in UNIQUE
    * (PG NULLS DISTINCT; constraints.rs:430-447 skips nulls too);
    * CHECK passes on TRUE or NULL (PG). */
  private def constraintViolations(t: TableDef, batch: DataFrame,
      survivors: => DataFrame, touched: Option[Set[String]]): Seq[DataFrame] =
    catalog.constraintsOf(t.name).flatMap {
      case graft.catalog.Constraint.NotNull(c) =>
        Seq(batch.where(col(c).isNull).select(
          lit(s"null value in column $c of ${t.name} violates NOT NULL").as("_err")))
      case graft.catalog.Constraint.Check(e) =>
        Seq(batch.where(not(coalesce(expr(e), lit(true)))).select(
          lit(s"row in ${t.name} violates CHECK ($e)").as("_err")))
      case graft.catalog.Constraint.Unique(cs)
          if touched.forall(ts => cs.exists(ts)) =>
        val nn = cs.map(col(_).isNotNull).reduce(_ && _)
        val msg = s"duplicate key violates UNIQUE (${cs.mkString(", ")}) on ${t.name}"
        // literal VALUES batches settle within-batch duplicates on the
        // driver (same discipline as the pk probe in insertFrom —
        // aggregate probes don't constant-fold); NULL keys never
        // collide, per UNIQUE semantics
        val dups = literalBatchDup(batch, cs, skipNulls = true) match {
          case Some(true) => throw new IllegalArgumentException(msg)
          case Some(false) => Nil
          case None => Seq(batch.where(nn).groupBy(cs.map(col): _*)
            .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
            .select(lit(msg).as("_err")))
        }
        val clash = batch.where(nn)
          .join(survivors.where(nn).select(cs.map(col): _*), cs, "left_semi")
          .select(lit(msg).as("_err"))
        dups :+ clash
      case _ => Nil
    }

  // =========================================================== metrics

  /** Engine counters (monitoring.rs:81-246 — the deterministic slice
    * of its DatabaseMetrics/QueryMetrics; wall-clock histograms are
    * deliberately absent so SHOW METRICS stays oracle-checkable). */
  private var metricStatements = 0L
  private var metricFailed = 0L
  private var metricTimeouts = 0L
  private var metricTxnCommits = 0L
  private var metricTxnRollbacks = 0L
  private var metricSnapshots = 0L

  // ==================================================== wall-clock perf

  /** Per-statement wall-time histogram + slow-statement log
    * (monitoring.rs:81-246 query_latency_tracker / slow query log).
    * Kept OUT of SHOW METRICS so the oracled metrics feed stays
    * deterministic; SHOW PERF is the explicitly wall-clock slice. A
    * lazy SELECT records its planning + any eager guard work — later
    * actions run on the caller's clock, same boundary the statement
    * timeout draws. */
  private val perfBoundsMs = Vector(1L, 10L, 100L, 1000L, 10000L)
  private val perfBucketLabels =
    Vector("lt_1ms", "1_10ms", "10_100ms", "100ms_1s", "1_10s", "ge_10s")
  private val perfBuckets = new Array[Long](perfBoundsMs.length + 1)
  private var perfCount = 0L
  private var perfTotalMs = 0.0
  private var perfMaxMs = 0.0
  private var slowLogThresholdMs = 0L
  private val slowLog =
    scala.collection.mutable.ArrayDeque.empty[(Long, String, Double)]
  private var slowLogNextId = 1L
  private val SlowLogMax = 100
  // sliding window of recent latencies for exact percentiles over the
  // window (the reference's PercentileTracker, monitoring.rs:95) —
  // bounded, so SHOW PERF never scans unbounded history
  private val PerfWindow = 1024
  private val perfRecent = new Array[Double](PerfWindow)
  private var perfRecentN = 0L

  private def recordPerf(statement: String, ms: Double): Unit = {
    perfCount += 1; perfTotalMs += ms; perfMaxMs = math.max(perfMaxMs, ms)
    val i = perfBoundsMs.indexWhere(ms < _)
    perfBuckets(if (i < 0) perfBoundsMs.length else i) += 1
    perfRecent((perfRecentN % PerfWindow).toInt) = ms
    perfRecentN += 1
    if (slowLogThresholdMs > 0 && ms >= slowLogThresholdMs) {
      slowLog.append((slowLogNextId, statement.trim.take(500), ms))
      slowLogNextId += 1
      if (slowLog.size > SlowLogMax) slowLog.removeHead() // bounded ring
    }
  }

  /** Exact percentile over the sliding latency window (nearest-rank). */
  private def perfPercentile(p: Double): Double = {
    val n = math.min(perfRecentN, PerfWindow.toLong).toInt
    if (n == 0) 0.0
    else {
      val sorted = perfRecent.take(n).sorted
      sorted(math.min(n - 1, math.ceil(p * n).toInt - 1).max(0))
    }
  }

  private def showPerf(): DataFrame = {
    import spark.implicits._
    val hist = perfBucketLabels.zip(perfBuckets.toSeq)
      .map { case (l, n) => ("bucket", l, n.toDouble, null: String) }
    val summary = Seq(
      ("summary", "statements", perfCount.toDouble, null: String),
      ("summary", "total_ms", perfTotalMs, null: String),
      ("summary", "max_ms", perfMaxMs, null: String),
      ("summary", "p50_ms", perfPercentile(0.50), null: String),
      ("summary", "p95_ms", perfPercentile(0.95), null: String),
      ("summary", "p99_ms", perfPercentile(0.99), null: String),
      ("summary", "slow_threshold_ms", slowLogThresholdMs.toDouble, null: String),
      ("summary", "rate_limited", metricRateLimited.toDouble, null: String))
    val slow = slowLog.toSeq.map { case (id, st, ms) =>
      ("slow", s"stmt_$id", ms, st) }
    (hist ++ summary ++ slow).toDF("kind", "item", "value", "statement")
  }

  /** SHOW STORAGE [FOR t]: per-table physical footprint — log and
    * snapshot file counts/bytes, checkpoint sequences, retention
    * floor, last sequence. The ops answer to "what would VACUUM or
    * OPTIMIZE actually reclaim". Metadata-only: one recursive listing
    * per table, no data read — O(#files) driver work, the same cost
    * class as the reopen sweep, acceptable for an explicit admin
    * command (never on a query path). */
  private def showStorage(table: Option[String]): DataFrame = {
    import spark.implicits._
    val names = table.map(t => Seq(catalog.require(t).name))
      .getOrElse(catalog.tableNames)
    val rows = names.filter(n => catalog.get(n).exists(_.attached.isEmpty)).map { n =>
      def du(dir: String): (Long, Long) = {
        val p = new Path(dir)
        val dfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!dfs.exists(p)) (0L, 0L)
        else {
          val it = dfs.listFiles(p, true)
          var files = 0L
          var bytes = 0L
          while (it.hasNext) {
            val f = it.next()
            if (!f.getPath.getName.startsWith("_")) { files += 1; bytes += f.getLen }
          }
          (files, bytes)
        }
      }
      val (lf, lb) = du(catalog.logPath(n))
      val (sf, sb) = du(catalog.snapshotPath(n))
      val snaps = Snapshots.available(spark, catalog.snapshotPath(n))
      (n, lf, lb, sf, sb, snaps.size.toLong, snaps.lastOption,
        catalog.retentionFloor(n), catalog.lastSeq(n))
    }
    rows.toDF("table", "log_files", "log_bytes", "snapshot_files",
      "snapshot_bytes", "snapshots", "newest_snapshot_seq",
      "retention_floor", "last_sequence")
  }

  /** The deterministic metric feed — SHOW METRICS rows, and the value
    * source alert rules evaluate against. */
  private def metricValues: Seq[(String, Long)] = Seq(
    ("autorefresh_failed", metricAutoRefreshFailed),
    ("autorefresh_runs", metricAutoRefreshRuns),
    ("cache_hits", cacheHits),
    ("cache_misses", cacheMisses),
    ("events_total", catalog.tableNames.map(catalog.lastSeq).sum),
    ("snapshots_taken", metricSnapshots),
    ("statements_failed", metricFailed),
    ("statements_timed_out", metricTimeouts),
    ("statements_total", metricStatements),
    ("tables", catalog.tableNames.size.toLong),
    ("txn_commits", metricTxnCommits),
    ("txn_rollbacks", metricTxnRollbacks),
    ("views", catalog.viewNames.size.toLong))

  private def showMetrics(): DataFrame = {
    import spark.implicits._
    metricValues.toDF("metric", "value")
  }

  // ========================================================== alerting

  /** Threshold alert rules over the deterministic metric feed
    * (alerting.rs:134-166 AlertRule; :216-380 AlertManager + default
    * rules). RULES persist with the catalog (configured once, govern
    * every later session); firing state is per-engine, like the
    * reference's in-memory AlertManager. Pull-based: SHOW ALERTS
    * evaluates every rule against the CURRENT metric values — no
    * background evaluator thread, no wall-clock state, so the whole
    * surface is reproducible and oracle-checkable. State machine per
    * rule (alerting.rs AlertState): PENDING until the condition first
    * holds, FIRING while it holds, RESOLVED after it stops. */
  private val alertFired = scala.collection.mutable.HashSet.empty[String]
  // state-transition history (alert_routes.rs get_alert_history):
  // (ordinal, alert, from, to), newest last, bounded ring. Ordinals
  // are a per-engine monotonic counter, not a clock — the whole
  // alerting surface stays deterministic and replayable.
  private val alertState = scala.collection.mutable.HashMap.empty[String, String]
  private val alertHistory =
    scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String)]
  private var alertHistSeq = 0L
  private val AlertHistoryMax = 256

  // the HTTP sidecar calls these OUTSIDE a statement, so they take
  // the statement monitor themselves (reentrant for SQL-path callers)
  // — a wire session's SHOW ALERTS must not mutate the ring mid-copy
  private[graft] def alertTransitions: Seq[(Long, String, String, String)] =
    writeLock.synchronized { alertHistory.toSeq }

  private[graft] def alertRules: Seq[graft.catalog.AlertDef] =
    writeLock.synchronized { catalog.alertList.sortBy(_.name) }

  private def createAlert(name: String, metric: String, op: String,
      threshold: Double, severity: String): DataFrame = {
    require(metricValues.exists(_._1 == metric),
      s"unknown metric: $metric (SHOW METRICS lists the valid names)")
    catalog.createAlert(
      graft.catalog.AlertDef(name, metric, op, threshold, severity))
    summary("create_alert", 1L, 0L)
  }

  private def showAlerts(): DataFrame = {
    import spark.implicits._
    val vals = metricValues.toMap
    val rows = catalog.alertList.map { a =>
      val v = vals(a.metric)
      val firing = a.op match {
        case ">" => v > a.threshold
        case ">=" => v >= a.threshold
        case "<" => v < a.threshold
        case "<=" => v <= a.threshold
        case _ => v.toDouble == a.threshold
      }
      if (firing) alertFired += a.name
      val state =
        if (firing) "FIRING"
        else if (alertFired(a.name)) "RESOLVED" else "PENDING"
      val prev = alertState.getOrElse(a.name, "PENDING")
      if (state != prev) {
        alertHistSeq += 1
        alertHistory += ((alertHistSeq, a.name, prev, state))
        if (alertHistory.length > AlertHistoryMax)
          alertHistory.remove(0, alertHistory.length - AlertHistoryMax)
        alertState(a.name) = state
      }
      (a.name, a.severity, state, a.metric, v, a.threshold)
    }.sortBy(_._1)
    rows.toDF("alert", "severity", "state", "metric", "value", "threshold")
  }

  /** Engine-derived optimization suggestions (performance_routes.rs
    * get_optimization_suggestions — theirs inspects slow queries, heap
    * and pool stats; ours adds the signals only this engine has:
    * snapshot replay lag and flat-log certificates). Each row is
    * (category, priority, suggestion), computed from catalog METADATA
    * and in-memory counters only — no data scan, so the endpoint is
    * always cheap to poll. */
  private[graft] def optimizationSuggestions(): Seq[(String, String, String)] = writeLock.synchronized {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val slow = slowLog.toSeq
    if (slow.nonEmpty)
      out += (("query_performance", "high",
        s"${slow.length} statements exceeded the slow-log threshold " +
          f"(max ${slow.map(_._3).max}%.1f ms) - inspect SHOW PERF's slow " +
          "log; point lookups want an index (CREATE INDEX stamps " +
          "bloom filters), repeated reads want SET RESULT_CACHE ON"))
    // replay bound: a mutation-heavy table with a long unsnapshotted
    // tail pays a keyed collapse over that tail on every read
    for (t <- catalog.tableNames
        if catalog.get(t).exists(_.attached.isEmpty) && !catalog.isFlatLog(t)) {
      val snap = lastSnapSeqs.getOrElseUpdate(t,
        Snapshots.nearest(spark, catalog.snapshotPath(t), None).getOrElse(0L))
      val lag = catalog.lastSeq(t) - snap
      // advise even with auto-snapshotting DISABLED — that is the one
      // configuration where the lag can actually run unbounded
      val lagThreshold =
        if (autoSnapshotEvery > 0) autoSnapshotEvery / 2 else 50000L
      if (lag > lagThreshold)
        out += (("storage", "medium",
          s"table $t has $lag unsnapshotted events and no flat-log " +
            s"certificate - SNAPSHOT $t bounds every read's collapse replay"))
    }
    val lookups = cacheHits + cacheMisses
    if (lookups >= 20 && cacheHits * 2 < lookups)
      out += (("caching", "medium",
        f"result-cache hit rate ${cacheHits * 100.0 / lookups}%.0f%% over " +
          s"$lookups lookups - mostly-unique statements; parameterize " +
          "repeated query shapes so versions key-match"))
    val rt = Runtime.getRuntime
    val heapUsed = rt.totalMemory() - rt.freeMemory()
    if (heapUsed > rt.maxMemory() * 3 / 4)
      out += (("memory", "medium",
        s"driver heap ${heapUsed >> 20} MB of ${rt.maxMemory() >> 20} MB - " +
          "lower SET STATEMENT_TIMEOUT, bound COPY TO exports, or raise " +
          "driver memory"))
    if (out.isEmpty)
      out += (("general", "low",
        "no pressing optimizations - snapshot lag, slow log, cache hit " +
          "rate and heap are all within bounds"))
    out.toSeq
  }

  // ====================================================== result cache

  /** Query result cache (cache.rs:75-300). The reference caches by
    * (query, database, user) with a TTL and pattern invalidation; a
    * version-keyed cache is strictly stronger and needs no clock: the
    * key embeds every transitively referenced table's (lastSeq, schema
    * fingerprint), matview versions, the session user, and a security
    * fingerprint (policies/grants/gates) — any DML, ALTER, REFRESH, or
    * policy change produces a different key, so staleness is
    * impossible and old entries simply age out of the LRU. Results pin
    * via localCheckpoint (executor block storage, not driver heap),
    * capped by entry count and row count; statements that are
    * nondeterministic, draw sequences, or run inside a transaction
    * (snapshot horizons differ) never cache — the reference's
    * should_cache gate (cache.rs:132-165) makes the same calls. */
  private var cacheEnabled = false
  private var cacheHits = 0L
  private var cacheMisses = 0L
  private val CacheMaxEntries = 32
  private val CacheMaxRows = 100000L
  private val resultCache =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > CacheMaxEntries
        // the evicted entry's localCheckpoint blocks live in executor
        // storage until explicitly freed — without this they leak until
        // GC happens to collect the RDD
        if (evict) unpersistPinned(e.getValue)
        evict
      }
    }

  /** Free the executor blocks a cached (localCheckpoint-pinned) result
    * holds. The checkpoint RDD sits behind the plan's leaf; unpersist
    * is async and best-effort — a caller still holding the evicted
    * handle loses it, which is the LRU contract. */
  private def unpersistPinned(df: DataFrame): Unit = graft.Pins.free(df)

  private def dropAllCached(): Unit = {
    resultCache.values().forEach(unpersistPinned(_))
    resultCache.clear()
  }

  private val NonDeterministicR =
    ("""(?i)\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|""" +
      """now|unix_timestamp|input_file_name)\s*\(|""" +
      """(?i)\bcurrent_(timestamp|date|timezone)\b""").r

  /** Version vector of every table the text transitively references
    * (through stored views), or None when the statement must not be
    * cached. */
  private def referencedVersions(text: String, depth: Int = 0): Option[String] = {
    if (depth > 10) return None // pathological view nesting: just skip
    val masked = maskNonCode(text)
    if (NonDeterministicR.findFirstIn(masked).isDefined) return None
    val parts = scala.collection.mutable.SortedMap.empty[String, String]
    for (t <- catalog.tableNames if referencesWord(masked, t);
        td <- catalog.get(t))
      parts(s"t:$t") = s"${catalog.lastSeq(t)}/${td.columns.hashCode}"
    for (v <- catalog.viewNames if referencesWord(masked, v))
      if (catalog.isMaterialized(v))
        parts(s"m:$v") = catalog.mviewVersion(v).toString
      else referencedVersions(catalog.getView(v).get, depth + 1) match {
        case Some(sub) => parts(s"v:$v") = Integer.toHexString(sub.hashCode)
        case None => return None
      }
    Some(parts.map { case (k, x) => s"$k=$x" }.mkString(";"))
  }

  private def cacheKeyFor(text: String): Option[String] = {
    if (!cacheEnabled || txn.isDefined || mentionsSequenceCall(text)) return None
    // the SESSION portion must carry everything RLS/grants filter on:
    // two sessions sharing a user name but holding different roles (or
    // one superuser, one not) see different rows and must never share
    // an entry. The length prefix keeps the key unambiguous with
    // visible separators (the text itself may contain any character).
    val s = current
    // EFFECTIVE roles (carried + catalog memberships): two sessions
    // sharing carried roles but differing in GRANT role TO user rows
    // must never share an entry; the roleList hash invalidates when a
    // bundle's permission set itself changes
    val session =
      s"|u=${s.user}|r=${effectiveRoles(s).toSeq.sorted.mkString(",")}" +
        s"|su=${isSuperuser(s)}|"
    referencedVersions(text).map(v =>
      s"${text.trim.length}:" + text.trim + session + v +
        s"|sec:${catalog.policyList.hashCode}:${catalog.grantList.hashCode}" +
        s":${catalog.roleList.hashCode}:$privilegesEnabled:$rlsRelevant")
  }

  // RLS enable/disable flips don't advance any sequence — fold the
  // enabled-set into the security fingerprint
  private def rlsRelevant: String =
    catalog.tableNames.filter(catalog.isRlsEnabled).mkString(",")

  private def cachedSelect(q: String): DataFrame = cacheKeyFor(q) match {
    case None => select(rewriteSequenceCalls(q))
    case Some(key) =>
      Option(resultCache.get(key)) match {
        case Some(df) => cacheHits += 1; df
        case None =>
          cacheMisses += 1
          val res = select(q).localCheckpoint()
          // the pin already materialized the blocks; the count is local
          if (res.count() <= CacheMaxRows) resultCache.put(key, res)
          res
      }
  }

  // ------------------------------------------------- table privileges

  /** Privilege-check gate (the reference's AuthConfig.enabled,
    * auth.rs:134-160): off by default — every session can do
    * everything, as before; once ON, non-superuser sessions need a
    * GRANT for each DML action on engine tables (attached fixtures and
    * temp analytics frames are not governed). */
  private var privilegesEnabled = false

  /** The session's effective role set: roles carried at setAuth plus
    * catalog-granted memberships (GRANT role TO user) — the rbac.rs
    * get_user_roles union (rbac.rs:417-429). */
  private def effectiveRoles(s: Session): Set[String] =
    s.roles ++ catalog.rolesOf(s.user)

  /** True when some effective role's bundle carries `perm` — bundles
    * are database-wide like the reference's Permission set, and the
    * SUPERUSER marker implies everything (rbac.rs:200-245). */
  private def roleHasPerm(s: Session, perm: String): Boolean =
    effectiveRoles(s).exists { r =>
      val ps = catalog.rolePerms(r)
      ps.contains("SUPERUSER") || ps.contains(perm)
    }

  /** Session superuser, by flag or by holding a SUPERUSER-bundle role
    * (the reference's RoleName::Superuser membership). */
  private def isSuperuser(s: Session): Boolean =
    s.superuser || effectiveRoles(s).exists(r =>
      catalog.rolePerms(r).contains("SUPERUSER"))

  private def requireSuperuser(what: String): Unit =
    if (privilegesEnabled && !isSuperuser(current))
      throw new SecurityException(s"permission denied: $what requires superuser")

  /** Superuser check that does NOT wait for the privilege gate — for
    * statements that undermine security machinery that is active
    * regardless of the gate (RLS administration, the audit switch,
    * trigger DDL whose bodies execute under OTHER sessions). */
  private def requireSuperuserAlways(what: String): Unit =
    if (!isSuperuser(current))
      throw new SecurityException(s"permission denied: $what requires superuser")

  /** Gate on a role-bundle permission: passes when the gate is off,
    * the session is superuser, or an effective role's bundle carries
    * `perm` (rbac.rs:433-452 has_permission). */
  private def requirePerm(what: String, perm: String): Unit =
    if (privilegesEnabled && !isSuperuser(current) &&
        !roleHasPerm(current, perm))
      throw new SecurityException(
        s"permission denied: $what requires $perm")

  /** Tables the text transitively references (through stored views). */
  private def referencedTables(text: String, depth: Int = 0): Set[String] = {
    if (depth > 10) return Set.empty
    val masked = maskNonCode(text)
    val direct = catalog.tableNames.filter(referencesWord(masked, _)).toSet
    val viaViews = catalog.viewNames
      .filter(v => !catalog.isMaterialized(v) && referencesWord(masked, v))
      .flatMap(v => catalog.getView(v).toSeq
        .flatMap(referencedTables(_, depth + 1)))
    direct ++ viaViews
  }

  /** A materialized view's stored rows are shared across every session,
    * so the population query must see the FULL table state. A
    * non-superuser session whose read would be RLS-filtered must not
    * populate one — it would durably overwrite the shared matview with
    * only its own visible subset (PG forbids RLS tables in matviews for
    * the same reason). Superuser sessions read unfiltered, so their
    * population is always whole. */
  private def requireUnfilteredPopulation(what: String, viewSql: String): Unit = {
    requireSuperuser(what)
    if (!current.superuser) {
      val rls = referencedTables(viewSql).filter(catalog.isRlsEnabled)
      if (rls.nonEmpty)
        throw new SecurityException(
          s"permission denied: $what over RLS-enabled table(s) " +
            s"${rls.toSeq.sorted.mkString(", ")} requires superuser — a " +
            "filtered population would persist a partial shared view")
    }
  }

  /** Raise unless the session holds `priv` (or ALL) on `table` —
    * granted directly, via a role, or to PUBLIC
    * (auth.rs:647 check_permission; PG error shape). */
  private def checkPrivilege(table: String, priv: String): Unit =
    if (privilegesEnabled && !isSuperuser(current) &&
        catalog.get(table).isDefined) {
      val gs = catalog.granteesOf(table, priv)
      val s = current
      val roles = effectiveRoles(s)
      // granted directly, via a role's table grant, to PUBLIC — or
      // database-wide through a role BUNDLE's DML permission
      // (rbac.rs Permission::Select et al. are global, not per-table)
      val ok = gs.contains("PUBLIC") || gs.contains(s.user) ||
        gs.exists(roles) || roleHasPerm(s, priv)
      if (!ok)
        throw new SecurityException(
          s"permission denied for table $table ($priv)")
    }

  // ------------------------------------------------- row-level security

  /** The session's visible-row predicate for `command` on `table`, or
    * None when RLS doesn't constrain it (disabled, or superuser
    * session). PG/reference semantics (row_level_security.rs:289-340):
    * permissive policies OR together, restrictive ones AND on top; RLS
    * enabled with no applicable permissive policy denies every row
    * (default deny). A policy expression evaluating to NULL counts as
    * not passing. */
  private def rlsFilter(table: String, command: String)
      : Option[org.apache.spark.sql.Column] =
    rlsPredicate(table, command, _.usingExpr)

  /** The write-side predicate (WITH CHECK) for rows `command` is about
    * to land; a policy without WITH CHECK falls back to USING (PG). */
  private def rlsCheckPredicate(table: String, command: String)
      : Option[org.apache.spark.sql.Column] =
    rlsPredicate(table, command, p => p.checkExpr.orElse(p.usingExpr))

  private def rlsPredicate(table: String, command: String,
      exprOf: graft.catalog.PolicyDef => Option[String])
      : Option[org.apache.spark.sql.Column] = {
    val s = current
    if (isSuperuser(s) || !catalog.isRlsEnabled(table)) return None
    val roles = effectiveRoles(s)
    val applicable = catalog.policiesFor(table, command).filter(p =>
      p.roles.isEmpty || p.roles.contains(s.user) || p.roles.exists(roles))
    // a clause-less policy (no USING, no WITH CHECK) passes everything
    def toCol(p: graft.catalog.PolicyDef) = exprOf(p).fold(lit(true))(e =>
      coalesce(expr(bindSessionUser(e)), lit(false)))
    val (perm, restr) = applicable.partition(_.permissive)
    if (perm.isEmpty) Some(lit(false))
    else Some(restr.map(toCol).foldLeft(perm.map(toCol).reduce(_ || _))(_ && _))
  }

  /** `current_user` in a policy expression binds to the SESSION user
    * (substituted as an escaped literal at code positions — Spark's own
    * current_user() would name the OS user running the JVM). */
  private def bindSessionUser(e: String): String = {
    val lower = e.toLowerCase
    if (!lower.contains("current_user")) return e
    val code = SqlText.codeMask(e)
    val userLit = "'" + current.user.replace("'", "''") + "'"
    val R = """(?i)\bcurrent_user\b(\s*\(\s*\))?""".r
    val sb = new StringBuilder
    var last = 0
    for (m <- R.findAllMatchIn(e)) if (code(m.start)) {
      sb.append(e.substring(last, m.start)).append(userLit)
      last = m.end
    }
    if (last == 0) e else { sb.append(e.substring(last)); sb.toString }
  }

  /** Probe frames for WITH CHECK violations in a written batch — one
    * message row per violating row, unioned into the statement's
    * single guard job (PG raises `new row violates row-level security
    * policy`; the reference's check_access does the same per row —
    * row_level_security.rs:289-340, set-based here). */
  private def rlsCheckProbes(table: String, rows: DataFrame,
      command: String): Seq[DataFrame] =
    rlsCheckPredicate(table, command).toSeq.map(c =>
      rows.where(!c).select(lit(
        s"new row violates row-level security policy for $table").as("_err")))

  /** Decide driver-side every guard probe Catalyst constant-folds to a
    * LocalRelation, returning only the probes that still need a job.
    * For a literal VALUES batch the row-local guards — NOT NULL,
    * CHECK, RLS WITH CHECK — are Filter+Project chains over the
    * batch's LocalRelation, and ConvertToLocalRelation evaluates them
    * entirely at optimization time: a folded non-empty probe IS the
    * violation (raised here, before any staging I/O or Spark job — a
    * doomed literal statement costs zero jobs), a folded empty probe
    * is proof the guard holds and drops from the union. Only called
    * when the batch itself is literal, so state-reading probes never
    * pay a standalone optimizer pass just to learn they don't fold. */
  private def dropFoldedProbes(probes: Seq[DataFrame]): Seq[DataFrame] =
    probes.filter { p =>
      p.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          if (lr.data.nonEmpty)
            throw new IllegalArgumentException(lr.data.head.getString(0))
          false
        case _ => true
      }
    }

  /** Some(true/false) = the (literal LocalRelation) batch does/doesn't
    * carry two rows sharing values in `cols`, decided driver-side with
    * no job; None = the batch isn't literal — use the distributed
    * aggregate probe. `skipNulls` gives UNIQUE-constraint semantics
    * (rows with any NULL key never collide); primary keys keep
    * null-equals-null so two NULL pks still raise, matching the
    * groupBy probe they replace. */
  private def literalBatchDup(df: DataFrame, cols: Seq[String],
      skipNulls: Boolean): Option[Boolean] =
    df.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val idx = cols.map(c => lr.output.indexWhere(_.name == c))
        if (idx.exists(_ < 0)) None
        else {
          val dts = idx.map(lr.output(_).dataType)
          // SQL grouping normalizes -0.0 to 0.0 (NormalizeFloatingNumbers
          // under the distributed groupBy probe); boxed
          // Double/Float.equals does not — normalize here so the
          // driver-side verdict matches the probe it replaces. Boxed
          // NaN.equals(NaN) is true, which already matches grouping.
          def norm(v: Any): Any = v match {
            case d: Double if d == 0.0 => 0.0
            case f: Float if f == 0.0f => 0.0f
            case other => other
          }
          val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
          Some(lr.data.exists { r =>
            val anyNull = idx.exists(r.isNullAt)
            if (anyNull && skipNulls) false
            else !seen.add(idx.indices.map(i =>
              if (r.isNullAt(idx(i))) null else norm(r.get(idx(i), dts(i)))))
          })
        }
      case _ => None
    }

  /** Union the guard probes into ONE job and raise on the first hit. */
  private def raiseFirstViolation(probes: Seq[DataFrame]): Unit =
    if (probes.nonEmpty) {
      val bad = probes.reduce(_ unionByName _).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalArgumentException(bad(0).getString(0))
    }

  /** Run the probe union on the shared pool, propagating this
    * statement's Spark job group so a statement-timeout cancel reaches
    * the probe jobs too. Returns an idempotent join handle that
    * rethrows the probe's violation (or any failure) on the caller's
    * thread — [[append]] overlaps the probes with the sequence-count
    * job and the staging write this way, joining at the
    * manifest-rename commit point. */
  /** Run independent driver-blocking Spark work items concurrently on
    * the shared probe pool, propagating this statement's job group (so
    * a statement-timeout cancel reaches every item's jobs) and joining
    * them ALL before returning — results in ITEM order, never
    * completion order, so plan construction stays deterministic. The
    * first failure rethrows on the caller's thread after every task
    * has settled (a refresh that throws must not leave sibling jobs
    * racing a teardown). Single-item lists run inline: the common
    * one-table refresh pays zero handoff. Tracer spans no-op off the
    * statement thread by design — callers wrap the join in one
    * statement-thread span that accounts the whole batch's wall. */
  private def joinParallel[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.lengthIs <= 1) items.map(f)
    else {
      val sc = spark.sparkContext
      val group = sc.getLocalProperty("spark.jobGroup.id")
      val desc = sc.getLocalProperty("spark.job.description")
      val interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
      val tasks = items.map { a =>
        val t = new java.util.concurrent.FutureTask[B](() => {
          // ALWAYS reset the pool thread's job group: cached pool
          // threads inherit localProperties from whichever thread
          // created them, so a group-less caller would otherwise
          // submit jobs under a stale inherited group and be
          // collaterally cancelled by a later cancelJobGroup
          if (group != null)
            sc.setJobGroup(group, if (desc == null) "" else desc,
              interrupt == "true")
          else sc.clearJobGroup()
          try f(a)
          finally sc.clearJobGroup()
        })
        QueryEngine.probePool.execute(t)
        t
      }
      // settle every task before surfacing the first failure
      val settled = tasks.map(t => scala.util.Try(t.get()))
      settled.collectFirst {
        case scala.util.Failure(e: java.util.concurrent.ExecutionException) =>
          throw e.getCause
        case scala.util.Failure(e) => throw e
      }
      settled.map(_.get)
    }

  /** Run one driver-blocking Spark work item on the probe pool with
    * this statement's job group propagated; the returned join function
    * rethrows the item's failure on the caller's thread. Single-item
    * form of [[joinParallel]] — callers overlap an independent guard
    * job with the statement's main materialization and join before
    * the commit point. */
  private def asyncTask[T](f: => T): () => T = {
    val sc = spark.sparkContext
    val group = sc.getLocalProperty("spark.jobGroup.id")
    val desc = sc.getLocalProperty("spark.job.description")
    val interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    val task = new java.util.concurrent.FutureTask[T](() => {
      // ALWAYS reset the pool thread's job group (see joinParallel)
      if (group != null)
        sc.setJobGroup(group, if (desc == null) "" else desc, interrupt == "true")
      else sc.clearJobGroup()
      try f
      finally sc.clearJobGroup()
    })
    QueryEngine.probePool.execute(task)
    () =>
      try task.get()
      catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
  }

  private def backgroundViolationCheck(probes: () => Seq[DataFrame]): () => Unit =
    asyncTask(raiseFirstViolation(probes()))

  // ------------------------------------------------------ foreign keys

  /** Max distinct keys inlined as an IN-list into a probe's scanned
    * side. Below the cap, a DML statement's FK probe prunes the OTHER
    * table's scan to the row groups holding the probed keys (the
    * keyed collapse pushes pk predicates; min/max + bloom do the
    * skipping) — a point probe instead of a full-table collapse per
    * statement. Past the cap the anti-join shape alone is correct and
    * scale-right (AQE broadcasts the smaller side). */
  private val InlineKeyCap = 256

  /** The shared inline-key overflow probe: `batch`'s distinct
    * non-null `keyCol` values, collected through limit(cap+1) so a
    * result LONGER than the cap means "does not inline". NULLs drop
    * BEFORE the limit — filtered after it, a NULL in the sample would
    * mask the (cap+1)-th key and silently truncate the key set.
    *
    * Two-phase (round 16): a RAW limit probe first — CollectLimit
    * over the pruned scan, no exchange — which is exact whenever the
    * batch itself has at most cap+1 non-null rows (the 1-row refresh,
    * the OLTP DML probe: the overwhelmingly common case, measured
    * ~230 ms -> ~80 ms on a warm refresh's touched-keys job). The
    * trade: a batch with MORE non-null rows than the cap now pays TWO
    * actions (the raw probe, wasted, plus the distinct collect) where
    * the single-phase shape paid one — acceptable because the raw
    * probe is a pushdown-pruned CollectLimit (no exchange, first
    * cap+1 rows), its cost is noise next to the bulk work that always
    * follows an over-cap batch, and the common small batch saves a
    * full distinct exchange. */
  private def collectInlineKeys(batch: DataFrame,
      keyCol: String): IndexedSeq[Any] = {
    val proj = batch.select(col(keyCol)).where(col(keyCol).isNotNull)
    val raw = proj.limit(InlineKeyCap + 1).collect().map(_.get(0))
    if (raw.length <= InlineKeyCap) raw.distinct.toIndexedSeq
    else proj.distinct().limit(InlineKeyCap + 1).collect()
      .map(_.get(0)).toIndexedSeq
  }

  /** One restriction the join-view cascade derived for one full side,
    * from one touched source: an inline IN-list predicate below
    * `InlineKeyCap` (parquet pushdown prunes the scan to matching row
    * groups), or a DISTRIBUTED distinct-key frame to semi-join against
    * past it (round 16 — a cap overflow no longer abandons pruning;
    * only the driver-side literalization is capped, the key frame
    * itself stays on the executors at any cardinality). `keyAlias` is
    * the frame's single column, minted unique per hop so several
    * restrictions can join the same side without name clashes. */
  private sealed trait CascRestrict
  private final case class CascInline(pred: Column) extends CascRestrict
  private final case class CascKeys(keys: DataFrame, keyAlias: String,
      stateCol: String) extends CascRestrict

  /** One cascade hop: from the restricted frame of the PREVIOUS table
    * (link column `ct`), build the restriction on the neighbor's `cu`
    * column plus the neighbor's restricted continuation frame over
    * `base`. Below the cap the keys inline (scan pushdown); past it
    * the distinct key frame — O(touched reach), never collected —
    * restricts via left-semi, and the cascade CONTINUES bounded from
    * the semi-joined frame instead of giving up the path. NULL link
    * values drop from the key frame: they can satisfy no equi-join ON,
    * so no term can use the rows they would match. */
  private def cascadeHop(frame: DataFrame, ct: String, base: DataFrame,
      cu: String, pin: DataFrame => DataFrame, tag: Int)
      : (CascRestrict, DataFrame) = {
    val ks = tracer.span("join-keys") {
      collectInlineKeys(frame.select(col(ct)), ct)
    }
    if (ks.length <= InlineKeyCap) {
      val pred = if (ks.isEmpty) lit(false) else col(cu).isin(ks: _*)
      (CascInline(pred), base.where(pred))
    } else {
      val ka = s"__graft_ck$tag"
      val keys = pin(frame.select(col(ct).as(ka))
        .where(col(ka).isNotNull).distinct())
      (CascKeys(keys, ka, cu),
        base.join(keys, col(cu) === col(ka), "left_semi"))
    }
  }

  /** Restrict full side `df` to rows satisfying ANY of the per-source
    * cascade restrictions (a row reaching NO touched delta contributes
    * to no delta term). All-inline keeps the single pushdown
    * disjunction; a lone key frame takes a plain left-semi; the mixed
    * case marks each key-frame match through a left join against the
    * DISTINCT keys (cardinality-preserving) and filters on the OR of
    * markers and inline predicates — one pass over the big side in
    * every shape. */
  private def applyCascade(df: DataFrame, rs: Seq[CascRestrict])
      : DataFrame = {
    val inline = rs.collect { case CascInline(p) => p }
    val keyed = rs.collect { case k: CascKeys => k }
    val inlinePred = inline.reduceOption(_ || _)
    if (keyed.isEmpty) df.where(inlinePred.getOrElse(lit(false)))
    else if (keyed.lengthIs == 1 && inline.isEmpty) {
      val k = keyed.head
      df.join(k.keys, col(k.stateCol) === col(k.keyAlias), "left_semi")
    } else {
      val marked = keyed.foldLeft(df) { (acc, k) =>
        acc.join(k.keys, col(k.stateCol) === col(k.keyAlias), "left")
      }
      val flags = keyed.map(k => col(k.keyAlias).isNotNull)
      marked.where((inlinePred.toSeq ++ flags).reduce(_ || _))
        .drop(keyed.map(_.keyAlias): _*)
    }
  }

  /** Restrict `df` to rows whose `column` is among the (pinned,
    * small) batch's distinct `keyCol` values — semantics-preserving
    * for the FK probes: a parent/child row with a key outside the
    * batch can never produce a violation row. Falls back to `df`
    * unchanged when the batch exceeds the cap. */
  private def inlineKeyFilter(df: DataFrame, column: String,
      batch: DataFrame, keyCol: String): DataFrame = {
    val vals = collectInlineKeys(batch, keyCol)
    if (vals.nonEmpty && vals.length <= InlineKeyCap)
      df.where(col(column).isin(vals: _*))
    else df
  }

  /** Rows about to land in `t` must reference existing parent keys; a
    * NULL FK value passes (MATCH SIMPLE, the PG default — fk.rs:73-77).
    * Set-based: one left-anti join per FK instead of the reference's
    * per-row parent scan (fk.rs:92-101) — the scale-correct shape, and
    * AQE broadcasts the parent key set when it is small. Small batches
    * additionally inline their keys so the parent scan prunes to the
    * probed row groups (inlineKeyFilter). A self-referencing FK also
    * sees keys from the batch itself (a row may reference a sibling
    * inserted by the same statement). Returns message frames the
    * caller unions into its single guard job alongside the PK and
    * constraint probes. */
  private def fkOutgoingProbes(t: TableDef, rowsLogical: DataFrame): Seq[DataFrame] =
    for ((c, rt, rc) <- catalog.foreignKeysOf(t.name)) yield {
      val parent0 = inlineKeyFilter(stateAt(rt, None), rc, rowsLogical, c)
        .select(col(rc).as("_fk_parent"))
      val parent = if (rt == t.name)
        parent0.unionByName(rowsLogical.select(col(rc).as("_fk_parent")))
      else parent0
      rowsLogical.where(col(c).isNotNull)
        .join(parent, col(c) === col("_fk_parent"), "left_anti")
        .select(lit(
          s"foreign key violation: ${t.name}.$c references missing key in $rt.$rc")
          .as("_err"))
    }

  /** RESTRICT on delete, like the reference (fk.rs:20-23, 113-147): a
    * parent row cannot go away while any child row references it. Rows
    * removed by this same statement do not block it (self-FK chains
    * delete together). */
  private def fkIncomingProbes(t: TableDef, deleted: DataFrame): Seq[DataFrame] = {
    val incoming = catalog.referencingFks(t.name)
    if (incoming.isEmpty) return Nil
    // one bounded collect per referenced column, shared by every child
    // probe: Some(keys) below the cap, Some(Nil) when the batch holds
    // no non-null values (probe provably empty), None above the cap.
    // The caller pinned `deleted`, so each collect reads blocks.
    val keyCache = scala.collection.mutable.HashMap.empty[String, Option[Seq[Any]]]
    def keysOf(c: String): Option[Seq[Any]] = keyCache.getOrElseUpdate(c, {
      val vals = deleted.select(col(c)).where(col(c).isNotNull)
        .distinct().limit(InlineKeyCap + 1).collect().map(_.get(0)).toSeq
      if (vals.length <= InlineKeyCap) Some(vals) else None
    })
    for ((child, childCol, parentCol) <- incoming) yield {
      val msg = lit(
        s"foreign key violation: cannot delete from ${t.name} — $child.$childCol references it")
        .as("_err")
      def joinProbe: DataFrame = {
        // above the inline cap: the set-based shape — prune the child
        // scan where possible, then a semi join against the batch
        val childState0 = inlineKeyFilter(stateAt(child, None), childCol,
          deleted, parentCol)
        val childState = if (child == t.name)
          childState0.join(deleted.select(col(t.pk)), Seq(t.pk), "left_anti")
        else childState0
        childState.where(col(childCol).isNotNull)
          .join(deleted.select(col(parentCol).as("_fk_key")),
            col(childCol) === col("_fk_key"), "left_semi")
          .select(msg)
      }
      keysOf(parentCol) match {
        case Some(Nil) =>
          // no deletable keys -> nothing can reference them; an empty
          // LocalRelation lets PropagateEmptyRelation erase the probe
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_err",
                org.apache.spark.sql.types.StringType))))
        case Some(vals) =>
          // small batch: the probe is a pure scan-stage IN-list filter
          // on the child state — row groups prune by min/max + bloom,
          // and the plan carries NO join or exchange at all
          val base = stateAt(child, None)
            .where(col(childCol).isNotNull &&
              col(childCol).isin(vals: _*))
          if (child != t.name) base.select(msg)
          else keysOf(t.pk) match {
            // self-FK: rows deleted by this same statement never block
            case Some(pks) if pks.nonEmpty =>
              base.where(!col(t.pk).isin(pks: _*)).select(msg)
            case Some(_) => base.select(msg)
            case None => joinProbe
          }
        case None => joinProbe
      }
    }
  }

  /** INSERT (VALUES or SELECT): align source columns to the target
    * column list (by position, like the reference — sql_bridge.rs:
    * 3505-3663), unnamed columns default to NULL, enforce PK
    * uniqueness against current state and within the batch. */
  private def insertFrom(table: String, cols: Option[Seq[String]], src: DataFrame): DataFrame = {
    val t = catalog.require(table)
    checkPrivilege(table, "INSERT")
    val target = cols.getOrElse(t.columns.map(_.logical))
    require(src.columns.length == target.length,
      s"INSERT column count ${target.length} != SELECT/VALUES arity ${src.columns.length}")
    val unknown = target.filterNot(c => t.columns.exists(_.logical == c))
    require(unknown.isEmpty, s"unknown INSERT columns: ${unknown.mkString(",")}")
    val positioned = src.toDF(target: _*)
    // a column omitted from the INSERT list takes its DEFAULT, else NULL
    // (constraints.rs Default; an explicit NULL still inserts NULL, as
    // in PG)
    val defaults = defaultsOf(table)
    // pin the batch ONCE: the PK/FK/constraint probe jobs and the
    // append below all read the pinned blocks instead of re-executing
    // the source lineage per action (an INSERT ... SELECT would
    // otherwise run three times), and a trigger body writing this same
    // table cannot mutate what the pinned batch reads
    val (full, fullCounts) = catalog.autoIncSequenceFor(table)
      .filterNot { case (_, c) => target.contains(c) } match {
      case Some((seqName, idCol)) =>
        // omitted AUTO_INCREMENT column: pin the source, size the block
        // in one count job, reserve it with ONE catalog write, and let
        // executors assign the ids distributed (the reference draws
        // per row under a lock — sequences.rs:108-142; a block
        // reservation is the 100 TB shape). A literal-scale batch
        // (LocalRelation, incl. collect-literalized bounded sources)
        // assigns ids DRIVER-SIDE instead: the collect is job-free on
        // a LocalTableScan and the result stays a LocalRelation, so
        // the batch keeps the whole literal fast path — driver-folded
        // guards, job-free sequencing, single-file staging — which the
        // RDD-zip assignment would otherwise forfeit for every literal
        // VALUES insert into an auto-increment table.
        val (pinned, cnts) = pinUnlessLiteralCounted(positioned)
        val (withId, cntsOut) = pinned.queryExecution.optimizedPlan match {
          case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
            val rows = pinned.collect()
            val n = rows.length
            val first =
              if (n > 0) catalog.reserveSequenceBlock(seqName, n.toLong) else 1L
            val out = org.apache.spark.sql.types.StructType(
              pinned.schema.fields :+ org.apache.spark.sql.types.StructField(
                "_auto_id", org.apache.spark.sql.types.LongType, nullable = false))
            val seqd: java.util.List[org.apache.spark.sql.Row] =
              java.util.Arrays.asList(rows.zipWithIndex.map { case (r, i) =>
                org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (first + i))
              }.toIndexedSeq: _*)
            (spark.createDataFrame(seqd, out), None)
          case _ =>
            val counts = cnts.getOrElse(EventLog.partitionCounts(pinned))
            val n = counts.sum
            val first = if (n > 0) catalog.reserveSequenceBlock(seqName, n) else 1L
            (EventLog.assignWithOffsets(pinned, first - 1, counts, "_auto_id"),
              cnts)
        }
        (withId.select(t.columns.map(c =>
          if (c.logical == idCol) col("_auto_id").cast(c.dataType).as(c.logical)
          else if (target.contains(c.logical))
            col(c.logical).cast(c.dataType).as(c.logical)
          else expr(defaults.getOrElse(c.logical, "NULL"))
            .cast(c.dataType).as(c.logical)): _*), cntsOut)
      case None =>
        val (pinned, cnts) = pinUnlessLiteralCounted(
          positioned.select(t.columns.map(c =>
            if (target.contains(c.logical)) col(c.logical).cast(c.dataType).as(c.logical)
            else expr(defaults.getOrElse(c.logical, "NULL"))
              .cast(c.dataType).as(c.logical)): _*))
        (pinned, cnts)
    }
    fireTriggers(table, "INSERT", "BEFORE", None, Some(full))
    // every declarative guard in ONE Spark job: pk batch-duplicates, pk
    // state collisions, and NOT NULL / CHECK / UNIQUE probes union into
    // a single limit-1 collect
    // one state read shared by the pk and constraint probes — each
    // stateAt call re-plans the log scan, so building it once keeps the
    // guard job's plan (and its parquet footer work) single. A table
    // with no events at all (first bulk load) substitutes an empty
    // LocalRelation: PropagateEmptyRelation then erases the
    // state-collision probes at optimization time, so the guard job
    // carries only the within-batch checks — no stage ever scans the
    // empty log
    lazy val state: DataFrame =
      if (catalog.lastSeq(t.name) == 0L &&
          txn.forall(_.seqs.get(t.name).isEmpty) && t.attached.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(t.columns.map(c =>
            org.apache.spark.sql.types.StructField(c.logical, c.dataType))))
      else stateAt(table, None)
    def pkProbes = if (!enforcePkUniqueness) Nil else {
      val pk = t.pk
      val dupMsg = s"duplicate primary key within INSERT batch on $table"
      // a literal VALUES batch settles its within-batch duplicates on
      // the driver (aggregates don't constant-fold, so the groupBy
      // probe would otherwise be the one job a doomed literal INSERT
      // still pays); the state-collision semi-join always needs its job
      val batchDup = literalBatchDup(full, Seq(pk), skipNulls = false) match {
        case Some(true) => throw new IllegalArgumentException(dupMsg)
        case Some(false) => Nil
        case None => Seq(
          full.groupBy(col(pk)).agg(count(lit(1)).as("_n")).where(col("_n") > 1)
            .select(lit(dupMsg).as("_err")))
      }
      val existsMsg = s"primary key already exists in $table"
      // a literal-scale batch inlines its pk values so the state scan
      // prunes to the probed row groups (pushdown + bloom stamping) —
      // the FK-probe discipline (inlineKeyFilter), which a left-semi
      // join's runtime key set can never push down. The collect is
      // job-free on a LocalTableScan. Larger batches keep the
      // set-based semi join.
      val stateCollision = full.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if lr.data.length <= InlineKeyCap =>
          val ks = full.select(col(pk)).collect().map(_.get(0))
            .filter(_ != null).toIndexedSeq
          if (ks.isEmpty) Nil // an all-NULL-pk batch can collide with nothing
          else Seq(state.where(col(pk).isin(ks: _*))
            .select(lit(existsMsg).as("_err")))
        case _ => Seq(
          full.join(state.select(col(pk)), Seq(pk), "left_semi")
            .select(lit(existsMsg).as("_err")))
      }
      batchDup ++ stateCollision
    }
    val (n, last) = append(t, full, EventLog.INSERT, prePinned = true,
      pkChecked = enforcePkUniqueness,
      probes = () => pkProbes ++
        constraintViolations(t, full, state, None) ++
        rlsCheckProbes(table, full, "INSERT") ++
        fkOutgoingProbes(t, full),
      pinnedCounts = fullCounts)
    fireTriggers(table, "INSERT", "AFTER", None, Some(full))
    summary("insert", n, last)
  }

  /** UPDATE: fetch matching current-state rows, apply assignments (RHS
    * may reference old row values — Catalyst `expr`), emit full-row
    * PATCH events; a PK-changing update is SoftDelete + Insert (PG
    * semantics, sql_bridge.rs:5473-5668). */
  def update(table: String, assigns: Seq[(String, String)], where: Option[String]): DataFrame = {
    val t = catalog.require(table)
    checkPrivilege(table, "UPDATE")
    val bad = assigns.map(_._1).filterNot(a => t.columns.exists(_.logical == a))
    require(bad.isEmpty, s"unknown UPDATE columns: ${bad.mkString(",")}")
    val state = stateAt(table, None, dmlRead = true)
    // row policies narrow which rows this session's UPDATE can touch;
    // rows it cannot see survive untouched (PG UPDATE-USING semantics)
    val rlsUsing = rlsFilter(table, "UPDATE")
    val matching0 = {
      val m = where.fold(state)(w => state.where(expr(w)))
      rlsUsing.fold(m)(m.where)
    }
    def applyAssigns(src: DataFrame): DataFrame = src.select(t.columns.map { c =>
      assigns.find(_._1 == c.logical) match {
        case Some((_, e)) => expr(e).cast(c.dataType).as(c.logical)
        case None => col(c.logical)
      }
    }: _*)
    if (assigns.exists(_._1 == t.pk)) {
      // pin the matched batch first: the tombstone append below mutates
      // the very log this lineage reads, so the second (INSERT) append
      // must work from a materialized copy, not a log re-scan
      val (matching, mCounts) = pinCheckpointCounted(matching0)
      val updated = applyAssigns(matching)
      fireTriggers(table, "UPDATE", "BEFORE", Some(matching), Some(updated))
      val touched = assigns.map(_._1).toSet
      def survivors = state.join(matching.select(col(t.pk)), Seq(t.pk), "left_anti")
      def pkProbes = if (!enforcePkUniqueness) Nil else {
        // PG duplicate-key semantics (sql_bridge.rs:5473-5668): a new pk
        // may not collide with any row that survives this statement
        val pk = t.pk
        Seq(
          updated.groupBy(col(pk)).agg(count(lit(1)).as("_n")).where(col("_n") > 1)
            .select(lit(s"UPDATE produces duplicate primary keys on $table").as("_err")),
          updated.join(survivors.select(col(pk)), Seq(pk), "left_semi")
            .select(lit(s"primary key already exists in $table").as("_err")))
      }
      val (nd, _) = append(t, matching, EventLog.SOFT_DELETE, prePinned = true,
        probes = () => pkProbes ++
          constraintViolations(t, updated, survivors, Some(touched)) ++
          rlsCheckProbes(table, updated, "UPDATE") ++
          fkChangedProbes(t, assigns, updated) ++
          fkIncomingOnUpdateProbes(t, assigns, state, matching, updated),
        pinnedCounts = Some(mCounts))
      val (_, last) = append(t, updated, EventLog.INSERT, prePinned = true,
        pinnedCounts = Some(mCounts))
      fireTriggers(table, "UPDATE", "AFTER", Some(matching), Some(updated))
      summary("update", nd, last)
    } else {
      // pin the matched batch once: trigger/FK probe jobs and the append
      // read blocks instead of replaying the state collapse per action,
      // and a trigger body writing this table cannot change what the
      // batch lineage re-reads
      val (matching, mCounts) = pinCheckpointCounted(matching0)
      val updated = applyAssigns(matching)
      fireTriggers(table, "UPDATE", "BEFORE", Some(matching), Some(updated))
      val (n, last) = append(t, updated, EventLog.PATCH, prePinned = true,
        probes = () => constraintViolations(t, updated,
          state.join(matching.select(col(t.pk)), Seq(t.pk), "left_anti"),
          Some(assigns.map(_._1).toSet)) ++
          rlsCheckProbes(table, updated, "UPDATE") ++
          fkChangedProbes(t, assigns, updated) ++
          fkIncomingOnUpdateProbes(t, assigns, state, matching, updated),
        pinnedCounts = Some(mCounts))
      fireTriggers(table, "UPDATE", "AFTER", Some(matching), Some(updated))
      summary("update", n, last)
    }
  }

  /** UPDATE re-validates only FK columns the SET list touches — an
    * update that leaves an FK column alone doesn't re-check the parent
    * (PG behavior, fk.rs:150-181). */
  private def fkChangedProbes(t: TableDef, assigns: Seq[(String, String)],
      updated: DataFrame): Seq[DataFrame] = {
    val touched = assigns.map(_._1).toSet
    for ((c, rt, rc) <- catalog.foreignKeysOf(t.name) if touched(c)) yield {
      // small updated batches inline their new FK values so the parent
      // scan prunes to the probed row groups (same as fkOutgoingProbes)
      val parent = inlineKeyFilter(stateAt(rt, None), rc, updated, c)
        .select(col(rc).as("_fk_parent"))
      updated.where(col(c).isNotNull)
        .join(parent, col(c) === col("_fk_parent"), "left_anti")
        .select(lit(
          s"foreign key violation: ${t.name}.$c references missing key in $rt.$rc")
          .as("_err"))
    }
  }

  /** RESTRICT for the parent side of an UPDATE, mirroring the DELETE
    * guard: rewriting a column other tables reference must not orphan
    * their rows (ON UPDATE actions parse but act as RESTRICT). A key
    * counts as removed when it exists before the statement but is held
    * by no row after it — matched rows carry their new values, rows the
    * WHERE didn't touch keep their old ones. */
  private def fkIncomingOnUpdateProbes(t: TableDef, assigns: Seq[(String, String)],
      state: DataFrame, matching: DataFrame, updated: DataFrame): Seq[DataFrame] = {
    val touched = assigns.map(_._1).toSet
    val incoming = catalog.referencingFks(t.name).filter(f => touched(f._3))
    if (incoming.isEmpty) Nil
    else {
      val pk = t.pk
      val untouchedRows = state.join(matching.select(col(pk)), Seq(pk), "left_anti")
      for ((child, childCol, parentCol) <- incoming) yield {
        val after = untouchedRows.select(col(parentCol).as("_fk_key"))
          .unionByName(updated.select(col(parentCol).as("_fk_key")))
        val removed = matching.select(col(parentCol).as("_fk_key")).except(after)
        // a self-referencing child is judged on its own post-update rows
        val childRows = if (child == t.name) untouchedRows.unionByName(updated)
          else stateAt(child, None)
        childRows.where(col(childCol).isNotNull)
          .join(removed, col(childCol) === col("_fk_key"), "left_semi")
          .select(lit(
            s"foreign key violation: cannot change ${t.name}.$parentCol — $child.$childCol references it")
            .as("_err"))
      }
    }
  }

  /** DELETE: matching current-state rows become SoftDelete tombstones
    * (payload keeps the last row image, like the drift history shows). */
  def delete(table: String, where: Option[String]): DataFrame = {
    val t = catalog.require(table)
    checkPrivilege(table, "DELETE")
    val state = stateAt(table, None, dmlRead = true)
    // rows the session cannot see (RLS DELETE-USING) are not deletable
    val matching0 = {
      val m = where.fold(state)(w => state.where(expr(w)))
      rlsFilter(table, "DELETE").fold(m)(m.where)
    }
    // pin the doomed batch once — FK/trigger probe jobs and the append
    // read blocks instead of replaying state collapse per action, and a
    // trigger body writing this table cannot change what the lazy
    // lineage re-reads
    val (matching, mCounts) = pinCheckpointCounted(matching0)
    fireTriggers(table, "DELETE", "BEFORE", Some(matching), None)
    val (n, last) = append(t, matching, EventLog.SOFT_DELETE, prePinned = true,
      probes = () => fkIncomingProbes(t, matching),
      pinnedCounts = Some(mCounts))
    fireTriggers(table, "DELETE", "AFTER", Some(matching), None)
    summary("delete", n, last)
  }

  /** TRUNCATE = soft-delete every current row (sql_bridge.rs:701-750);
    * DELETE triggers fire with the full table as old_rows. */
  def truncate(table: String): DataFrame = {
    val r = delete(table, None)
    // an emptied table's ordered-ingest watermark resets with it —
    // a rebuilt pipeline re-ingests from pk 1, like the pre-watermark
    // content-derived guard would have allowed
    catalog.clearWatermark(table)
    r
  }

  /** Some(shape) iff the SQL is incrementally maintainable
    * (IncrementalView.parse) over a (non-attached) engine table of
    * this catalog — attached event logs have no sequence bookkeeping
    * to anchor a refresh horizon to — and no SUM/AVG reads a
    * FLOAT/DOUBLE expression (see floatSumAvg). */
  private def incShapeOf(sql: String): Option[IncrementalView.Shape] =
    IncrementalView.parse(sql)
      .filter(sh => catalog.get(sh.table).exists(_.attached.isEmpty))
      .filterNot(sh => floatSumAvg(sh.aggs,
        emptyLogicalFrame(catalog.require(sh.table))))

  /** Some(shape) iff the SQL is an incrementally maintainable
    * two-table equi-join view (IncrementalView.parseJoin) whose sides
    * are both non-attached engine tables of this catalog, with the
    * same FLOAT/DOUBLE SUM/AVG rejection as incShapeOf (types resolve
    * against the aliased empty join chain). */
  private def joinShapeOf(sql: String): Option[IncrementalView.JoinShape] =
    IncrementalView.parseJoin(sql)
      .filter(_.tables.forall(tn =>
        catalog.get(tn).exists(_.attached.isEmpty)))
      .filterNot(js => floatSumAvg(js.aggs,
        js.joined(js.tables.map(tn => emptyLogicalFrame(catalog.require(tn))))))

  /** An empty local frame with `t`'s logical schema — for driver-side
    * expression-type resolution only (analysis, never a job). */
  private def emptyLogicalFrame(t: TableDef): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType(t.columns.map(c => StructField(c.logical, c.dataType))))

  /** True when any SUM/AVG aggregate reads a FLOAT/DOUBLE-typed
    * expression — such views must NOT enter the maintainable shape:
    * the stored accumulator would be a double, and signed-delta
    * subtract-then-add over doubles is order-dependent and drifts
    * cumulatively across refreshes, so incremental and full refresh
    * would silently diverge (the shape's contract is bit-parity).
    * Integer and DECIMAL sums are exact; MIN/MAX/COUNT over doubles
    * stay maintainable (value identity, no accumulation). A cast
    * inside the aggregate (`SUM(CAST(x AS DECIMAL(38,6)))`) resolves
    * to its exact target type and passes. Unresolvable expressions
    * gate out too — full rerun serves (and error-reports) them. */
  private def floatSumAvg(aggs: Seq[IncrementalView.Agg],
      base: => DataFrame): Boolean = {
    val sumAvgExprs = aggs.collect {
      case IncrementalView.SumExpr(e, _) => e
      case IncrementalView.AvgExpr(e, _) => e
      // a set-sum over doubles is just as order-dependent as a bag-sum
      case IncrementalView.SumDistinctExpr(e, _) => e
      case IncrementalView.AvgDistinctExpr(e, _) => e
    }
    sumAvgExprs.nonEmpty && {
      val frame = scala.util.Try(base)
      sumAvgExprs.exists { e =>
        frame.flatMap(f => scala.util.Try(
          f.select(expr(e)).schema.head.dataType)).toOption match {
          case Some(FloatType | DoubleType) => true
          case Some(_) => false
          case None => true
        }
      }
    }
  }

  // ------------------------------------------- bucketed aux store IO

  private def hadoopFs(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write one alias's bucket → store-version manifest into a view
    * VERSION dir. Plain JSON array of AuxBuckets longs — pointer
    * metadata, not data, so it bypasses parquet encryption like the
    * catalog meta does. */
  private def writeAuxManifest(versionPath: String, alias: String,
      pointers: Array[Long]): Unit = {
    val p = new Path(versionPath + "/" +
      IncrementalView.auxManifestFile(alias))
    val out = hadoopFs(versionPath).create(p, true)
    try out.write(pointers.mkString("[", ",", "]").getBytes("UTF-8"))
    finally out.close()
  }

  private def readAuxManifest(versionPath: String, alias: String)
      : Option[Array[Long]] = {
    val p = new Path(versionPath + "/" +
      IncrementalView.auxManifestFile(alias))
    val fs = hadoopFs(versionPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
      Some(s.trim.stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.toLong))
    }
  }

  /** The existing bucket-partition paths for the pointed-at buckets —
    * an empty bucket writes no partition dir, so resolution filters
    * to paths that exist. */
  private def auxBucketPaths(name: String, alias: String,
      pointers: Array[Long], buckets: Seq[Int]): Seq[String] = {
    val fs = hadoopFs(catalog.mviewAuxStoreRoot(name, alias))
    buckets.map(b =>
      catalog.mviewAuxStorePath(name, alias, pointers(b)) +
        s"/${IncrementalView.AuxBucketCol}=$b")
      .filter(p => fs.exists(new Path(p)))
  }

  /** Write aux rows (bucket-partitioned) under one store version. */
  private def writeAuxBuckets(df: DataFrame, name: String, alias: String,
      groupAliases: Seq[String], storeVersion: Long): Unit =
    encrypted(df.withColumn(IncrementalView.AuxBucketCol,
        IncrementalView.auxBucket(groupAliases)).write)
      .mode("overwrite").partitionBy(IncrementalView.AuxBucketCol)
      .parquet(catalog.mviewAuxStorePath(name, alias, storeVersion))

  /** Aux-backed-aggregate maintenance (COUNT(DISTINCT), MIN, MAX)
    * around a merged main frame: merge each alias's aux (per-(group,
    * value) live counts) from the SAME signed frame the main merge
    * consumed, overlay the touched groups' exact values onto the
    * main, and return the final main plus write closures to run once
    * the new version number is fixed (after the main lands). Round
    * 18: the aux store is BUCKETED — the merge reads only the
    * buckets the delta's group keys hash into, rewrites exactly
    * those under the new store version, and carries every other
    * manifest pointer forward, so refresh write cost is O(touched
    * buckets), never O(frame). A monolithic pre-r18 aux dir upgrades
    * in place: its whole frame merges once and lands bucketed. A
    * version with NEITHER manifest nor legacy dir was stored by an
    * engine that gated MIN/MAX instead of aux-backing it — one full
    * REFRESH (re)writes every aux. */
  private def mergeWithAux(name: String, prev: Long,
      merged0: DataFrame, sd: DataFrame, groupCols: Seq[String],
      auxes: Seq[IncrementalView.Agg])
      : (DataFrame, Seq[Long => Unit]) = {
    var main = merged0
    val prevPath = catalog.mviewDataPath(name, prev)
    // aggregates over the SAME value expression share one physical
    // frame (MIN(v) + MAX(v) + COUNT(DISTINCT v) = one merge, one
    // store, one overlay pass) — auxGroups derives the grouping
    // identically at CREATE/REFRESH/read so the layout is stable
    val writes = IncrementalView.auxGroups(auxes).map { case (rep, members) =>
      readAuxManifest(prevPath, rep.alias) match {
        case Some(pointers) =>
          // touched buckets from the pinned delta's group keys — a
          // ≤ AuxBuckets-row collect
          val touched = sd
            .select(IncrementalView.auxBucket(groupCols).as("__b"))
            .distinct().collect().map(_.getInt(0)).toSeq.sorted
          val paths = auxBucketPaths(name, rep.alias, pointers, touched)
          val auxStored =
            if (paths.nonEmpty) spark.read.parquet(paths: _*)
            else IncrementalView
              .auxSigned(sd, groupCols, rep.alias).where(lit(false))
              .drop("__sign")
              .withColumn(IncrementalView.RowsCol, lit(0L))
          val auxMerged = IncrementalView
            .auxMerge(auxStored, sd, groupCols, rep.alias)
          main = IncrementalView.overlayAux(
            main, auxMerged, sd, groupCols, members)
          (newVer: Long) => {
            writeAuxBuckets(auxMerged, name, rep.alias, groupCols, newVer)
            writeAuxManifest(catalog.mviewDataPath(name, newVer),
              rep.alias, touched.foldLeft(pointers.clone()) {
                (ps, b) => ps(b) = newVer; ps })
          }
        case None =>
          // legacy monolithic dir: read whole, merge, land bucketed
          val auxPath = prevPath + "/" + IncrementalView.auxDir(rep.alias)
          val auxStored =
            try spark.read.parquet(auxPath)
            catch {
              // ONLY the missing-path analysis error maps to the
              // "older engine version" prescription — a transient
              // filesystem fault must surface as itself, not as
              // advice to re-run a (100 TB-scale) full refresh
              case e: org.apache.spark.sql.AnalysisException =>
                throw new IllegalStateException(
                  s"$name's aux frame for ${rep.alias} is missing (view " +
                    "stored by an older engine version) — run a full " +
                    "(non-incremental) REFRESH once to rebuild it", e)
            }
          val auxMerged = IncrementalView
            .auxMerge(auxStored, sd, groupCols, rep.alias)
          main = IncrementalView.overlayAux(
            main, auxMerged, sd, groupCols, members)
          (newVer: Long) => {
            writeAuxBuckets(auxMerged, name, rep.alias, groupCols, newVer)
            writeAuxManifest(catalog.mviewDataPath(name, newVer),
              rep.alias,
              Array.fill(IncrementalView.AuxBuckets)(newVer))
          }
      }
    }
    (main, writes)
  }

  /** Populate the aux frames (COUNT(DISTINCT), MIN, MAX) for a freshly
    * aggregated view version — `base` is the where-filtered state (or
    * joined relation) the main aggregation consumed; one bucketed
    * store version + manifest per distinct value expression
    * (auxGroups), every pointer at `version`. */
  private def writeAuxes(base: DataFrame,
      keys: Seq[IncrementalView.GroupKey],
      auxes: Seq[IncrementalView.Agg], name: String, version: Long): Unit =
    IncrementalView.auxGroups(auxes).foreach { case (rep, _) =>
      writeAuxBuckets(IncrementalView.auxAggregate(base, keys, rep),
        name, rep.alias, keys.map(_.alias), version)
      writeAuxManifest(catalog.mviewDataPath(name, version), rep.alias,
        Array.fill(IncrementalView.AuxBuckets)(version))
    }

  /** A filter restricting a state read to the pks touched in
    * (r, horizon]. A small touched set inlines TYPED pk values (from
    * the event payload, not the canonical string pk) so the state
    * reads prune their scans by pushdown — the filter passes through
    * the collapse window because pk is its partitioning column. Past
    * the cap, the semi join stands: O(touched) keys at 100 TB can be
    * millions of rows, which must never collect. */
  private def touchedRestrictor(t: TableDef, r: Long, horizon: Long)
      : DataFrame => DataFrame = touchedFilters(t, r, horizon)._1

  /** Semi AND anti restrictors over ONE touched-key collection: the
    * semi side keeps state rows whose pk saw an event in (r, horizon]
    * (the delta frames), the anti side drops exactly those rows — the
    * join-view refresh derives each OLD-horizon prefix as
    * (new state − touched pks) ∪ old touched rows instead of a second
    * horizon scan, so both filters must come from the same key set
    * (and the inline-key job must run once, not per filter). */
  private def touchedFilters(t: TableDef, r: Long, horizon: Long)
      : (DataFrame => DataFrame, DataFrame => DataFrame) = {
    val touched = events(t)
      .where(col("sequence") > r && col("sequence") <= horizon)
      .select(col("pk")).distinct()
    val touchedTyped: Option[IndexedSeq[Any]] =
      tracer.span("touched-keys") {
        val ks = collectInlineKeys(
          events(t)
            .where(col("sequence") > r && col("sequence") <= horizon)
            .select(col(s"payload.${t.pkPhysical}").as("__k")),
          "__k")
        if (ks.nonEmpty && ks.length <= InlineKeyCap) Some(ks) else None
      }
    (state => touchedTyped match {
      case Some(ks) => state.where(col(t.pk).isin(ks: _*))
      case None => state.join(touched,
        col(t.pk).cast("string") === touched("pk"), "left_semi")
    },
    state => touchedTyped match {
      case Some(ks) => state.where(!col(t.pk).isin(ks: _*))
      case None => state.join(touched,
        col(t.pk).cast("string") === touched("pk"), "left_anti")
    })
  }

  /** Both horizon states of an incremental refresh from ONE pruned
    * scan (round 16): when the old and new bounds collapse over the
    * SAME checkpoint-plus-tail source — out of transaction,
    * non-attached, same nearest snapshot for both bounds — the
    * two-bound collapse emits each pk's old- and new-horizon winner
    * rows in a single window pass (one scan, one pk Exchange) flagged
    * `StateView.OldWinCol` / `NewWinCol`, instead of two scans and
    * two shuffles of the same touched rows. Flat logs skip the window
    * entirely: the old side is the sequence <= r prefix of the flat
    * scan. Columns map physical -> logical exactly like stateAt.
    * Returns None whenever any stateAt special case could apply —
    * callers fall back to two independent stateAt reads. */
  /** A table whose USER columns sit inside the engine's hidden
    * `__graft_` namespace. CREATE/ALTER reject the prefix since round
    * 16, so only a table attached or restored from a pre-r16 layout
    * can carry one — but every refresh path that mints `__graft_*`
    * working columns (fused two-bound flags, cascade key frames,
    * recompute value frames, touched-group semi keys) would then hit
    * an ambiguous-reference AnalysisException mid-refresh. Such legacy
    * tables take the mint-free fallbacks instead: two independent
    * stateAt reads, unpruned full sides, the plain semi-join prune. */
  private def carriesHiddenCols(t: TableDef): Boolean =
    t.columns.exists(c => IncrementalView.hidden(c.logical) ||
      IncrementalView.hidden(c.physical))

  /** Test hook: force every fused-read eligibility check to decline,
    * as the txn / attached / differing-checkpoint / hidden-column
    * special cases do. The decline path is correct-but-slower by
    * contract; the property suite churns the same workload with and
    * without fusion and asserts byte-identical stored views, so a
    * future decline-condition bug surfaces as a test diff rather than
    * a silent slow path (or worse, a fused-only divergence). */
  private[graft] var disableFusedReads = false

  /** The decline is correct-but-slower (two independent stateAt reads
    * instead of one fused scan) and used to be INVISIBLE — a zero-cost
    * trace span names the reason so an operator reading SHOW TRACE can
    * tell a fused refresh from a declined one without source-diving. */
  private def fusedDecline(t: TableDef, reason: String): Option[DataFrame] = {
    tracer.span("fused-read-declined", s"${t.name}: $reason")(())
    None
  }

  private def fusedHorizonStates(t: TableDef, r: Long, h: Long)
      : Option[DataFrame] = {
    if (disableFusedReads) return fusedDecline(t, "forced by test hook")
    if (txn.isDefined || dmlReadScope)
      return fusedDecline(t, "transaction-scoped read")
    if (t.attached.isDefined) return fusedDecline(t, "attached event log")
    // a user column inside the engine's hidden namespace would
    // collide with the appended flag columns (duplicate names →
    // ambiguous-reference at the fusedSides filters) — such tables
    // keep the two independent stateAt reads, which never mint names
    if (carriesHiddenCols(t))
      return fusedDecline(t, "legacy __graft_ user column")
    val snapDir = catalog.snapshotPath(t.name)
    val baseR = tracer.span("fused-plan", t.name) {
      Snapshots.nearest(spark, snapDir, Some(r))
    }
    if (baseR != Snapshots.nearest(spark, snapDir, Some(h)))
      return fusedDecline(t, "bounds straddle a checkpoint")
    val ev = events(t)
    val source = baseR match {
      case Some(b) =>
        Snapshots.read(spark, snapDir, b, Some(EventLog.schema(t.payloadSchema)))
          .unionByName(
            ev.where(col("sequence") > b && col("sequence") <= h),
            allowMissingColumns = true)
      case None => ev.where(col("sequence") <= h)
    }
    val flagged =
      if (catalog.isFlatLog(t.name)) {
        // INSERT-only distinct pks (plus a disjoint checkpoint): every
        // row is its own winner; membership in the old state is just
        // the sequence bound
        val fields = t.payloadSchema.fieldNames.toIndexedSeq
        source
          .withColumn(StateView.OldWinCol, col("sequence") <= r)
          .withColumn(StateView.NewWinCol, lit(true))
          .select(fields.map(f => col(s"payload.`$f`").as(f))
            :+ col(StateView.OldWinCol) :+ col(StateView.NewWinCol): _*)
      } else StateView.twoBoundKeyed(source, r, t.pkPhysical)
    val have = flagged.columns.toSet
    Some(flagged.select(t.columns.map(c =>
      (if (have(c.physical)) col(c.physical)
       else lit(null).cast(c.dataType)).as(c.logical))
      :+ col(StateView.OldWinCol) :+ col(StateView.NewWinCol): _*))
  }

  /** Split a pinned fused two-bound frame into its old/new sides. */
  private def fusedSides(pinned: DataFrame): (DataFrame, DataFrame) =
    (pinned.where(col(StateView.OldWinCol))
       .drop(StateView.OldWinCol, StateView.NewWinCol),
     pinned.where(col(StateView.NewWinCol))
       .drop(StateView.OldWinCol, StateView.NewWinCol))

  /** Restrict a view's WHERE-filtered base state to (a superset of)
    * the rows of the GROUPS the signed delta touches — the ACD
    * retraction recompute's input. The filter necessarily applies
    * POST-collapse: a non-pk predicate cannot soundly cross the keyed
    * collapse window (dropping a non-matching NEWER event would
    * promote a stale event to "latest"), so a retracting refresh pays
    * one state read — snapshot-accelerated like any state read — and
    * the filter bounds the RE-AGGREGATION to the touched groups'
    * rows, not the scan. (Still strictly cheaper than the full
    * refresh it replaces, which pays the same read plus a full
    * re-aggregation and a full view + aux rewrite; and the common
    * append-shaped refresh never comes here at all.) ANY single-key
    * view — bare column and computed expression alike — inlines the
    * touched key VALUES (≤ InlineKeyCap) as an
    * in-list over the evaluated key expression; `isin` never matches
    * NULL, so a NULL touched key adds
    * the isNull arm. Multi-key
    * and past-the-cap views take a null-safe left-semi join on the
    * evaluated key expressions — exact and never collecting. Either
    * way the overlay's touched flag decides which groups actually
    * rewrite, so a superset here costs compute, never correctness.
    * Multi-key views (round 16) no longer semi-join the RAW state:
    * under the cap each key column's touched values push into the
    * scan as a conjunction of per-column in-lists — a sound SUPERSET
    * of the touched tuple set (its per-column projection product) —
    * and the null-safe left-semi stays on top as the exact tuple
    * filter, so a small composite-key retraction reads matching row
    * groups instead of the table. */
  private def pruneToTouchedGroups(state: DataFrame, sd: DataFrame,
      groupKeys: Seq[IncrementalView.GroupKey]): DataFrame = {
    val groupCols = groupKeys.map(_.alias)
    val touched = sd.select(groupCols.map(col): _*).distinct()
    def colPred(k: IncrementalView.GroupKey,
        vals: IndexedSeq[Any]): Option[Column] =
      if (vals.length > InlineKeyCap) None
      else Some(touchedInList(expr(k.e), vals))
    groupKeys match {
      case Seq(k) =>
        val vals = tracer.span("acd-touched-groups") {
          touched.limit(InlineKeyCap + 1).collect().map(_.get(0)).toIndexedSeq
        }
        colPred(k, vals).map(state.where)
          .getOrElse(semiOnTouched(state, touched, groupKeys))
      case _ =>
        val preds = groupKeys.map { k =>
          val vals = tracer.span("acd-touched-groups") {
            sd.select(col(k.alias)).distinct()
              .limit(InlineKeyCap + 1).collect().map(_.get(0)).toIndexedSeq
          }
          colPred(k, vals)
        }
        // each defined per-column in-list is independently a sound
        // superset restriction — apply whichever columns stayed under
        // the cap even when another overflowed
        val pre = preds.flatten.reduceOption(_ && _)
          .map(state.where).getOrElse(state)
        semiOnTouched(pre, touched, groupKeys)
    }
  }

  /** The exact touched-tuple filter: a null-safe left-semi of `state`
    * against the distinct touched group tuples, with the touched keys
    * renamed out of the state's namespace so the key EXPRESSIONS
    * (which may be the same bare identifiers) resolve against the
    * state side only. */
  private def semiOnTouched(state: DataFrame, touched: DataFrame,
      groupKeys: Seq[IncrementalView.GroupKey]): DataFrame = {
    // minted names live in the reserved __graft_ namespace so a user
    // column can never capture them (CREATE TABLE rejects the prefix);
    // a LEGACY pre-r16 table could still carry one — its unfiltered
    // state is a sound superset (the caller's overlay decides which
    // groups rewrite), so skip the semi rather than join ambiguously
    if (state.columns.exists(IncrementalView.hidden)) return state
    val tg = touched.select(groupKeys.map(k =>
      col(k.alias).as(s"__graft_tg_${k.alias}")): _*)
    val cond = groupKeys.map(k =>
      expr(k.e) <=> col(s"__graft_tg_${k.alias}")).reduce(_ && _)
    state.join(tg, cond, "left_semi")
  }

  /** In-list predicate over possibly-NULL touched values: `isin` over
    * the non-null values (lit(false) when there are none) plus an
    * isNull arm when NULL itself is touched — `isin` never matches
    * NULL. Shared by every touched-value scan restriction. */
  private def touchedInList(e: Column, vals: IndexedSeq[Any]): Column = {
    val (nulls, nonNull) = vals.partition(_ == null)
    val base = if (nonNull.nonEmpty) e.isin(nonNull: _*) else lit(false)
    if (nulls.nonEmpty) base || e.isNull else base
  }

  /** Restrict ONE side's state to rows whose `keyExpr` (a bare column
    * or a computed expression over that side's columns — round 17)
    * evaluates to one of the signed delta's distinct touched values of
    * group alias `alias` — a per-key SUPERSET of the touched group
    * tuples (callers post-filter with pruneToTouchedGroups for
    * exactness). Inline in-list with an isNull arm under the cap (a
    * bare-column in-list pushes into the scan; a computed one
    * evaluates scan-stage, still before any join); a pinned
    * distributed null-safe left-semi past it. */
  private def touchedValueRestrict(state: DataFrame, keyExpr: Column,
      sd: DataFrame, alias: String, pin: DataFrame => DataFrame,
      tag: Int): DataFrame = {
    val touched = sd.select(col(alias)).distinct()
    val vals = tracer.span("recompute-root-keys") {
      touched.limit(InlineKeyCap + 1).collect().map(_.get(0)).toIndexedSeq
    }
    if (vals.length <= InlineKeyCap) {
      state.where(touchedInList(keyExpr, vals))
    } else {
      val ka = s"__graft_tv$tag"
      // touched is already distinct — the rename alone suffices
      state.join(pin(touched.select(col(alias).as(ka))),
        keyExpr <=> col(ka), "left_semi")
    }
  }

  /** The join-shape sketch recompute's input (round 16): the
    * new-state join restricted — as a SUPERSET — to the touched
    * groups' rows, instead of joining raw full sides. Every group key
    * that is a bare (or table-qualified) column of exactly one side
    * restricts that side to the delta's touched values for it; from
    * one such restricted side, the cascade pushes key restrictions
    * outward along the join tree, so partner sides prune to the rows
    * that can reach a touched group's row at all — at 100 TB the
    * retraction recompute reads matching row groups of each partner,
    * not the partner tables. Soundness: a joined row of a touched
    * group g contains the root side's row carrying g's key value
    * (kept by the value restriction), and each partner row along the
    * tree joins it hop by hop (kept by the cascade) — so every row
    * pruneToTouchedGroups would keep survives. A group key owned by
    * exactly one side — a bare column, a qualified column, or (round
    * 17) a computed expression whose every column reference resolves
    * to that side (`t1.v % 5`) — restricts its side by the evaluated
    * expression; only a key whose references span sides (or none)
    * restricts nothing. With no owned key at all the join stays
    * unrestricted and the post-filter alone bounds the
    * re-aggregation, as before. */
  private def recomputeJoinInput(js: IncrementalView.JoinShape,
      sides: Seq[String], adj: Array[List[(Int, String, String)]],
      fullNew: Seq[DataFrame], sd: DataFrame,
      pin: DataFrame => DataFrame): DataFrame = {
    // legacy __graft_-columned base tables skip the value/cascade
    // restrictions (which mint __graft_tv*/__graft_ck* frames) — the
    // unrestricted join is the pre-r16 fallback, still exact after
    // pruneToTouchedGroups' post-filter
    if (sides.exists(tn => carriesHiddenCols(catalog.require(tn))))
      return js.joined(fullNew)
    // the side owning a key expression: every column reference in it
    // resolves to the same single side. Qualifiers are the join
    // aliases (= table names); a bare reference must be a column of
    // exactly one side (the shape already requires group columns be
    // unambiguous in the joined relation).
    def sideOf(parts: Seq[String]): Option[Int] = parts match {
      case Seq(q, c) =>
        val i = sides.indexWhere(_.equalsIgnoreCase(q))
        if (i >= 0 && fullNew(i).columns.exists(_.equalsIgnoreCase(c)))
          Some(i)
        else None
      case Seq(c) =>
        val owners = sides.indices.filter(i =>
          fullNew(i).columns.exists(_.equalsIgnoreCase(c)))
        if (owners.sizeIs == 1) Some(owners.head) else None
      case _ => None
    }
    def owner(k: IncrementalView.GroupKey): Option[Int] = {
      val refs =
        try spark.sessionState.sqlParser.parseExpression(k.e).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts
        }
        catch { case _: Exception => return None }
      val owners = refs.map(sideOf)
      // a constant key restricts nothing; any unresolvable or
      // cross-side reference disqualifies the key
      if (owners.nonEmpty && owners.forall(_ == owners.head)) owners.head
      else None
    }
    val owned: Seq[(Int, IncrementalView.GroupKey)] =
      js.groupKeys.flatMap(k => owner(k).map(i => (i, k)))
    if (owned.isEmpty) return js.joined(fullNew)
    val frames = fullNew.toArray
    var tag = 0
    for ((i, k) <- owned) {
      // alias the side with its join-alias so a QUALIFIED reference in
      // the key expression resolves against this single frame
      frames(i) = touchedValueRestrict(frames(i).alias(sides(i)),
        expr(k.e), sd, k.alias, pin, tag)
      tag += 1
    }
    val root = owned.map(_._1).min
    val visited = scala.collection.mutable.Set(root)
    var frontier: List[(Int, DataFrame)] = List(root -> frames(root))
    while (frontier.nonEmpty) {
      val next = List.newBuilder[(Int, DataFrame)]
      for ((t, frame) <- frontier; (u, ct, cu) <- adj(t) if !visited(u)) {
        visited += u
        val (_, restricted) = cascadeHop(frame, ct, frames(u), cu, pin, tag)
        tag += 1
        frames(u) = restricted
        next += ((u, restricted))
      }
      frontier = next.result()
    }
    js.joined(frames.toIndexedSeq)
  }

  /** SNAPSHOT/VACUUM/CHECKPOINT TABLE: materialize collapsed state at
    * the current sequence (engine.rs:739-845).
    *
    * The collapse source is the newest checkpoint <= seq unioned with
    * the log tail above it — NOT the raw log. After VACUUM RETAIN the
    * pre-floor log files are physically gone, so a raw-log collapse
    * would silently drop every reclaimed row from the new checkpoint,
    * and reads prefer the newest snapshot: that is durable data loss
    * on the very next SNAPSHOT (or auto-snapshot). Tail-based collapse
    * is also the 100 TB shape — checkpoint cost is proportional to
    * events since the last snapshot, not to full history. */
  def snapshot(table: String, atSeq: Option[Long] = None): DataFrame =
    tracer.span("snapshot", table)(snapshotInner(table, atSeq))

  private def snapshotInner(table: String, atSeq: Option[Long]): DataFrame = {
    if (txn.isDefined)
      throw new IllegalStateException(
        "SNAPSHOT cannot run inside a transaction: the checkpoint would " +
          "durably capture uncommitted buffered writes")
    val t = catalog.require(table)
    val seq = atSeq.getOrElse(catalog.lastSeq(t.name))
    val snapDir = catalog.snapshotPath(table)
    val base = Snapshots.nearest(spark, snapDir, Some(seq))
    // base == seq: the state at seq is already checkpointed — and
    // overwriting the dir our own scan would read from is a
    // read-while-delete hazard. No-op.
    if (!base.contains(seq)) {
      val src = base match {
        case Some(b) =>
          Snapshots.read(spark, snapDir, b, Some(EventLog.schema(t.payloadSchema)))
            .unionByName(
              events(t).where(col("sequence") > b && col("sequence") <= seq),
              allowMissingColumns = true)
        case None => events(t)
      }
      val opts = (if (encryptionOn)
          Map("parquet.encryption.uniform.key" -> Encryption.MasterKeyId)
        else Map.empty[String, String]) ++ bloomOptions(t)
      // flat-log certificate: every source row is already a unique-pk
      // INSERT (checkpoint rows are collapsed inserts; tail events are
      // certified inserts disjoint from them), so the collapse window
      // would be an identity — write the frames directly. This is what
      // keeps AUTO-snapshots of append-only streaming registries from
      // re-windowing the whole registry every 100k postings.
      if (t.attached.isEmpty && catalog.isFlatLog(t.name))
        Snapshots.writePrecollapsed(
          src.where(col("sequence") <= seq).select(col("sequence"),
            col("ts"), col("event_type"), col("pk"), col("payload")),
          snapDir, seq, opts)
      else Snapshots.write(src, snapDir, seq, opts)
    }
    lastSnapSeqs(table) = math.max(lastSnapSeqs.getOrElse(table, 0L), seq)
    metricSnapshots += 1
    summary("snapshot", 0L, seq)
  }

  /** OPTIMIZE t [ZORDER BY (c1, ...)]: rewrite the current checkpoint
    * with a clustered physical layout (graft.operators.ZOrder). The
    * flow is deliberately two-phase so the expensive state collapse
    * runs exactly once and the clustering pass reads flat parquet:
    *   1. ensure a checkpoint exists at the current sequence
    *      (`snapshot` — a no-op when one is already there);
    *   2. read that checkpoint (a plain columnar scan, no collapse),
    *      cluster it, and publish as the NEXT snapshot version dir —
    *      the old version keeps serving reads until the new one is
    *      complete, so the rewrite is crash-safe with no in-place
    *      overwrite.
    * Clustering columns default to the primary key (point-lookup
    * locality); multi-column ZORDER BY interleaves so every listed
    * column's parquet min/max stats stay selective at once. */
  def optimize(table: String, zorderBy: Seq[String] = Seq.empty): DataFrame = {
    if (txn.isDefined)
      throw new IllegalStateException("OPTIMIZE cannot run inside a transaction")
    // rewrites the shared checkpoint layout (PG's CLUSTER requires
    // ownership for the same reason) — admin surface under the gate
    requirePerm("OPTIMIZE", "COMPACT") // admin carries CompactDatabase
    val t = catalog.require(table)
    require(t.attached.isEmpty, s"cannot optimize attached event log: $table")
    val logical = if (zorderBy.nonEmpty) zorderBy else Seq(t.pk)
    val physical = logical.map { name =>
      t.columns.find(_.logical.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"ZORDER BY column $name does not exist in $table")).physical
    }
    snapshot(table)
    val seq = catalog.lastSeq(t.name)
    val snapDir = catalog.snapshotPath(table)
    val frames = Snapshots.read(spark, snapDir, seq,
      Some(EventLog.schema(t.payloadSchema)))
    val clustered = graft.operators.ZOrder.cluster(
      frames, physical.map(p => s"payload.$p"),
      spark.sessionState.conf.numShufflePartitions)
    Snapshots.writeVersioned(clustered, snapDir, seq,
      (if (encryptionOn)
        Map("parquet.encryption.uniform.key" -> Encryption.MasterKeyId)
      else Map.empty[String, String]) ++ bloomOptions(t))
    summary("optimize", 0L, seq)
  }

  /** DIFF TABLE: the NET row delta between the collapsed states at two
    * sequences — each pk classified added / removed / modified (full
    * row carried from the newer state; removed rows carry their
    * FROM-state image — what the older state held is what vanished).
    * One full-outer join of two snapshot-accelerated
    * collapses; a pk whose row churned and returned identical shows NO
    * change, which is exactly what the event feed (FOR SYSTEM_TIME
    * BETWEEN) cannot say without replaying the fold. Both reads
    * respect RLS (the session sees only its visible rows' changes). */
  def diff(table: String, fromSeq: Long, toSeq: Long): DataFrame = {
    val t = catalog.require(table)
    checkPrivilege(table, "SELECT")
    val rls = rlsFilter(table, "SELECT")
    def side(seq: Long, prefix: String) = {
      val s0 = stateAt(table, Some(seq))
      rls.fold(s0)(s0.where)
        .select(t.columns.map(c => col(c.logical).as(s"$prefix${c.logical}")): _*)
    }
    val o = side(fromSeq, "_o_")
    val n = side(toSeq, "_n_")
    val oPk = col(s"_o_${t.pk}")
    val nPk = col(s"_n_${t.pk}")
    val oRow = struct(t.columns.map(c => col(s"_o_${c.logical}")): _*)
    val nRow = struct(t.columns.map(c => col(s"_n_${c.logical}")): _*)
    o.join(n, oPk === nPk, "full_outer")
      .withColumn("change",
        when(oPk.isNull, "added")
          .when(nPk.isNull, "removed")
          .when(!(oRow <=> nRow), "modified"))
      .where(col("change").isNotNull)
      .select(col("change") +: t.columns.map(c =>
        coalesce(col(s"_n_${c.logical}"), col(s"_o_${c.logical}"))
          .as(c.logical)): _*)
  }

  /** VACUUM t RETAIN @SEQ:N — physical storage reclamation (the
    * reclamation half of the reference's segment compaction,
    * engine.rs:739-845). Ensures a snapshot at or before N exists
    * (taking one at N if not), deletes every log file whose max
    * sequence the snapshot covers, deletes snapshots older than the
    * one serving the floor, and records the retention floor: time
    * travel below it raises instead of silently returning partial
    * state. At 100 TB this is the operation that keeps an append-only
    * log's storage bounded — the collapse replay cost was already
    * bounded by snapshots; this bounds the bytes. Files spanning the
    * floor (min <= floor < max) are kept whole: the tail filter
    * already prunes their pre-floor events by the sequence predicate. */
  def vacuumRetain(table: String, retainSeq: Long): DataFrame = {
    // physically destroys shared history below the floor — destructive
    // admin surface, same gate class as DROP TABLE / RESTORE
    requirePerm("VACUUM RETAIN", "COMPACT") // admin carries CompactDatabase
    val t = catalog.require(table)
    require(t.attached.isEmpty, s"cannot vacuum attached event log: $table")
    val snapDir = catalog.snapshotPath(table)
    val floor = Snapshots.nearest(spark, snapDir, Some(retainSeq)).getOrElse {
      snapshot(table, atSeq = Some(retainSeq))
      retainSeq
    }
    val logP = new Path(logDir(table))
    val fs = logP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var deleted = 0L
    if (fs.exists(logP)) {
      // one pass over the log's (file -> max sequence) — vacuum is
      // rare, and parquet reads only the sequence column
      val covered = spark.read.schema(EventLog.schema(t.payloadSchema))
        .parquet(logP.toString)
        .groupBy(input_file_name().as("_f"))
        .agg(max("sequence").as("_mx"))
        .where(col("_mx") <= floor)
        .collect().map(_.getString(0))
      for (uri <- covered) {
        val p = new Path(new java.net.URI(uri))
        if (fs.delete(p, false)) deleted += 1
      }
    }
    // snapshots strictly below the floor can no longer serve any
    // readable as-of — reclaim them too
    for (s <- Snapshots.available(spark, snapDir) if s < floor)
      Snapshots.delete(spark, snapDir, s)
    catalog.setRetentionFloor(table, floor)
    lastSnapSeqs(table) = math.max(lastSnapSeqs.getOrElse(table, 0L), floor)
    summary("vacuumed", deleted, floor)
  }

  /** JSONL bulk ingest (driftdb-cli main.rs:40-50): columns matched by
    * name, missing ones NULL. */
  def ingestJsonl(table: String, path: String): DataFrame =
    ingestFile(table, path, "jsonl")

  private def inferCopyFormat(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".parquet") || p.endsWith(".pq")) "parquet"
    else if (p.endsWith(".csv")) "csv"
    else "jsonl"
  }

  /** Bulk ingest with format selection — JSONL for reference parity,
    * parquet and header CSV as the Spark-native additions (a real
    * 100 TB load arrives as parquet; every column casts to the
    * catalog's declared type, so CSV's all-string read types up
    * correctly). */
  def ingestFile(table: String, path: String, format: String): DataFrame = {
    // gate BEFORE touching the file: JSON schema inference scans the
    // whole input, so an ungranted session (or a typo'd table) must be
    // rejected with zero I/O, not after a full-file read
    catalog.require(table)
    checkPrivilege(table, "INSERT")
    val raw = format match {
      case "jsonl" | "json" => spark.read.json(path)
      case "parquet" => spark.read.parquet(path)
      // RFC-4180 CSV: quote-doubling escapes and quoted fields may
      // span lines (the wire COPY spool emits exactly that shape) —
      // multiLine costs per-file splittability, which bulk COPY
      // accepts for correctness on embedded newlines
      case "csv" => spark.read.option("header", "true")
        .option("multiLine", "true").option("escape", "\"").csv(path)
      case other => throw new IllegalArgumentException(
        s"unsupported COPY format: $other (JSONL | PARQUET | CSV)")
    }
    ingestFrame(table, raw)
  }

  /** `ingestFrame` under `session`'s security context — the governed
    * write surface of the `graft` data source
    * (`df.write.format("graft").option("user", u)`): the privilege
    * gate and write-side RLS policies see the session, not root. */
  def ingestFrameAs(session: Session, table: String, df: DataFrame): DataFrame =
    writeLock.synchronized {
      val prev = current
      current = session
      try ingestFrame(table, df)
      finally current = prev
    }

  /** Bulk-append an arbitrary DataFrame — the shared tail of COPY FROM
    * and the `graft` data-source write path (`df.write.format("graft")`).
    * Columns match the catalog by name (missing → DEFAULT, else NULL)
    * and cast to declared types. */
  def ingestFrame(table: String, raw: DataFrame): DataFrame = {
    val t = catalog.require(table)
    // governed like INSERT (it IS a bulk insert): the privilege gate
    // and the write-side RLS policies both apply — without them an
    // ungranted session could bulk-load, and an RLS-restricted session
    // could land rows its WITH CHECK vetoes
    checkPrivilege(table, "INSERT")
    val defaults = defaultsOf(table)
    val full0 = raw.select(t.columns.map(c =>
      if (raw.columns.contains(c.logical)) col(c.logical).cast(c.dataType).as(c.logical)
      else expr(defaults.getOrElse(c.logical, "NULL"))
        .cast(c.dataType).as(c.logical)): _*)
    val (full, fCounts) = pinCheckpointCounted(full0)
    fireTriggers(table, "INSERT", "BEFORE", None, Some(full))
    val (n, last) = append(t, full, EventLog.INSERT, prePinned = true,
      probes = () => constraintViolations(t, full, stateAt(table, None), None) ++
        fkOutgoingProbes(t, full) ++ rlsCheckProbes(table, full, "INSERT"),
      pinnedCounts = Some(fCounts))
    fireTriggers(table, "INSERT", "AFTER", None, Some(full))
    summary("ingest", n, last)
  }

  /** One micro-batch from a streaming source (graft.streaming
    * .StreamIngest): columns matched by name like JSONL ingest, missing
    * ones NULL, appended as INSERT events. PK/FK guards are skipped —
    * a stream is bulk ingestion (see enforcePkUniqueness) and guard
    * jobs per micro-batch would double its latency. Runs on the
    * streaming thread: the write lock serializes it against SQL
    * statements, and `direct = true` keeps the batch out of any open
    * transaction's buffer (a ROLLBACK must never drop streamed rows —
    * the txn's provisional sequences re-shift at COMMIT instead). */
  private[graft] def ingestStream(table: String, batch: DataFrame): Unit =
    ingestStream(table, batch, None, -1L)

  /** Exactly-once variant: `streamId` (the stream's checkpoint
    * location) + `batchId` identify a micro-batch. The id commits in
    * the SAME manifest as the batch's events, so a restart that replays
    * a committed batch (Spark only guarantees at-least-once delivery to
    * foreachBatch) is detected here and skipped — the Delta-commit
    * idempotent-sink pattern. */
  private[graft] def ingestStream(table: String, batch: DataFrame,
      streamId: Option[String], batchId: Long): Unit =
    writeLock.synchronized {
      ensureWriteLock()
      // a batch id can be durably recorded with its files stranded in
      // staging (publish fault mid-batch, then Spark restarts the query
      // IN-PROCESS, so no engine reopen runs recovery) — roll any
      // committed manifest forward before the replay-skip decision, or
      // the skip would hide those events until the next reopen. One
      // listStatus per micro-batch; we hold the lock, so it's safe.
      if (streamId.isDefined) sweepStaging()
      val committed = streamId.flatMap(catalog.lastStreamBatch)
      if (streamId.isDefined && committed.exists(_ >= batchId)) return
      tracer.statement(s"INGEST STREAM $table batch=$batchId") {
        val t = catalog.require(table)
        val full = batch.select(t.columns.map(c =>
          if (batch.columns.contains(c.logical)) col(c.logical).cast(c.dataType).as(c.logical)
          else lit(null).cast(c.dataType).as(c.logical)): _*)
        append(t, full, EventLog.INSERT, direct = true,
          streamMeta = streamId.map(_ -> batchId))
        ()
      }
      // streaming batches keep AUTOREFRESH views fresh too — the
      // continuous always-fresh-dashboard shape (replayed/skipped
      // batches advanced nothing, so the due check no-ops above)
      maybeAutoRefresh()
    }

  /** Physical-cast, sequence-assign, and event-shape one INSERT batch
    * — the body `append` applies, shared with the multi-table
    * streaming-dedup publish. Returns (events, new last sequence). */
  private def insertEventFrame(t: TableDef, rowsLogical: DataFrame,
      base: Long, prePinned: Boolean = false): (DataFrame, Long) = {
    val physical = rowsLogical.select(t.columns.map(c =>
      col(c.logical).cast(c.dataType).as(c.physical)): _*)
    // prePinned: the caller's frame is a pinned checkpoint or a narrow
    // derivation of one — partition layout is already deterministic and
    // nothing re-reads the log being appended to, so a second
    // materialized copy would be pure waste
    val (withSeq, n) = EventLog.assignSequencesCounted(
      if (prePinned) physical else pinCheckpoint(physical), base)
    val ev0 = withSeq.select(
      col("sequence"),
      timestamp_seconds(lit(EventLog.ClockEpoch) + col("sequence")).as("ts"),
      lit(EventLog.INSERT).as("event_type"),
      col(t.pkPhysical).cast("string").as("pk"),
      struct(t.columns.map(c => col(c.physical)): _*).as("payload"))
    // same small-batch single-file discipline as append()
    val ev = if (n <= EventLog.SmallBatchRows) ev0.coalesce(1) else ev0
    (ev, base + n)
  }

  /** Exactly-once streaming ingest with EXACT DEDUP against a
    * persistent fingerprint registry table — the continuous-ingest
    * complement of the batch dedup operators
    * (graft.streaming.StreamingDedup): new shards admit only
    * never-seen documents without ever re-scanning the corpus. Per
    * micro-batch:
    *   1. fingerprint each row; the lowest-pk row per fingerprint
    *      wins inside the batch;
    *   2. probe the registry's collapsed state for already-seen
    *      fingerprints — small batches inline their fingerprint list
    *      so the (bloom-indexable) registry scan prunes to the probed
    *      row groups, the FK-probe discipline; past the cap the
    *      anti-join shape stands on its own;
    *   3. land the admitted rows AND their fingerprints in ONE atomic
    *      publish carrying the micro-batch id — a crash replay skips
    *      whole, so a document can neither duplicate nor vanish, and
    *      the registry can never drift from the table it guards.
    * The registry's primary key holds the fingerprint; its other
    * columns fill from same-named batch columns (NULL otherwise). */
  private[graft] def ingestStreamDeduped(table: String, registry: String,
      batch: DataFrame, fingerprint: Column,
      streamId: Option[String], batchId: Long): Unit =
    writeLock.synchronized {
      ensureWriteLock()
      if (streamId.isDefined) sweepStaging() // see ingestStream
      val committed = streamId.flatMap(catalog.lastStreamBatch)
      if (streamId.isDefined && committed.exists(_ >= batchId)) return
      tracer.statement(s"INGEST DEDUP $table batch=$batchId") {
      val t = catalog.require(table)
      val r = catalog.require(registry)
      val full = batch.select(t.columns.map(c =>
          if (batch.columns.contains(c.logical))
            col(c.logical).cast(c.dataType).as(c.logical)
          else lit(null).cast(c.dataType).as(c.logical)): _*)
        .withColumn("__fp", fingerprint)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__fp")).orderBy(col(t.pk))
      // firsts is one row per DISTINCT fingerprint, so its pin-job row
      // count bounds the probe's key set EXACTLY: past InlineKeyCap
      // the inline collect MUST overflow — skip its two probe jobs
      // and take the unfiltered registry anti-join directly (round 19)
      val (firsts, nFirsts) = pinCheckpointRows(
        full.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn"))
      val seen = (if (nFirsts > InlineKeyCap) stateAt(r.name, None)
          else inlineKeyFilter(stateAt(r.name, None), r.pk, firsts, "__fp"))
        .select(col(r.pk).cast("string").as("__seen_fp"))
      val admitted = pinCheckpoint(firsts
        .join(seen, col("__fp") === col("__seen_fp"), "left_anti"))
      val (evT, hiT) = insertEventFrame(t, admitted.drop("__fp"),
        catalog.lastSeq(t.name), prePinned = true)
      val regRows = admitted.select(r.columns.map(c =>
        if (c.logical == r.pk) col("__fp").cast(c.dataType).as(c.logical)
        else if (admitted.columns.contains(c.logical))
          col(c.logical).cast(c.dataType).as(c.logical)
        else lit(null).cast(c.dataType).as(c.logical)): _*)
      val (evR, hiR) = insertEventFrame(r, regRows, catalog.lastSeq(r.name),
        prePinned = true)
      // an all-duplicates batch still publishes when a batch id must be
      // recorded; without one there is nothing to make durable
      if (hiT == catalog.lastSeq(t.name) && hiR == catalog.lastSeq(r.name) &&
        streamId.isEmpty) return
      publishAtomic(Seq((t.name, evT), (r.name, evR)),
        Map(t.name -> hiT, r.name -> hiR), streamId.map(_ -> batchId),
        // the REGISTRY's pk (the fingerprint) is unique by construction
        // — one row per fp inside the batch, anti-joined against every
        // seen fp — so it keeps its flat-log certificate; the TABLE's
        // pk was never probed (two different-fingerprint rows may share
        // a pk), so it revokes
        mutated = Set(t.name))
      maybeAutoSnapshot(t.name, hiT)
      maybeAutoSnapshot(r.name, hiR)
      }
      maybeAutoRefresh() // see ingestStream
    }

  /** Exactly-once streaming ingest with NEAR-dup dedup against a
    * persistent shingle inverted-index registry — the continuous form
    * of `Dedup.shingleJaccardPairs` (the batch operator family): new
    * shards admit only documents that are not near-duplicates of
    * anything already seen, without ever re-scanning the corpus.
    *
    * Policy ("seen semantics"): a document is DROPPED iff some SEEN
    * document — any earlier batch's doc, or an earlier-pk row of its
    * own batch — shares >= `minJaccard` shingle-set Jaccard overlap
    * with it. Seen means seen, admitted or not: comparing against all
    * prior documents (rather than only admitted ones) makes the result
    * independent of drop chains, so the final state is reproducible in
    * PLAIN SQL — a doc survives iff no smaller-id doc in the whole
    * corpus clears the threshold — which is exactly what the
    * q_stream_neardup oracle computes. It is also the conservative
    * policy a curation pipeline wants: "similar to anything we have
    * seen" is a stronger dedup than "similar to something we kept".
    *
    * Registry index table (caller creates): a string PRIMARY KEY
    * (filled with tok + '#' + doc id) plus columns `tok` STRING,
    * `doc_id` BIGINT, `n` BIGINT (the doc's shingle count). Every
    * batch appends ALL its docs' postings (seen semantics); probes
    * filter the registry scan with inlined batch tokens when small
    * (bloom-indexable via CREATE INDEX ON (tok)), the FK-probe
    * discipline. `maxDf` drops tokens whose REGISTRY posting list
    * exceeds it — the bucket-size bound of the batch operators; pass
    * Long.MaxValue to disable (the oracle-exact configuration).
    *
    * Per micro-batch: shingle each doc (one scan-stage pass), build
    * within-batch edges (inverted-index self-join, earlier pk wins)
    * and cross edges (probe join against the registry), drop receivers
    * clearing the threshold, then land admitted rows AND all postings
    * in ONE atomic publish carrying the micro-batch id — replayed
    * batches skip whole, so neither table nor registry can drift. */
  private[graft] def ingestStreamNearDedup(table: String, registry: String,
      batch: DataFrame, textCol: Column, shingleN: Int, minJaccard: Double,
      maxDf: Long, streamId: Option[String], batchId: Long,
      requireOrdered: Boolean = true): Unit =
    writeLock.synchronized {
      ensureWriteLock()
      if (streamId.isDefined) sweepStaging() // see ingestStream
      val committed = streamId.flatMap(catalog.lastStreamBatch)
      if (streamId.isDefined && committed.exists(_ >= batchId)) return
      tracer.statement(s"INGEST NEARDUP $table batch=$batchId") {
      val t = catalog.require(table)
      val r = catalog.require(registry)
      val shaped = batch.select(t.columns.map(c =>
          if (batch.columns.contains(c.logical))
            col(c.logical).cast(c.dataType).as(c.logical)
          else lit(null).cast(c.dataType).as(c.logical)): _*)
        .withColumn("__sh",
          graft.operators.Dedup.shingleSet(textCol, shingleN))
      // total posting count rides the pin job (round 19): it bounds
      // the batch's distinct-token count from above, which decides
      // below whether the registry probe's inline-key collect can
      // possibly fit the cap — past it, the two probe jobs ALWAYS
      // overflowed and were pure waste on every realistic batch
      val (full, postings) = pinCheckpointSized(shaped,
        shaped.schema.fieldIndex("__sh"))
      // the seen-before-wins policy equals the SQL "no smaller-id doc
      // clears the threshold" semantics ONLY when batches arrive in
      // ascending pk ranges — cross-batch drops are temporal (registry
      // doc wins regardless of id), so an out-of-order id would
      // silently invert who survives. Enforce the precondition rather
      // than let the advertised semantics drift; pipelines that want
      // pure arrival-order (temporal) semantics opt out with
      // requireOrdered = false, accepting that the result then depends
      // on delivery order, not ids.
      // the metadata watermark stores a Long, so only INTEGRAL pks use
      // the fast guard; other orderable pk types keep the
      // content-derived guard (correct, one registry aggregate per
      // batch — a cast-to-long "guard" would silently null out and
      // never fire, the quiet corruption this check exists to prevent)
      val pkIntegral = t.columns.find(_.logical == t.pk)
        .exists(_.dataType match {
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.ByteType => true
          case _ => false
        })
      // one batch-sized job over the pinned checkpoint: min drives the
      // ordered guard, max becomes the registry's new watermark, and
      // total-vs-distinct pk counts certify within-batch uniqueness
      // (above-watermark + distinct-in-batch = the whole log stays
      // unique-pk INSERTs, so both tables keep their flat-log
      // certificate and reads skip the keyed collapse).
      // ASYNC on the probe pool (round 19, guide §2.6): nothing before
      // publishAtomic has a side effect, so the guard aggregate need
      // not serialize ahead of the batch's dedup-join materialization
      // — it overlaps the admitted-pin job and joins (surfacing any
      // ordering violation) before the event frames are built.
      val guardJoin: () => (Boolean, Option[Long]) = asyncTask {
        if (pkIntegral) {
          val bounds = full.agg(min(col(t.pk)).cast("long"),
            max(col(t.pk)).cast("long"),
            count(lit(1)), countDistinct(col(t.pk))).head()
          val unique = bounds.getLong(2) == bounds.getLong(3)
          val batchMin =
            if (bounds.isNullAt(0)) None else Some(bounds.getLong(0))
          if (requireOrdered) {
            // the guard is a CATALOG-METADATA compare — the registry
            // is never collapsed per batch. The watermark (max pk ever
            // admitted) commits in the same atomic manifest as the
            // postings, so it can never lag registry content.
            // Registries filled before the watermark existed fall back
            // to ONE registry aggregate; the first publish records it.
            val regMax = catalog.watermark(r.name).orElse {
              val m = stateAt(r.name, None)
                .agg(max(col("doc_id")).cast("long")).head()
              if (m.isNullAt(0)) None else Some(m.getLong(0))
            }
            for (rm <- regMax; bm <- batchMin)
              if (bm <= rm) throw new IllegalArgumentException(
                s"ingestStreamNearDedup: batch contains pk <= the registry's " +
                  s"max doc_id ($rm) — batches must arrive in " +
                  "ascending pk ranges for id-order semantics, or pass " +
                  "requireOrdered = false for arrival-order semantics")
          }
          (unique, if (bounds.isNullAt(1)) None else Some(bounds.getLong(1)))
        } else {
          if (requireOrdered) {
            // content-derived guard for non-integral pks (native ordering)
            val regMax = stateAt(r.name, None).agg(max(col("doc_id"))).head()
            if (!regMax.isNullAt(0) &&
                full.where(col(t.pk) <= lit(regMax.get(0))).limit(1).count() > 0)
              throw new IllegalArgumentException(
                s"ingestStreamNearDedup: batch contains pk <= the registry's " +
                  s"max doc_id (${regMax.get(0)}) — batches must arrive in " +
                  "ascending pk ranges for id-order semantics, or pass " +
                  "requireOrdered = false for arrival-order semantics")
          }
          (false, None)
        }
      }
      // shingle-set size rides every posting row (scan-stage, computed
      // before the explode) so no edge aggregation ever joins back to a
      // separate sizes table — four shuffle joins per micro-batch fold
      // into the token explode itself
      val toks = full.select(col(t.pk).as("__id"),
        size(col("__sh")).cast("long").as("__n"), explode(col("__sh")).as("__tok"))
      def jacc(i: Column, en: Column, dn: Column): Column =
        i.cast("double") / (en + dn - i)
      // within-batch edges: inverted-index self-join, earlier pk wins;
      // __n is functionally dependent on the grouped doc ids, so max()
      // just carries it through
      val wiDrop = toks.as("a")
        .join(toks.as("b"),
          col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
        .groupBy(col("a.__id").as("__e"), col("b.__id").as("__d"))
        .agg(count(lit(1)).as("__i"), max(col("a.__n")).as("__en"),
          max(col("b.__n")).as("__dn"))
        .where(jacc(col("__i"), col("__en"), col("__dn")) >= minJaccard)
        .select(col("__d"))
      // cross edges: probe the registry's postings for batch tokens.
      // The inline probe only applies when the batch's distinct-token
      // count fits InlineKeyCap; `postings` (measured in the pin job)
      // bounds it from above, so a batch past the cap skips the probe
      // jobs outright instead of paying two guaranteed overflows. A
      // batch whose >cap postings collapse to <=cap distinct tokens
      // (an all-duplicates shard) loses only the scan pruning, never
      // correctness — the unfiltered registry join is the same
      // fallback an overflowed probe took.
      val probed0 =
        if (postings > InlineKeyCap) stateAt(r.name, None)
        else inlineKeyFilter(stateAt(r.name, None), "tok", toks, "__tok")
      val probed =
        if (maxDf == Long.MaxValue) probed0
        else probed0.join(
          probed0.groupBy("tok").agg(count(lit(1)).as("__df"))
            .where(col("__df") > maxDf).select(col("tok").as("__hot")),
          col("tok") === col("__hot"), "left_anti")
      val crDrop = toks.join(probed, col("__tok") === col("tok"))
        .groupBy(col("doc_id").as("__e"), col("__id").as("__d"))
        .agg(count(lit(1)).as("__i"), first(col("n")).as("__en"),
          max(col("__n")).as("__dn"))
        .where(jacc(col("__i"), col("__en"), col("__dn")) >= minJaccard)
        .select(col("__d"))
      val dropped = wiDrop.union(crDrop).distinct()
        .select(col("__d").as("__dropped"))
      val admitted = pinCheckpoint(full
        .join(dropped, col(t.pk) === col("__dropped"), "left_anti")
        .drop("__sh"))
      // join the overlapped guard before any event frame exists — an
      // ordering violation must surface exactly as it did serially
      val (batchPkUnique, batchMax) = guardJoin()
      val (evT, hiT) = insertEventFrame(t, admitted, catalog.lastSeq(t.name),
        prePinned = true)
      // ALL batch docs' postings land in the registry (seen semantics);
      // toks already carries __n, and is a narrow re-read of the pinned
      // batch — no checkpoint copy, no join
      val regRows = toks.select(r.columns.map(c =>
        if (c.logical == r.pk)
          concat(col("__tok"), lit("#"), col("__id")).cast(c.dataType).as(c.logical)
        else c.logical match {
          case "tok" => col("__tok").cast(c.dataType).as("tok")
          case "doc_id" => col("__id").cast(c.dataType).as("doc_id")
          case "n" => col("__n").cast(c.dataType).as("n")
          case other => lit(null).cast(c.dataType).as(other)
        }): _*)
      val (evR, hiR) = insertEventFrame(r, regRows, catalog.lastSeq(r.name),
        prePinned = true)
      if (hiT == catalog.lastSeq(t.name) && hiR == catalog.lastSeq(r.name) &&
        streamId.isEmpty) return
      // a batch of shingle-less docs advances only the table; skip the
      // registry's empty event frame rather than landing a 0-row part
      val parts = Seq(t.name -> evT, r.name -> evR).zip(Seq(
        hiT != catalog.lastSeq(t.name), hiR != catalog.lastSeq(r.name)))
        .collect { case (p, true) => p }
      publishAtomic(parts, Map(t.name -> hiT, r.name -> hiR),
        streamId.map(_ -> batchId),
        marks = batchMax.map(r.name -> _).toMap,
        // certified: every table pk is distinct within the batch and
        // above the registry watermark, and every registry pk embeds a
        // batch doc id (tok#id, shingles pre-distinct per doc) — both
        // logs stay unique-pk INSERT-only, so reads keep the flat scan.
        // Arrival-order mode (requireOrdered=false) or duplicate ids in
        // a batch revoke: id reuse across batches would collide pks.
        mutated = if (requireOrdered && batchPkUnique) Set.empty
          else Set(t.name, r.name))
      maybeAutoSnapshot(t.name, hiT)
      maybeAutoSnapshot(r.name, hiR)
      }
      maybeAutoRefresh() // see ingestStream
    }

  /** Apply one replicated micro-batch of RAW events (the primary's
    * event frame, verbatim — sequence/ts/event_type/pk/payload) into
    * this engine's log (graft.streaming.Replication). Unlike
    * ingestStream, sequences are PRESERVED, not assigned: the replica
    * must serve the primary's exact temporal history, so the counter
    * advances to the batch's max sequence (max-merged — it never
    * regresses). Exactly-once: the batch id commits in the same atomic
    * manifest as the events. */
  private[graft] def applyReplicated(table: String, batch: DataFrame,
      streamId: String, batchId: Long): Unit =
    writeLock.synchronized {
      ensureWriteLock()
      sweepStaging() // roll a stranded prior publish forward (see ingestStream)
      val committed = catalog.lastStreamBatch(streamId)
      if (committed.exists(_ >= batchId)) return
      val t = catalog.require(table)
      require(t.attached.isEmpty, s"cannot replicate into attached table $table")
      val pinned = pinCheckpoint(batch)
      val mx = pinned.agg(max(col("sequence"))).head()
      val hi =
        if (mx.isNullAt(0)) catalog.lastSeq(t.name) // empty batch: record the id only
        else math.max(mx.getLong(0), catalog.lastSeq(t.name))
      publishAtomic(Seq((t.name, pinned)), Map(t.name -> hi),
        Some(streamId -> batchId),
        // raw replicated frames carry whatever event types the primary
        // landed — the replica cannot certify anything about them
        mutated = Set(t.name))
    }

  // ========================================================== utilities

  /** EXPLAIN <query>: the formatted Catalyst plan (sql_bridge.rs:
    * 580-670 renders its own plan tree; ours is the real physical
    * plan, PushedFilters and all). EXPLAIN ANALYZE additionally
    * executes the query and reports wall time and row count, like the
    * reference's timed variant (explain.rs, sql_bridge.rs:580-670). */
  def explain(inner: String, analyze: Boolean = false,
      format: String = "text"): DataFrame = {
    val df = select(inner)
    // FORMAT JSON serializes the physical plan tree (every operator
    // node with its fields) — the reference's structured explain
    // (explain.rs, sql_bridge.rs:580-670); FORMAT YAML emits the same
    // tree as a node/detail/children document (explain.rs supports
    // both); TEXT keeps the formatted human-readable plan with
    // PushedFilters et al.
    val text = format match {
      case "json" => df.queryExecution.executedPlan.toJSON
      case "yaml" =>
        // AQE's root keeps the real plan in inputPlan, not children —
        // unwrap so the YAML tree shows the operators
        df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            planYaml(a.inputPlan, "")
          case p => planYaml(p, "")
        }
      case _ => df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }
    if (analyze) {
      // execute the PLAN BEING SHOWN: df.count() would let Catalyst
      // prune projections/sorts and time a cheaper query than the one
      // printed; running the compiled physical plan's RDD keeps them
      // identical
      val t0 = System.nanoTime()
      val n = df.queryExecution.executedPlan.execute().count()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      spark.range(1).select(lit(text).as("plan"), lit(n).as("n_rows"),
        lit(elapsedMs).as("elapsed_ms"))
    } else spark.range(1).select(lit(text).as("plan"))
  }

  /** Physical plan tree → YAML: one `- node/detail/children` mapping
    * per operator, details double-quoted with escapes. */
  private def planYaml(p: org.apache.spark.sql.execution.SparkPlan,
      indent: String): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val head = s"$indent- node: ${p.nodeName}\n" +
      s"$indent  detail: ${q(p.simpleString(120))}\n"
    if (p.children.isEmpty) head
    else head + s"$indent  children:\n" +
      p.children.map(planYaml(_, indent + "    ")).mkString
  }

  /** ANALYZE TABLE: row count + per-column ndv/min/max, stored for
    * inspection (sql_bridge.rs:671-700; engine.rs:1422). In a cluster
    * deployment these land in the metastore for CBO; here they feed
    * the catalog's stats map. */
  def analyze(table: String): DataFrame = {
    val t = catalog.require(table)
    val state = stateAt(table, None)
    // the numeric columns' histogram BOUNDS ride the same aggregation
    // (as doubles) so the whole ANALYZE is the base stats job plus ONE
    // bucket-counts job — no separate bounds pass
    val numeric = t.columns.filter(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val aggs = t.columns.flatMap(c => Seq(
      count(col(c.logical)).as(s"nn_${c.logical}"),
      approx_count_distinct(col(c.logical)).as(s"ndv_${c.logical}"),
      min(col(c.logical)).cast("string").as(s"min_${c.logical}"),
      max(col(c.logical)).cast("string").as(s"max_${c.logical}"))) ++
      numeric.flatMap(c => Seq(
        min(col(c.logical)).cast("double").as(s"lo_${c.logical}"),
        max(col(c.logical)).cast("double").as(s"hi_${c.logical}")))
    val row = state.agg(count(lit(1)).as("n_rows"), aggs: _*).head()
    val nRows = row.getAs[Long]("n_rows")
    catalog.stats(table) = row.schema.fieldNames
      .map(f => f -> Option(row.getAs[Any](f)).map(_.toString).orNull).toMap
    catalog.colStats(table) = t.columns.map { c =>
      c.logical -> graft.catalog.TableCatalog.ColStat(
        nullCount = nRows - row.getAs[Long](s"nn_${c.logical}"),
        ndv = row.getAs[Long](s"ndv_${c.logical}"),
        min = row.getAs[String](s"min_${c.logical}"),
        max = row.getAs[String](s"max_${c.logical}"))
    }.toMap
    analyzeHistograms(table, state, nRows, row)
    spark.range(1).select(lit(table).as("table"),
      lit(nRows).as("n_rows"))
  }

  /** Equi-width 10-bucket histograms for every numeric column
    * (stats.rs histogram shape), in ONE aggregation job: each bucket
    * count is a conditional sum, so the whole pass is a global partial
    * aggregate over the scan — no shuffle of data rows, no per-column
    * jobs. The bucket BOUNDS arrive with ANALYZE's base stats row
    * (`bounds`), so no separate min/max pass runs either. Bucket
    * arithmetic is plain IEEE `(x−lo)/(hi−lo)·B` floored and clamped,
    * so any engine reproduces the counts exactly. */
  private def analyzeHistograms(table: String, state: DataFrame,
      nRows: Long, bounds: org.apache.spark.sql.Row): Unit = {
    import org.apache.spark.sql.types.NumericType
    val t = catalog.require(table)
    val numeric = t.columns.filter(_.dataType.isInstanceOf[NumericType])
    catalog.histograms.filterInPlace { case ((tn, _), _) => tn != table }
    if (numeric.isEmpty || nRows == 0) return
    val B = 10
    val counts = state.agg(count(lit(1)).as("_n"),
      numeric.flatMap { c =>
        val lo = bounds.getAs[Double](s"lo_${c.logical}")
        val hi = bounds.getAs[Double](s"hi_${c.logical}")
        val x = col(c.logical).cast("double")
        // `least` skips nulls (SQL semantics), so guard: a null value
        // must produce a null bucket, not land in the last one
        val bucket =
          if (hi == lo) when(x.isNotNull, lit(0))
          else when(x.isNotNull, least(lit(B - 1),
            floor((x - lit(lo)) / (lit(hi) - lit(lo)) * lit(B))))
        (0 until B).map(b =>
          sum(when(bucket === b, 1L).otherwise(0L)).as(s"b${b}_${c.logical}"))
      }: _*).head()
    numeric.foreach { c =>
      val lo = bounds.getAs[Double](s"lo_${c.logical}")
      val hi = bounds.getAs[Double](s"hi_${c.logical}")
      val width = (hi - lo) / B
      catalog.histograms((table, c.logical)) = (0 until B).map { b =>
        (lo + b * width, if (b == B - 1) hi else lo + (b + 1) * width,
          counts.getAs[Long](s"b${b}_${c.logical}"))
      }
    }
  }

  /** SHOW STATS FOR t — the per-column ANALYZE detail
    * (stats.rs:1-60: cardinality, null counts, min/max). Computes on
    * demand when the table was never analyzed; a later ANALYZE
    * refreshes. Gated on the SELECT privilege — min/max are data. */
  def showStats(table: String): DataFrame = {
    checkPrivilege(table, "SELECT")
    if (!catalog.colStats.contains(table)) analyze(table)
    val nRows = catalog.stats(table)("n_rows").toLong
    val rows = catalog.colStats(table).toSeq.sortBy(_._1).map {
      case (c, s) => (c, nRows, s.nullCount, s.ndv, s.min, s.max)
    }
    import spark.implicits._
    rows.toDF("col_name", "n_rows", "null_count", "ndv", "min", "max")
  }

  /** SHOW HISTOGRAM t col — the stored equi-width bucket counts for a
    * numeric column. Same governance and compute-on-demand discipline
    * as SHOW STATS. */
  def showHistogram(table: String, column: String): DataFrame = {
    checkPrivilege(table, "SELECT")
    if (!catalog.colStats.contains(table)) analyze(table)
    val t = catalog.require(table)
    require(t.columns.exists(_.logical == column),
      s"requirement failed: no column $column in $table")
    val buckets = catalog.histograms.getOrElse((table, column),
      throw new IllegalArgumentException(
        s"requirement failed: no histogram for $table.$column (non-numeric or empty table)"))
    import spark.implicits._
    buckets.zipWithIndex
      .map { case ((lo, hi, n), b) => (b.toLong, lo, hi, n) }
      .toDF("bucket", "lo", "hi", "n")
  }

  // ========================================================= integrity

  /** Audit one parquet path for end-to-end readability: Right(rows,
    * sequence range) or Left(failure). One bounded Spark job — footer
    * corruption fails at planning, page corruption fails in the scan.
    * The per-row hash over EVERY column forces full page decode: a
    * pruned count would be answered from row-group metadata and never
    * touch a corrupt payload page. (Silent in-place bit flips that
    * still decode are content faults, not readability faults — CHECK
    * FULL's checkpoint-vs-log compare is the detector for those.) */
  private def auditParquet(path: String,
      schema: org.apache.spark.sql.types.StructType)
      : Either[String, (Long, Option[(Long, Long)])] =
    try {
      val df = spark.read.schema(schema).parquet(path)
      val r = df
        .select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"),
          col("sequence"))
        .agg(count(lit(1)), min(col("sequence")), max(col("sequence")),
          expr("bit_xor(__h)")).head()
      Right((r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
    } catch { case e: Exception => Left(errLine(e)) }

  private def auditFrame(df: => DataFrame): Either[String, Long] =
    try {
      val d = df
      Right(d.select(xxhash64(d.columns.map(col).toIndexedSeq: _*).as("__h"))
        .agg(count(lit(1)), expr("bit_xor(__h)")).head().getLong(0))
    } catch { case e: Exception => Left(errLine(e)) }

  private def errLine(e: Exception): String =
    Option(e.getMessage).getOrElse(e.getClass.getName)
      .replaceAll("\\s+", " ").take(160)

  private def tableLogFiles(t: TableDef): Seq[Path] = {
    val p = new Path(logDir(t.name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
  }

  /** Missing sequences among `files` against the expected contiguous
    * range (floor, lastSeq]: (count, max missing). ONE distributed
    * anti-join of the expected range against the present sequences —
    * no driver-side materialization of either set. */
  private def missingSeqs(files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      floor: Long, lastSeq: Long): (Long, Long) = {
    val present =
      if (files.isEmpty)
        spark.range(0).select(col("id").as("sequence"))
      else spark.read.schema(schema).parquet(files: _*).select(col("sequence"))
    val r = spark.range(floor + 1, lastSeq + 1).toDF("sequence")
      .join(present, Seq("sequence"), "left_anti")
      .agg(count(lit(1)), max(col("sequence"))).head()
    (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
  }

  /** Order-independent content fingerprint of a frame: (row count,
    * bit_xor of per-row xxhash64). */
  private def stateFingerprint(df: DataFrame): (Long, Long) = {
    val hashed = df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"))
    val r = hashed.agg(count(lit(1)), expr("bit_xor(__h)")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** CHECK TABLE t [FULL] — read-only integrity audit (the detection
    * half of the reference's self-healing recovery,
    * error_recovery.rs:395-505, expressed for a parquet event log):
    * one row per finding.
    *  - `log`: every log part file read end-to-end (per-file jobs, so
    *    one corrupt file cannot mask another);
    *  - `sequence`: the readable log must hold exactly the contiguous
    *    range (retention floor, lastSeq] — atomic publish guarantees
    *    it, so a hole means a lost or corrupt file;
    *  - `checkpoint`: every snapshot readable;
    *  - FULL adds `state`: the newest checkpoint's live rows must
    *    fingerprint-equal the log's own collapse at the same sequence
    *    (skipped — reported as SKIPPED — when the log is itself
    *    incomplete, corrupt, or vacuumed below the checkpoint). */
  def checkTable(table: String, full: Boolean = false): DataFrame = {
    checkPrivilege(table, "SELECT")
    val t = catalog.require(table)
    require(t.attached.isEmpty, s"cannot check attached event log: $table")
    val evSchema = EventLog.schema(t.payloadSchema)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String)]
    val readable = scala.collection.mutable.ArrayBuffer.empty[String]
    var logCorrupt = false
    val files = tableLogFiles(t)
    // happy path: ONE distributed read over the whole log dir; only a
    // failure falls back to per-file isolation jobs (so a clean 100 TB
    // log costs one scan, not one job per file)
    val wholeOk = files.nonEmpty &&
      auditParquet(logDir(t.name), evSchema).isRight
    if (wholeOk) {
      readable ++= files.map(_.toString)
      out += (("log", s"${files.size} file(s)", "OK", "whole-dir read"))
    } else for (p <- files) auditParquet(p.toString, evSchema) match {
      case Right((n, seqs)) =>
        readable += p.toString
        out += (("log", p.getName, "OK",
          s"rows=$n" + seqs.fold("")(s => s" seq=[${s._1},${s._2}]")))
      case Left(err) =>
        logCorrupt = true
        out += (("log", p.getName, "CORRUPT", err))
    }
    val floor = catalog.retentionFloor(t.name)
    val lastSeq = catalog.lastSeq(t.name)
    var holes = 0L
    if (lastSeq > floor) {
      val (missing, maxMissing) =
        missingSeqs(readable.toSeq, evSchema, floor, lastSeq)
      holes = missing
      out += (("sequence", t.name, if (missing == 0) "OK" else "HOLES",
        s"expected=($floor,$lastSeq] missing=$missing" +
          (if (missing > 0) s" max_missing=$maxMissing" else "")))
    }
    val snapDir = catalog.snapshotPath(t.name)
    val snaps = Snapshots.available(spark, snapDir)
    for (s <- snaps)
      auditFrame(Snapshots.read(spark, snapDir, s, Some(evSchema))) match {
        case Right(n) => out += (("checkpoint", s"seq=$s", "OK", s"rows=$n"))
        case Left(err) => out += (("checkpoint", s"seq=$s", "CORRUPT", err))
      }
    if (full) snaps.lastOption match {
      case Some(s) if !logCorrupt && holes == 0 && floor == 0 =>
        try {
          val snapState = Snapshots.read(spark, snapDir, s, Some(evSchema))
            .select(t.payloadSchema.fieldNames.toIndexedSeq
              .map(f => col(s"payload.`$f`").as(f)): _*)
          // collapse the RAW log (not stateAt — that would serve the
          // very checkpoint under audit) at the checkpoint's sequence
          val logState = StateView.stateAtKeyed(
            spark.read.schema(evSchema).parquet(logDir(t.name)),
            Some(s), t.pkPhysical)
          val (sn, sh) = stateFingerprint(snapState)
          val (ln, lh) = stateFingerprint(logState)
          out += (("state", s"seq=$s",
            if (sn == ln && sh == lh) "CONSISTENT" else "DIVERGED",
            s"checkpoint rows=$sn log rows=$ln"))
        } catch { case e: Exception =>
          out += (("state", s"seq=$s", "CORRUPT", errLine(e)))
        }
      case Some(s) =>
        out += (("state", s"seq=$s", "SKIPPED",
          "log incomplete, corrupt, or vacuumed — no independent collapse"))
      case None => ()
    }
    import spark.implicits._
    out.toSeq.toDF("component", "target", "status", "detail")
  }

  /** REPAIR TABLE t — act on what CHECK reports (the repair half of
    * the reference's recovery: error_recovery.rs:456-505 truncates a
    * corrupt segment at the corruption point and proceeds with
    * bounded, REPORTED data loss; the parquet-log analogue is
    * file-level):
    *  1. unreadable log files move to `<table>/quarantine/` (kept for
    *     forensics, out of every read path);
    *  2. unreadable checkpoints are dropped;
    *  3. a sequence hole raises the retention floor — to the smallest
    *     readable checkpoint covering the hole when one exists (state
    *     fully preserved, pre-hole history refused), else to the
    *     hole's top (events lost, reported);
    *  4. the current-state checkpoint is rebuilt from the readable
    *     artifacts so every later read serves clean files. */
  def repairTable(table: String): DataFrame = writeLock.synchronized {
    requireSuperuserAlways("REPAIR TABLE")
    if (txn.isDefined)
      throw new IllegalStateException("REPAIR TABLE cannot run inside a transaction")
    ensureWriteLock()
    val t = catalog.require(table)
    require(t.attached.isEmpty, s"cannot repair attached event log: $table")
    val evSchema = EventLog.schema(t.payloadSchema)
    val fs = new Path(baseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val readable = scala.collection.mutable.ArrayBuffer.empty[String]
    val qDir = new Path(s"$baseDir/tables/${t.name}/quarantine")
    val files = tableLogFiles(t)
    // one whole-dir read decides the happy path (see checkTable)
    if (files.nonEmpty && auditParquet(logDir(t.name), evSchema).isRight)
      readable ++= files.map(_.toString)
    else for (p <- files) auditParquet(p.toString, evSchema) match {
      case Right(_) => readable += p.toString
      case Left(err) =>
        if (!fs.exists(qDir)) fs.mkdirs(qDir)
        if (!fs.rename(p, new Path(qDir, p.getName)))
          throw new java.io.IOException(s"quarantine rename failed: $p")
        out += (("quarantine", p.getName, err))
    }
    val snapDir = catalog.snapshotPath(t.name)
    for (s <- Snapshots.available(spark, snapDir))
      if (auditFrame(Snapshots.read(spark, snapDir, s, Some(evSchema))).isLeft) {
        Snapshots.delete(spark, snapDir, s)
        out += (("checkpoint_dropped", s"seq=$s", "unreadable"))
      }
    val snaps = Snapshots.available(spark, snapDir)
    val floor = catalog.retentionFloor(t.name)
    val lastSeq = catalog.lastSeq(t.name)
    if (lastSeq > floor) {
      val (missing, maxMissing) =
        missingSeqs(readable.toSeq, evSchema, floor, lastSeq)
      if (missing > 0) {
        val covering = snaps.find(_ >= maxMissing)
        val newFloor = covering.getOrElse(maxMissing)
        catalog.setRetentionFloor(t.name, newFloor)
        out += (("floor", t.name, s"raised to $newFloor"))
        out += (("lost", t.name, covering match {
          case Some(c) =>
            s"0 rows — checkpoint seq=$c preserves the state; " +
              "history at or below the floor is refused"
          case None =>
            s"up to $missing event(s) in ($floor,$maxMissing]"
        }))
      }
    }
    // invalidate the snapshot bookkeeping snapshot() consults, then
    // rebuild the current checkpoint from the readable artifacts
    lastSnapSeqs.remove(t.name)
    snapshot(table)
    out += (("checkpoint", t.name,
      s"rebuilt at seq=${catalog.lastSeq(t.name)}"))
    import spark.implicits._
    out.toSeq.toDF("action", "target", "detail")
  }

  def showTables(): DataFrame = {
    import spark.implicits._
    catalog.tableNames.map(n => (n, "table")).toDF("name", "kind")
      .unionByName(catalog.viewNames.map(n =>
        (n, if (catalog.isMaterialized(n)) "materialized view" else "view"))
        .toDF("name", "kind"))
  }

  def describe(table: String): DataFrame = {
    import spark.implicits._
    val t = catalog.require(table)
    t.columns.map(c => (c.logical, c.dataType.sql, c.logical == t.pk))
      .toDF("column", "type", "primary_key")
  }

  /** SHOW CREATE TABLE: round-trippable DDL reconstructed from catalog
    * metadata — columns with declared types, PRIMARY KEY,
    * AUTO_INCREMENT, inline REFERENCES, and table-level constraints,
    * in the exact syntax the router parses. */
  def showCreateTable(table: String): DataFrame = {
    import spark.implicits._
    val t = catalog.require(table)
    val fks = catalog.foreignKeysOf(t.name).map(f => f._1 -> (f._2, f._3)).toMap
    val autoInc = catalog.autoIncSequenceFor(t.name).map(_._2)
    val notNull = catalog.constraintsOf(t.name)
      .collect { case graft.catalog.Constraint.NotNull(c) => c }.toSet
    val defaults = catalog.constraintsOf(t.name)
      .collect { case graft.catalog.Constraint.Default(c, e) => c -> e }.toMap
    val colDefs = t.columns.map { c =>
      val parts = Seq(c.logical, c.dataType.sql) ++
        (if (c.logical == t.pk) Seq("PRIMARY KEY") else Nil) ++
        (if (autoInc.contains(c.logical)) Seq("AUTO_INCREMENT") else Nil) ++
        (if (notNull(c.logical)) Seq("NOT NULL") else Nil) ++
        defaults.get(c.logical).map(e => s"DEFAULT $e").toSeq ++
        fks.get(c.logical).map { case (rt, rc) => s"REFERENCES $rt($rc)" }.toSeq
      parts.mkString(" ")
    }
    val tableCons = catalog.constraintsOf(t.name).collect {
      case graft.catalog.Constraint.Unique(cols) => s"UNIQUE (${cols.mkString(", ")})"
      case graft.catalog.Constraint.Check(e) => s"CHECK ($e)"
    }
    val ddl = s"CREATE TABLE ${t.name} (${(colDefs ++ tableCons).mkString(", ")})"
    Seq((t.name, ddl)).toDF("table", "create_table")
  }

  // ======================================================== attachments

  /** Expose a fixture parquet as a read-only base table (state-only —
    * no event history). */
  def attachExternal(name: String, path: String): Unit = {
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  /** Expose an in-memory event log as a temporal table. */
  def attachEventLog(name: String, pk: String, log: DataFrame): Unit =
    catalog.attachEventLog(name, pk, log)
}

object QueryEngine {
  /** Sentinel for "no guard probes" — lets append skip the probe-pool
    * handoff entirely for probe-free paths (COPY, stream ingest). */
  private[exec] val NoProbes: () => Seq[org.apache.spark.sql.DataFrame] = () => Nil

  /** Engine over a fresh scratch dir (tests, per-query fixtures).
    * Inside a scratchScope, the engine is registered for teardown when
    * the scope ends. */
  def scratch(spark: SparkSession): QueryEngine = {
    val dir = java.nio.file.Files.createTempDirectory("graft-engine-")
    val e = new QueryEngine(spark, dir.toString)
    Option(scratchTracker.get()).foreach(_ += e)
    e
  }

  private val scratchTracker =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[QueryEngine]]

  /** Run a scratch-engine scenario, then tear down every scratch
    * engine it created on this thread: the (small) result is collected
    * and re-created as a LOCAL DataFrame, each engine closes
    * (releasing its base-dir lock, audit tail, and result-cache block
    * pins), and each scratch dir is deleted. Without the teardown, a
    * 100-query bench suite accumulates every scratch engine's temp
    * parquet and pinned executor blocks — enough block-manager
    * pressure to regress unrelated queries late in the suite.
    * Statement-path pins free with each engine's close() (pin
    * registry); scenario-level pins referenced by the result frame
    * free here, once the result is collected. */
  def scratchScope(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val created = scala.collection.mutable.ArrayBuffer.empty[QueryEngine]
    val prev = scratchTracker.get()
    scratchTracker.set(created)
    try {
      val res = body
      val rows = java.util.Arrays.asList(res.collect(): _*)
      val local = spark.createDataFrame(rows, res.schema)
      graft.Pins.free(res)
      local
    } finally {
      scratchTracker.set(prev)
      created.foreach { e =>
        scala.util.Try(e.close())
        deleteDir(java.nio.file.Paths.get(e.baseDir))
      }
    }
  }

  private def deleteDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => scala.util.Try(java.nio.file.Files.delete(f)))
    }

  /** Shared daemon timer for statement timeouts — one thread per JVM,
    * not per statement. */
  private[exec] val timeoutTimer = new java.util.Timer("graft-stmt-timeout", true)

  /** Shared daemon pool for overlapping a DML statement's guard-probe
    * jobs with its staging write (the two are independent until the
    * manifest-rename commit point). Cached: idle threads die, bursts
    * reuse them; one probe union runs per statement, so the pool's
    * live size tracks concurrent engines, not statement volume. */
  private[exec] val probePool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val th = new Thread(r, "graft-probe")
      th.setDaemon(true)
      th
    })

  /** The statement exceeded the session's STATEMENT_TIMEOUT and its
    * Spark jobs were cancelled (PG error 57014; the reference's
    * cancellation manager kills the handle the same way —
    * query_cancellation.rs:200-233). */
  final class StatementTimeoutException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** COMMIT lost the first-committer-wins race: another session
    * committed a write to a primary key this transaction also wrote,
    * after this transaction's snapshot (PG error 40001; the reference
    * rejects conflicting commits from its MVCC validator the same way —
    * mvcc.rs). The transaction is rolled back; retry it whole. */
  final class SerializationFailureException(msg: String)
    extends IllegalStateException(msg)
}
