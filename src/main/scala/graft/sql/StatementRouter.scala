package graft.sql

/** Statement classification — the analogue of `execute_sql_inner`'s
  * dispatch on the parsed statement variant (sql_bridge.rs:274-757).
  *
  * Only the statement SHELL is parsed here (kind, table, column list,
  * assignments, WHERE text); every value expression inside it —
  * literals, arithmetic, functions, predicates — is handed verbatim to
  * Spark (`expr(...)` / `spark.sql`), so the full Catalyst expression
  * library is available in DML, a strict superset of the reference's
  * evaluator ([REF-GAP] SURVEY §2.2: the reference has no scalar
  * function library at all).
  */
sealed trait Statement
object Statement {
  /** One declared foreign key: child column → parent table(column). */
  final case class FkDef(column: String, refTable: String, refColumn: String)
  /** Declared column/table constraints beyond the primary key
    * (constraints.rs:9-35: NotNull, Default, Unique, Check). Parsed
    * from inline column markers or table-level constraint entries. */
  sealed trait ConstraintDef
  final case class NotNullDef(column: String) extends ConstraintDef
  final case class DefaultDef(column: String, expr: String) extends ConstraintDef
  final case class UniqueDef(columns: Seq[String]) extends ConstraintDef
  final case class CheckDef(expr: String) extends ConstraintDef
  /** `col BIGINT AUTO_INCREMENT` — the column fills from a table-owned
    * sequence when omitted from an INSERT (sequences.rs:80-142). */
  final case class AutoIncrementDef(column: String) extends ConstraintDef
  final case class CreateTable(name: String, cols: Seq[(String, String)], pk: String,
      fks: Seq[FkDef] = Nil,
      constraints: Seq[ConstraintDef] = Nil) extends Statement
  /** CREATE INDEX i ON t(a[, b, ...]) — one or more columns. A
    * composite index stamps a bloom filter on EVERY listed column
    * (each answers equality point probes independently) and doubles
    * as the table's physical-clustering hint: a bare OPTIMIZE t
    * Z-orders by the composite's columns (index_strategies.rs's
    * covering-index analogue in lakehouse form). */
  final case class CreateIndex(index: String, table: String,
      columns: Seq[String]) extends Statement
  final case class DropIndex(index: String, ifExists: Boolean) extends Statement
  /** CREATE [OR REPLACE] [MATERIALIZED] VIEW (views.rs:40-123 —
    * is_materialized). */
  final case class CreateView(name: String, sql: String,
      materialized: Boolean = false, orReplace: Boolean = false) extends Statement
  /** REFRESH MATERIALIZED VIEW — re-runs the stored SQL and swaps the
    * served data version (views.rs refresh policy). */
  final case class RefreshMatView(name: String,
      incremental: Boolean = false) extends Statement
  /** REFRESH ALL MATERIALIZED VIEWS [INCREMENTALLY] — refresh every
    * matview; with INCREMENTALLY, maintainable views merge their
    * deltas and full-rerun views re-run, returning one outcome row
    * per view (alphabetical). */
  final case class RefreshAllMatViews(incremental: Boolean)
    extends Statement
  /** CREATE TRIGGER name BEFORE|AFTER INSERT|UPDATE|DELETE ON t
    * [FOR EACH ROW|STATEMENT] [WHEN (cond)] EXECUTE <stmt> — recorded
    * in the catalog and FIRED by the engine around DML
    * (triggers.rs:199-248 create, 332-543 execute). */
  final case class CreateTrigger(name: String, timing: String, event: String,
      table: String, body: String) extends Statement
  final case class DropTrigger(name: String, ifExists: Boolean) extends Statement
  /** ALTER TRIGGER name ENABLE|DISABLE (triggers.rs:286-330). */
  final case class AlterTrigger(name: String, enable: Boolean) extends Statement
  case object ShowTriggers extends Statement
  /** CREATE [OR REPLACE] PROCEDURE name(p1, p2, ...) AS <script> —
    * the body is a `;`-separated script binding `$param` placeholders
    * at CALL (procedures.rs:29-66, 457-500). */
  final case class CreateProcedure(name: String, params: Seq[String],
      body: String, orReplace: Boolean) extends Statement
  final case class DropProcedure(name: String, ifExists: Boolean) extends Statement
  case object ShowProcedures extends Statement
  /** CALL name(arg, ...) — args are constant SQL expressions, evaluated
    * then bound as literals (procedures.rs:533-630 execute_procedure). */
  final case class Call(name: String, args: Seq[String]) extends Statement
  /** CREATE SEQUENCE name [START [WITH] n] [INCREMENT [BY] n]
    * [MINVALUE n] [MAXVALUE n] [CYCLE|NO CYCLE] [CACHE n]
    * (sequences.rs:8-19; CACHE parses but is ignored — the engine
    * draws through the catalog, block reservation replaces caching). */
  final case class CreateSequence(name: String, start: Option[Long],
      increment: Option[Long], minValue: Option[Long], maxValue: Option[Long],
      cycle: Boolean) extends Statement
  final case class DropSequence(name: String, ifExists: Boolean) extends Statement
  /** ALTER SEQUENCE name RESTART [WITH n] (sequences.rs:180-192). */
  final case class AlterSequenceRestart(name: String, withValue: Option[Long]) extends Statement
  case object ShowSequences extends Statement
  case object ShowIndexes extends Statement
  /** SHOW MATERIALIZED VIEWS — name, data version, maintenance kind,
    * base tables with refresh horizons, and staleness (events appended
    * to any base since the last refresh). */
  case object ShowMatviews extends Statement
  /** ALTER MATERIALIZED VIEW name SET AUTOREFRESH ON [EVERY n EVENTS]
    * | OFF — when ON, any statement that leaves at least `every`
    * events past the view's horizon on some base runs the incremental
    * refresh before returning (always-fresh views; only
    * fully-retractable shapes qualify). EVERY n EVENTS debounces a
    * hot single-row ingest loop: the refresh is paid once per n
    * events, not per statement; 1 (the default) keeps the always-
    * fresh contract. */
  final case class AlterMatviewAutoRefresh(name: String, on: Boolean,
      every: Option[Long] = None)
    extends Statement
  /** SET RATE_LIMIT <qps> [BURST <n>] | OFF — per-session token-bucket
    * statement limiting for non-superusers (rate_limit/mod.rs:
    * queries_per_second + burst_size; the engine-level slice of the
    * reference's server-side limiter). */
  final case class SetRateLimit(qps: Option[Double],
      burst: Option[Long]) extends Statement
  /** SHOW CREATE TABLE t — round-trippable DDL from catalog metadata. */
  final case class ShowCreateTable(table: String) extends Statement
  final case class DropTable(name: String, ifExists: Boolean) extends Statement
  final case class DropView(name: String, ifExists: Boolean) extends Statement
  final case class Truncate(table: String) extends Statement
  final case class AlterAdd(table: String, column: String, typeDdl: String) extends Statement
  final case class AlterRename(table: String, from: String, to: String) extends Statement
  final case class AlterDrop(table: String, column: String) extends Statement
  final case class InsertValues(table: String, cols: Option[Seq[String]], valuesSql: String) extends Statement
  final case class InsertSelect(table: String, cols: Option[Seq[String]], select: String) extends Statement
  final case class Update(table: String, assignments: Seq[(String, String)], where: Option[String]) extends Statement
  final case class Delete(table: String, where: Option[String]) extends Statement
  /** VACUUM t / CHECKPOINT TABLE t / SNAPSHOT t (sql_bridge.rs:278-302). */
  final case class Snapshot(table: String) extends Statement
  /** OPTIMIZE t [ZORDER BY (c1, ...)] — rewrite the current checkpoint
    * with a clustered physical layout ([REF-GAP]: the reference's
    * compaction, engine.rs:739-845, rewrites segments with no layout
    * control; multi-column clustering is what file-skipping at 100 TB
    * needs). Empty cols = cluster by primary key. */
  final case class Optimize(table: String, zorderBy: Seq[String]) extends Statement
  /** VACUUM t RETAIN @SEQ:N — physically delete log files fully
    * covered by a snapshot at or before N and set the table's
    * retention floor (the reclamation half of the reference's segment
    * compaction, engine.rs:739-845; Delta's VACUUM-with-retention is
    * the same contract). */
  final case class VacuumRetain(table: String, retainSeq: Long) extends Statement
  /** CHECK TABLE t [FULL] — read-only integrity audit of the table's
    * persisted artifacts: per-file log/checkpoint readability,
    * sequence continuity against the catalog counter, and (FULL) a
    * content compare of the newest checkpoint against the log's own
    * collapse (the detection half of the reference's self-healing
    * recovery, error_recovery.rs:395-505). */
  final case class CheckTable(table: String, full: Boolean) extends Statement
  /** REPAIR TABLE t — quarantine unreadable log files, drop unreadable
    * checkpoints, raise the retention floor over lost history, and
    * rebuild the checkpoint from the readable artifacts (the repair
    * half: error_recovery.rs:456-505 truncates corrupt segments and
    * accepts bounded, REPORTED data loss the same way). */
  final case class RepairTable(table: String) extends Statement
  /** DIFF TABLE t BETWEEN @SEQ:a AND @SEQ:b — the NET row changes
    * between two collapsed states (added/removed/modified), the
    * state-level complement of FOR SYSTEM_TIME BETWEEN's event feed
    * (drift history, query/executor.rs:327-354). */
  final case class DiffTable(table: String, fromSeq: Long, toSeq: Long) extends Statement
  /** format is "text" or "json" (explain.rs emits both shapes). */
  final case class Explain(inner: String, analyze: Boolean,
      format: String = "text") extends Statement
  final case class Analyze(table: String) extends Statement
  case object ShowTables extends Statement
  final case class Describe(table: String) extends Statement
  /** COPY t FROM 'path' — JSONL bulk ingest (driftdb-cli main.rs:40-50). */
  /** COPY t FROM 'path' [(FORMAT JSONL|PARQUET|CSV)] — bulk ingest.
    * Format defaults by file extension (the reference CLI is
    * JSONL-only, main.rs:40-50; parquet/CSV are the Spark-native
    * additions a 100 TB load actually uses). */
  final case class CopyFrom(table: String, path: String,
      format: Option[String] = None) extends Statement
  /** COPY <table | (query)> TO 'dir' [(FORMAT ...)] — sharded export
    * of a table or query result ([REF-GAP]: the reference has no
    * export; a training pipeline ends in one). Reads go through the
    * governed select path, so RLS and privileges apply. */
  final case class CopyTo(source: String, path: String,
      format: Option[String] = None,
      zorderBy: Seq[String] = Nil) extends Statement
  // Transaction control (sql_bridge.rs:453-568): BEGIN buffers event
  // appends in the engine; COMMIT flushes them; ROLLBACK discards.
  case object Begin extends Statement
  case object Commit extends Statement
  /** ROLLBACK (end txn) or ROLLBACK TO [SAVEPOINT] name (partial). */
  final case class Rollback(toSavepoint: Option[String]) extends Statement
  final case class Savepoint(name: String) extends Statement
  final case class ReleaseSavepoint(name: String) extends Statement
  final case class Select(sql: String) extends Statement
  /** ALTER TABLE t ENABLE|DISABLE ROW LEVEL SECURITY
    * (row_level_security.rs:195-222). */
  final case class AlterTableRls(table: String, enable: Boolean) extends Statement
  /** CREATE POLICY name ON t [AS PERMISSIVE|RESTRICTIVE] [FOR cmd]
    * [TO role, ...] [USING (expr)] [WITH CHECK (expr)]
    * (row_level_security.rs:56-128, 224-248). */
  final case class CreatePolicy(name: String, table: String, command: String,
      roles: Seq[String], permissive: Boolean,
      usingExpr: Option[String], checkExpr: Option[String]) extends Statement
  final case class DropPolicy(name: String, table: String, ifExists: Boolean) extends Statement
  case object ShowPolicies extends Statement
  /** SET ROLE user / RESET ROLE — switches the session's security
    * context (the reference threads a SecurityContext per connection,
    * row_level_security.rs:130-162). */
  final case class SetRole(user: Option[String]) extends Statement
  /** BACKUP DATABASE TO 'dir' [INCREMENTAL FROM 'parentDir']
    * (backup.rs:78 full, :156 incremental). */
  final case class BackupDb(dir: String, parent: Option[String]) extends Statement
  /** RESTORE DATABASE FROM 'dir' [AS OF @SEQ:N] — full-chain restore,
    * or point-in-time by cutting the chain at the youngest manifest
    * whose recorded sequence high-water mark covers N (backup.rs:250;
    * PITR surface backup_enhanced.rs:1-10). */
  final case class RestoreDb(dir: String, asOfSeq: Option[Long] = None)
    extends Statement
  /** SHOW BACKUPS IN 'dir' — the queryable backup catalog over a
    * directory of backups (backup_enhanced.rs:260-300 list). */
  final case class ShowBackups(dir: String) extends Statement
  /** PRUNE BACKUPS IN 'dir' [KEEP n] [OLDER THAN n DAYS] [DRY RUN] —
    * retention over the catalog (backup_enhanced.rs:736-793
    * apply_retention_policy: age cutoff + keep-count), chain-safe: a
    * kept backup's incremental ancestors are retained regardless. */
  final case class PruneBackups(dir: String, keep: Option[Int],
      olderThanDays: Option[Int], dryRun: Boolean) extends Statement
  /** SHOW CLUSTER — replication links (per-table primary/replica
    * sequence high-water marks and lag) plus leadership lease state
    * (distributed_coordinator.rs:24-30 tracks per-peer health/lag;
    * failover.rs the promote path). */
  case object ShowCluster extends Statement
  /** VERIFY BACKUP 'dir' (backup.rs:292). */
  final case class VerifyBackup(dir: String) extends Statement
  /** SET AUDIT ON|OFF — statement auditing (audit.rs:14-60:
    * AuditSystem + AuditConfig.enabled). */
  final case class SetAudit(on: Boolean) extends Statement
  /** SHOW AUDIT — the recorded statement feed (audit.rs:504
    * query_logs). */
  case object ShowAudit extends Statement
  /** GRANT privs ON t TO grantees / REVOKE ... FROM ... — the
    * table-privilege slice of the reference's Permission model
    * (auth.rs:32-120, check_permission :647). */
  final case class Grant(privs: Seq[String], table: String,
      grantees: Seq[String]) extends Statement
  final case class Revoke(privs: Seq[String], table: String,
      grantees: Seq[String]) extends Statement
  case object ShowGrants extends Statement
  /** CREATE ROLE name [WITH PERMISSIONS p, ...] — a custom role bundle
    * (rbac.rs:471-489 create_custom_role); the predefined bundles
    * superuser/admin/user/readonly ship with the engine
    * (rbac.rs:153-334). */
  final case class CreateRole(name: String, perms: Seq[String]) extends Statement
  /** DROP ROLE [IF EXISTS] name (rbac.rs:492-512; system bundles
    * refuse). */
  final case class DropRole(name: String, ifExists: Boolean) extends Statement
  /** GRANT role TO users — role membership, the ON-less GRANT form
    * (rbac.rs:381-397 grant_role). */
  final case class GrantRole(role: String, users: Seq[String]) extends Statement
  /** REVOKE role FROM users (rbac.rs:400-414 revoke_role). */
  final case class RevokeRole(role: String, users: Seq[String]) extends Statement
  /** SHOW ROLES — bundles, permissions, and memberships
    * (rbac.rs:516-520 get_all_roles). */
  case object ShowRoles extends Statement
  /** SET PRIVILEGES ON|OFF — privilege checking gate (the reference's
    * AuthConfig.enabled, auth.rs:134-160). */
  final case class SetPrivileges(on: Boolean) extends Statement
  /** SET CACHE ON|OFF / SHOW CACHE / CLEAR CACHE — query result cache
    * (cache.rs:75 QueryCache, :167 get, :196 put, :267 clear,
    * :279 statistics). */
  final case class SetCache(on: Boolean) extends Statement
  case object ShowCache extends Statement
  case object ClearCache extends Statement
  /** CREATE MIGRATION 'x.y.z' UP <script> [DOWN <script>] — a
    * versioned schema migration (migration.rs:99-150 Migration,
    * :22-64 Version). */
  final case class CreateMigration(version: String, up: String,
      down: Option[String]) extends Statement
  /** MIGRATE — apply every pending migration in version order
    * (migration.rs:489 migrate_all). */
  case object Migrate extends Statement
  /** ROLLBACK MIGRATION — undo the newest applied migration via its
    * DOWN script (migration.rs:465 rollback_migration). */
  case object RollbackMigration extends Statement
  case object ShowMigrations extends Statement
  /** SET STATEMENT_TIMEOUT <ms> — 0 disables; a statement exceeding it
    * has its Spark jobs cancelled (query_cancellation.rs:20-46
    * CancellationConfig.default_timeout, :200 cancel_query). */
  final case class SetStatementTimeout(ms: Long) extends Statement
  /** SHOW METRICS — engine counters/gauges (monitoring.rs:81-246
    * MonitoringSystem / DatabaseMetrics / QueryMetrics). */
  case object ShowMetrics extends Statement
  /** SHOW STORAGE [FOR t] — physical footprint per table: log/snapshot
    * file counts and bytes, snapshot sequences, retention floor. The
    * ops answer to "what is VACUUM/OPTIMIZE actually reclaiming". */
  final case class ShowStorage(table: Option[String]) extends Statement
  /** SHOW STATS FOR t — per-column ANALYZE detail: null counts,
    * ndv, min/max (stats.rs:1-60). */
  final case class ShowStats(table: String) extends Statement
  /** SHOW HISTOGRAM t col — equi-width bucket counts for a numeric
    * column (stats.rs histogram shape). */
  final case class ShowHistogram(table: String, column: String)
    extends Statement
  /** SET SLOW_LOG <ms> — statements at/over the threshold land in the
    * slow-statement log; 0 disables (monitoring.rs:97
    * slow_query_threshold_ms). */
  final case class SetSlowLog(ms: Long) extends Statement
  /** SHOW PERF — wall-clock latency histogram + slow-statement log
    * (monitoring.rs:95 query_latency_tracker / PercentileTracker).
    * Deliberately SEPARATE from SHOW METRICS, which stays
    * deterministic for the correctness oracle. */
  case object ShowPerf extends Statement
  /** SET TRACE ON|OFF — per-statement span recording (observability
    * .rs:1-10,323: the reference instruments operations with tracing
    * spans; graft records them per statement into a bounded ring). */
  final case class SetTrace(on: Boolean) extends Statement
  /** SHOW TRACES — newest-first summaries of recorded statement
    * traces (trace_id, statement, total ms, span count). Wall-clock,
    * so unit-tested only — the SHOW PERF boundary. */
  case object ShowTraces extends Statement
  /** SHOW TRACE <id> — the span tree of one recorded trace. */
  final case class ShowTrace(traceId: Long) extends Statement
  /** SET ENCRYPTION KEY '<base64>' — register the AES master key and
    * encrypt every subsequent event-log/snapshot/matview parquet write
    * (parquet modular encryption; encryption.rs:1-1095). SET
    * ENCRYPTION OFF stops encrypting NEW writes (existing encrypted
    * files stay readable while the key is registered). */
  final case class SetEncryptionKey(keyBase64: String) extends Statement
  case object SetEncryptionOff extends Statement
  /** SET SECURITY_MONITOR ON|OFF — enable/disable the intrusion
    * monitor (security_monitor.rs:25 SecurityConfig.enabled); SET
    * SECURITY_AUTOBLOCK ON|OFF mirrors auto_block_threats (:48). */
  final case class SetSecurityMonitor(on: Boolean) extends Statement
  final case class SetSecurityAutoblock(on: Boolean) extends Statement
  /** SHOW SECURITY THREATS / STATS — the monitor's threat feed and
    * counters (security_monitor.rs get_active_threats/get_stats). */
  case object ShowSecurityThreats extends Statement
  case object ShowSecurityStats extends Statement
  /** SHOW SESSIONS — per-session activity + risk score
    * (security_monitor.rs SessionTracker, connection.rs:450 stats). */
  case object ShowSessions extends Statement
  /** CREATE ALERT name ON metric <op> threshold [SEVERITY s] — a
    * threshold rule over the deterministic SHOW METRICS feed
    * (alerting.rs:134-166 AlertRule; the reference registers the same
    * shape of rule over its Prometheus gauges, :231-380). */
  final case class CreateAlert(name: String, metric: String, op: String,
      threshold: Double, severity: String) extends Statement
  final case class DropAlert(name: String, ifExists: Boolean) extends Statement
  /** SHOW ALERTS — pull-based rule evaluation (alerting.rs:395-505
    * evaluate_rules / get_active_alerts): firing while the condition
    * holds, resolved once it stops, pending if it never fired. */
  case object ShowAlerts extends Statement

  /** SHOW OPTIMIZATIONS — the engine-derived advice the
    * /performance/optimization endpoint and `graft doctor` serve,
    * reachable from any SQL session. */
  case object ShowOptimizations extends Statement
}

object StatementRouter {
  import Statement._

  /** Split at top-level separators: separators inside (...) nesting,
    * string literals (both '' and backslash escapes), or comments
    * don't count. Delegates to the shared SqlText scanner. */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] =
    SqlText.splitTopLevel(s, sep)

  private val CreateTableR =
    """(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)\)\s*$""".r
  private val CreateIndexR =
    ("""(?is)^CREATE\s+(?:UNIQUE\s+)?INDEX\s+(\w+)\s+ON\s+([\w.]+)""" +
      """\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*$""").r
  private val DropIndexR =
    """(?is)^DROP\s+INDEX\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val CreateViewR =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?(MATERIALIZED\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)$""".r
  private val RefreshMatViewR =
    """(?is)^REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)(\s+INCREMENTALLY)?\s*$""".r
  private val RefreshAllMatViewsR =
    """(?is)^REFRESH\s+ALL\s+MATERIALIZED\s+VIEWS(\s+INCREMENTALLY)?\s*$""".r
  private val CreateTriggerR =
    """(?is)^CREATE\s+TRIGGER\s+(\w+)\s+(BEFORE|AFTER)\s+(INSERT|UPDATE|DELETE)\s+ON\s+([\w.]+)\s*(.*)$""".r
  private val DropTriggerR = """(?is)^DROP\s+TRIGGER\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val AlterTriggerR =
    """(?is)^ALTER\s+TRIGGER\s+(\w+)\s+(ENABLE|DISABLE)\s*$""".r
  private val ShowTriggersR = """(?is)^SHOW\s+TRIGGERS\s*$""".r
  private val CreateProcR =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?PROCEDURE\s+(\w+)\s*\(([^)]*)\)\s+AS\s+(.+)$""".r
  private val DropProcR = """(?is)^DROP\s+PROCEDURE\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val ShowProcsR = """(?is)^SHOW\s+PROCEDURES\s*$""".r
  private val CallR = """(?is)^CALL\s+(\w+)\s*\((.*)\)\s*$""".r
  // one procedure parameter: optional direction keyword + name +
  // optional type DDL, all ignored but the name (procedures.rs:55-80
  // keeps direction and type; binding here is by name, typing is the
  // bound value's own)
  private val ProcParamR = """(?is)^(?:IN\s+|OUT\s+|INOUT\s+)?(\w+)(?:\s+.*)?$""".r
  private val CreateSeqR =
    """(?is)^CREATE\s+SEQUENCE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(.*)$""".r
  private val DropSeqR = """(?is)^DROP\s+SEQUENCE\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val AlterSeqR =
    """(?is)^ALTER\s+SEQUENCE\s+(\w+)\s+RESTART(?:\s+WITH\s+(-?\d+))?\s*$""".r
  private val ShowSeqsR = """(?is)^SHOW\s+SEQUENCES\s*$""".r
  private val ShowMatviewsR =
    """(?is)^SHOW\s+MATERIALIZED\s+VIEWS\s*$""".r
  private val AlterMvAutoR =
    ("""(?is)^ALTER\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+SET\s+AUTOREFRESH""" +
      """\s+(ON|OFF)(?:\s+EVERY\s+(\d+)\s+EVENTS)?\s*$""").r
  private val ShowIndexesR = """(?is)^SHOW\s+INDEXES\s*$""".r
  private val ShowCreateR =
    """(?is)^SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*$""".r
  private val DropTableR = """(?is)^DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val DropViewR = """(?is)^DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$""".r
  private val TruncateR = """(?is)^TRUNCATE\s+(?:TABLE\s+)?([\w.]+)\s*$""".r
  private val AlterAddR =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+(.+?)\s*$""".r
  private val AlterRenameR =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+(?:COLUMN\s+)?(\w+)\s+TO\s+(\w+)\s*$""".r
  private val AlterDropR =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*$""".r
  private val InsertR =
    """(?is)^INSERT\s+INTO\s+([\w.]+)\s*(\(([^)]*)\))?\s*(VALUES\s*.+|SELECT\s+.+|WITH\s+.+)$""".r
  private val UpdateR =
    """(?is)^UPDATE\s+([\w.]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?\s*$""".r
  private val DeleteR =
    """(?is)^DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+))?\s*$""".r
  private val SnapshotR =
    """(?is)^(?:VACUUM|SNAPSHOT|CHECKPOINT\s+TABLE)\s+([\w.]+)\s*$""".r
  private val OptimizeR =
    """(?is)^OPTIMIZE\s+([\w.]+)(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$""".r
  private val VacuumRetainR =
    """(?is)^VACUUM\s+([\w.]+)\s+RETAIN\s+@SEQ:(\d+)\s*$""".r
  private val CheckTableR =
    """(?is)^CHECK\s+TABLE\s+([\w.]+)(\s+FULL)?\s*$""".r
  private val RepairTableR = """(?is)^REPAIR\s+TABLE\s+([\w.]+)\s*$""".r
  private val DiffTableR =
    """(?is)^DIFF\s+TABLE\s+([\w.]+)\s+BETWEEN\s+@SEQ:(\d+)\s+AND\s+@SEQ:(\d+)\s*$""".r
  private val ExplainR =
    """(?is)^EXPLAIN\s+(ANALYZE\s+)?(?:FORMAT\s+(JSON|YAML|TEXT)\s+)?(.+)$""".r
  private val AnalyzeR = """(?is)^ANALYZE\s+(?:TABLE\s+)?([\w.]+)\s*$""".r
  private val ShowTablesR = """(?is)^SHOW\s+TABLES\s*$""".r
  private val DescribeR = """(?is)^(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?([\w.]+)\s*$""".r
  private val CopyR =
    """(?is)^COPY\s+([\w.]+)\s+FROM\s+'([^']+)'\s*(?:\(\s*FORMAT\s+(\w+)\s*\))?\s*$""".r
  private val CopyToFormatR = """(?is)FORMAT\s+(\w+)""".r
  private val CopyToZorderR = """(?is)ZORDER\s*\(([^)]*)\)""".r
  private val CopyToDestR = """(?s)^'([^']+)'\s*(?:\((.*)\))?\s*$""".r

  /** `COPY (query)|table TO 'path' [(opts)]`, split at the first
    * TOP-LEVEL `TO` keyword — a ` TO '...'` sitting inside one of the
    * query's string literals (or inside its parens) must not become
    * the destination split; the old anchored regex was quote-blind. */
  private object CopyToX {
    def unapply(raw: String): Option[(String, String, String)] = {
      val t = raw.trim
      if (!t.regionMatches(true, 0, "COPY", 0, 4)) return None
      val to = SqlText.topLevelKeywordIndexOf(t, "TO")
      if (to < 0) return None
      val source = t.substring(4, to).trim
      val okSource = (source.startsWith("(") && source.endsWith(")")) ||
        source.matches("""[\w.]+""")
      if (!okSource) return None
      CopyToDestR.findFirstMatchIn(t.substring(to + 2).trim)
        .map(m => (source, m.group(1), m.group(2)))
    }
  }
  private val AlterRlsR =
    """(?is)^ALTER\s+TABLE\s+([\w.]+)\s+(ENABLE|DISABLE)\s+ROW\s+LEVEL\s+SECURITY\s*$""".r
  private val CreatePolicyR =
    """(?is)^CREATE\s+POLICY\s+(\w+)\s+ON\s+([\w.]+)\s*(.*)$""".r
  private val DropPolicyR =
    """(?is)^DROP\s+POLICY\s+(IF\s+EXISTS\s+)?(\w+)\s+ON\s+([\w.]+)\s*$""".r
  private val ShowPoliciesR = """(?is)^SHOW\s+POLICIES\s*$""".r
  private val SetRoleR =
    """(?is)^SET\s+(?:ROLE|SESSION\s+AUTHORIZATION)\s+(\w+)\s*$""".r
  private val ResetRoleR = """(?is)^RESET\s+(?:ROLE|SESSION\s+AUTHORIZATION)\s*$""".r
  private val BackupR =
    """(?is)^BACKUP\s+DATABASE\s+TO\s+'([^']+)'(?:\s+INCREMENTAL\s+FROM\s+'([^']+)')?\s*$""".r
  private val RestoreR =
    """(?is)^RESTORE\s+DATABASE\s+FROM\s+'([^']+)'(?:\s+AS\s+OF\s+@SEQ:(\d+))?\s*$""".r
  private val ShowBackupsR = """(?is)^SHOW\s+BACKUPS\s+IN\s+'([^']+)'\s*$""".r
  // the retention clauses are independent options: accept them in ANY
  // order (post-parsed in the router case), not just KEEP-then-OLDER
  private val PruneBackupsR =
    ("""(?is)^PRUNE\s+BACKUPS\s+IN\s+'([^']+)'""" +
      """((?:\s+(?:KEEP\s+\d+|OLDER\s+THAN\s+\d+\s+DAYS?|DRY\s+RUN))*)\s*$""").r
  private val ShowClusterR = """(?is)^SHOW\s+CLUSTER\s*$""".r
  private val VerifyBackupR = """(?is)^VERIFY\s+BACKUP\s+'([^']+)'\s*$""".r
  private val SetAuditR = """(?is)^SET\s+AUDIT\s+(ON|OFF)\s*$""".r
  private val GrantR =
    """(?is)^GRANT\s+(ALL(?:\s+PRIVILEGES)?|[\w\s,]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+TO\s+([\w\s,]+?)\s*$""".r
  private val RevokeR =
    """(?is)^REVOKE\s+(ALL(?:\s+PRIVILEGES)?|[\w\s,]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+FROM\s+([\w\s,]+?)\s*$""".r
  private val ShowGrantsR = """(?is)^SHOW\s+GRANTS\s*$""".r
  private val CreateRoleR =
    """(?is)^CREATE\s+ROLE\s+(\w+)(?:\s+WITH\s+PERMISSIONS\s+([\w\s,]+?))?\s*$""".r
  private val DropRoleR =
    """(?is)^DROP\s+ROLE\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  // ON-less GRANT/REVOKE = role membership (PG's GRANT role TO user);
  // tried AFTER the table forms, which require ON
  private val GrantRoleR = """(?is)^GRANT\s+(\w+)\s+TO\s+([\w\s,]+?)\s*$""".r
  private val RevokeRoleR = """(?is)^REVOKE\s+(\w+)\s+FROM\s+([\w\s,]+?)\s*$""".r
  private val ShowRolesR = """(?is)^SHOW\s+ROLES\s*$""".r
  private val SetCacheR = """(?is)^SET\s+CACHE\s+(ON|OFF)\s*$""".r
  private val ShowCacheR = """(?is)^SHOW\s+CACHE\s*$""".r
  private val ClearCacheR = """(?is)^CLEAR\s+CACHE\s*$""".r
  private val CreateMigrationR =
    """(?is)^CREATE\s+MIGRATION\s+'([^']+)'\s+UP\s+(.+)$""".r
  private val MigrateR = """(?is)^MIGRATE\s*$""".r
  private val RollbackMigrationR = """(?is)^ROLLBACK\s+MIGRATION\s*$""".r
  private val ShowMigrationsR = """(?is)^SHOW\s+MIGRATIONS\s*$""".r
  private val SetTimeoutR = """(?is)^SET\s+STATEMENT_TIMEOUT\s+(\d+)\s*$""".r
  private val ShowMetricsR = """(?is)^SHOW\s+METRICS\s*$""".r
  private val ShowStorageR =
    """(?is)^SHOW\s+STORAGE(?:\s+FOR\s+([\w.]+))?\s*$""".r
  private val ShowStatsR =
    """(?is)^SHOW\s+STATS\s+(?:FOR\s+)?([\w.]+)\s*$""".r
  private val ShowHistogramR =
    """(?is)^SHOW\s+HISTOGRAM\s+([\w.]+)\s+(\w+)\s*$""".r
  private val SetSlowLogR = """(?is)^SET\s+SLOW_LOG\s+(\d+)\s*$""".r
  private val SetRateLimitR =
    """(?is)^SET\s+RATE_LIMIT\s+(?:(OFF)|(\d+(?:\.\d+)?)(?:\s+BURST\s+(\d+))?)\s*$""".r
  private val ShowPerfR = """(?is)^SHOW\s+PERF\s*$""".r
  private val SetTraceR = """(?is)^SET\s+TRACE\s+(ON|OFF)\s*$""".r
  private val ShowTracesR = """(?is)^SHOW\s+TRACES\s*$""".r
  private val ShowTraceR = """(?is)^SHOW\s+TRACE\s+(\d+)\s*$""".r
  private val SetEncryptionKeyR =
    """(?is)^SET\s+ENCRYPTION\s+KEY\s+'([^']+)'\s*$""".r
  private val SetEncryptionOffR = """(?is)^SET\s+ENCRYPTION\s+OFF\s*$""".r
  private val SetSecurityMonitorR =
    """(?is)^SET\s+SECURITY_MONITOR\s+(ON|OFF)\s*$""".r
  private val SetSecurityAutoblockR =
    """(?is)^SET\s+SECURITY_AUTOBLOCK\s+(ON|OFF)\s*$""".r
  private val ShowSecurityThreatsR =
    """(?is)^SHOW\s+SECURITY\s+THREATS\s*$""".r
  private val ShowSecurityStatsR = """(?is)^SHOW\s+SECURITY\s+STATS\s*$""".r
  private val ShowSessionsR = """(?is)^SHOW\s+SESSIONS\s*$""".r
  private val CreateAlertR =
    """(?is)^CREATE\s+ALERT\s+(\w+)\s+ON\s+(\w+)\s*(>=|<=|>|<|=)\s*(-?\d+(?:\.\d+)?)(?:\s+SEVERITY\s+(INFO|WARNING|CRITICAL|FATAL))?\s*$""".r
  private val DropAlertR = """(?is)^DROP\s+ALERT\s+(IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val ShowAlertsR = """(?is)^SHOW\s+ALERTS\s*$""".r
  private val ShowOptimizationsR = """(?is)^SHOW\s+OPTIMIZATIONS\s*$""".r
  private val SetPrivilegesR = """(?is)^SET\s+PRIVILEGES\s+(ON|OFF)\s*$""".r
  private val ShowAuditR = """(?is)^SHOW\s+AUDIT\s*$""".r
  private val BeginR =
    """(?is)^(?:BEGIN(?:\s+(?:WORK|TRANSACTION))?|START\s+TRANSACTION)(?:\s+ISOLATION\s+LEVEL\s+[\w\s]+)?\s*$""".r
  private val CommitR = """(?is)^(?:COMMIT|END)(?:\s+(?:WORK|TRANSACTION))?\s*$""".r
  private val RollbackR =
    """(?is)^ROLLBACK(?:\s+(?:WORK|TRANSACTION))?(?:\s+TO\s+(?:SAVEPOINT\s+)?(\w+))?\s*$""".r
  private val SavepointR = """(?is)^SAVEPOINT\s+(\w+)\s*$""".r
  private val ReleaseR = """(?is)^RELEASE\s+(?:SAVEPOINT\s+)?(\w+)\s*$""".r

  def parse(raw: String): Statement = {
    // comments are removed before classification: the statement regexes
    // are start/end-anchored, so a leading comment or a trailing
    // `COMMIT -- done` form would otherwise misroute to passthrough.
    // Optimizer hints survive stripping (they're planner input), so
    // matching runs on the hint-kept form first; when a hint sits
    // inside a statement's PREFIX (`UPDATE /*+ x */ t SET`,
    // `COMMIT /*+ x */`) and defeats the anchors, classification
    // retries without hints — only the fall-through Select keeps them,
    // which is exactly where Catalyst reads them.
    val withHints = SqlText.stripComments(raw).trim.stripSuffix(";").trim
    matchStatement(withHints).getOrElse {
      val bare = SqlText.stripComments(raw, keepHints = false).trim.stripSuffix(";").trim
      matchStatement(bare).getOrElse(Select(withHints))
    }
  }

  private def matchStatement(stmt: String): Option[Statement] = Some(stmt).collect {
      case CreateTableR(name, body) =>
        val (cols, pk, fks, cons) = parseCreateBody(body)
        CreateTable(name, cols, pk, fks, cons)
      case CreateIndexR(idx, table, colNames) =>
        CreateIndex(idx, table,
          colNames.split(",").toIndexedSeq.map(_.trim))
      case DropIndexR(ifEx, idx) => DropIndex(idx, ifEx != null)
      case CreateViewR(orRepl, mat, name, sql) =>
        CreateView(name, sql.trim, mat != null, orRepl != null)
      case RefreshAllMatViewsR(inc) => RefreshAllMatViews(inc != null)
      case RefreshMatViewR(name, inc) => RefreshMatView(name, inc != null)
      case CreateTriggerR(name, timing, event, table, body) =>
        CreateTrigger(name, timing, event, table, body.trim)
      case DropTriggerR(ifEx, name) => DropTrigger(name, ifEx != null)
      case AlterTriggerR(name, mode) =>
        AlterTrigger(name, mode.equalsIgnoreCase("ENABLE"))
      case ShowTriggersR() => ShowTriggers
      case CreateProcR(orRepl, name, paramList, body) =>
        val params = splitTopLevel(paramList).map(_.trim).filter(_.nonEmpty)
          .map {
            case ProcParamR(p) => p
            case bad => throw new IllegalArgumentException(s"bad parameter: $bad")
          }
        CreateProcedure(name, params, body.trim, orRepl != null)
      case DropProcR(ifEx, name) => DropProcedure(name, ifEx != null)
      case ShowProcsR() => ShowProcedures
      case CallR(name, argList) =>
        Call(name, splitTopLevel(argList).map(_.trim).filter(_.nonEmpty))
      case CreateSeqR(name, opts) => parseCreateSequence(name, opts)
      case DropSeqR(ifEx, name) => DropSequence(name, ifEx != null)
      case AlterSeqR(name, withV) =>
        AlterSequenceRestart(name, Option(withV).map(_.toLong))
      case ShowSeqsR() => ShowSequences
      case ShowMatviewsR() => ShowMatviews
      case AlterMvAutoR(name, mode, every) =>
        AlterMatviewAutoRefresh(name, mode.equalsIgnoreCase("ON"),
          Option(every).map(_.toLong))
      case ShowIndexesR() => ShowIndexes
      case ShowCreateR(t) => ShowCreateTable(t)
      case AlterRlsR(table, mode) =>
        AlterTableRls(table, mode.equalsIgnoreCase("ENABLE"))
      case CreatePolicyR(name, table, rest) => parseCreatePolicy(name, table, rest)
      case DropPolicyR(ifEx, name, table) => DropPolicy(name, table, ifEx != null)
      case ShowPoliciesR() => ShowPolicies
      case SetRoleR(user) => SetRole(Some(user))
      case ResetRoleR() => SetRole(None)
      case SetAuditR(mode) => SetAudit(mode.equalsIgnoreCase("ON"))
      case ShowAuditR() => ShowAudit
      case GrantR(privs, table, grantees) =>
        Grant(parsePrivs(privs), table, splitNames(grantees))
      case RevokeR(privs, table, grantees) =>
        Revoke(parsePrivs(privs), table, splitNames(grantees))
      case ShowGrantsR() => ShowGrants
      case CreateRoleR(name, perms) =>
        CreateRole(name, Option(perms).map(splitNames(_)
          .map(_.toUpperCase)).getOrElse(Nil))
      case DropRoleR(ifEx, name) => DropRole(name, ifEx != null)
      case GrantRoleR(role, users) => GrantRole(role, splitNames(users))
      case RevokeRoleR(role, users) => RevokeRole(role, splitNames(users))
      case ShowRolesR() => ShowRoles
      case SetPrivilegesR(mode) => SetPrivileges(mode.equalsIgnoreCase("ON"))
      case SetCacheR(mode) => SetCache(mode.equalsIgnoreCase("ON"))
      case ShowCacheR() => ShowCache
      case ClearCacheR() => ClearCache
      case CreateMigrationR(ver, body) =>
        val (up, down) = splitMigrationBody(body.trim)
        CreateMigration(ver, up, down)
      case MigrateR() => Migrate
      case RollbackMigrationR() => RollbackMigration
      case ShowMigrationsR() => ShowMigrations
      case SetTimeoutR(ms) => SetStatementTimeout(ms.toLong)
      case ShowMetricsR() => ShowMetrics
      case ShowStorageR(t) => ShowStorage(Option(t))
      case ShowStatsR(t) => ShowStats(t)
      case ShowHistogramR(t, c) => ShowHistogram(t, c)
      case SetSlowLogR(ms) => SetSlowLog(ms.toLong)
      case SetRateLimitR(off, qps, burst) =>
        if (off != null) SetRateLimit(None, None)
        else SetRateLimit(Some(qps.toDouble), Option(burst).map(_.toLong))
      case ShowPerfR() => ShowPerf
      case SetTraceR(on) => SetTrace(on.equalsIgnoreCase("ON"))
      case ShowTracesR() => ShowTraces
      case ShowTraceR(id) => ShowTrace(id.toLong)
      case SetEncryptionKeyR(k) => SetEncryptionKey(k)
      case SetEncryptionOffR() => SetEncryptionOff
      case SetSecurityMonitorR(on) =>
        SetSecurityMonitor(on.equalsIgnoreCase("ON"))
      case SetSecurityAutoblockR(on) =>
        SetSecurityAutoblock(on.equalsIgnoreCase("ON"))
      case ShowSecurityThreatsR() => ShowSecurityThreats
      case ShowSecurityStatsR() => ShowSecurityStats
      case ShowSessionsR() => ShowSessions
      case CreateAlertR(name, metric, op, threshold, sev) =>
        CreateAlert(name, metric.toLowerCase, op, threshold.toDouble,
          Option(sev).map(_.toUpperCase).getOrElse("WARNING"))
      case DropAlertR(ifEx, name) => DropAlert(name, ifEx != null)
      case ShowAlertsR() => ShowAlerts
      case ShowOptimizationsR() => ShowOptimizations
      case BackupR(dir, parent) => BackupDb(dir, Option(parent))
      case RestoreR(dir, seq) => RestoreDb(dir, Option(seq).map(_.toLong))
      case ShowBackupsR(dir) => ShowBackups(dir)
      case PruneBackupsR(dir, tail) =>
        val KeepR = """(?is)KEEP\s+(\d+)""".r
        val OlderR = """(?is)OLDER\s+THAN\s+(\d+)\s+DAYS?""".r
        val keeps = KeepR.findAllMatchIn(tail).map(_.group(1)).toSeq
        val olds = OlderR.findAllMatchIn(tail).map(_.group(1)).toSeq
        val dries = """(?is)DRY\s+RUN""".r.findAllMatchIn(tail).size
        if (keeps.sizeIs > 1 || olds.sizeIs > 1 || dries > 1)
          throw new IllegalArgumentException(
            "PRUNE BACKUPS: each of KEEP / OLDER THAN / DRY RUN may " +
              "appear at most once")
        if (keeps.isEmpty && olds.isEmpty)
          throw new IllegalArgumentException(
            "PRUNE BACKUPS needs a retention rule: KEEP n and/or " +
              "OLDER THAN n DAYS")
        // (\d+) admits any digit run — overflow must surface as the
        // router's clean statement error, not a NumberFormatException
        def int(s: String, what: String): Int =
          try s.toInt catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"PRUNE BACKUPS $what is out of range: $s")
          }
        val keepN = keeps.headOption.map(int(_, "KEEP"))
        // KEEP 0 would leave nothing chain-pinned and delete every
        // restore point — the retention floor is 1
        if (keepN.contains(0))
          throw new IllegalArgumentException(
            "PRUNE BACKUPS KEEP 0 would delete every restore point — " +
              "KEEP must be at least 1")
        PruneBackups(dir, keepN,
          olds.headOption.map(int(_, "OLDER THAN")), dries == 1)
      case ShowClusterR() => ShowCluster
      case VerifyBackupR(dir) => VerifyBackup(dir)
      case DropTableR(ifEx, name) => DropTable(name, ifEx != null)
      case DropViewR(ifEx, name) => DropView(name, ifEx != null)
      case TruncateR(name) => Truncate(name)
      case AlterRenameR(t, from, to) => AlterRename(t, from, to)
      case AlterAddR(t, c, ddl) => AlterAdd(t, c, ddl.trim)
      case AlterDropR(t, c) => AlterDrop(t, c)
      case InsertR(table, _, colList, body) =>
        val cols = Option(colList).map(splitTopLevel(_).map(_.trim))
        if (body.trim.toUpperCase.startsWith("VALUES"))
          InsertValues(table, cols, body.trim)
        else InsertSelect(table, cols, body.trim)
      case UpdateR(table, setPart, where) =>
        val assigns = splitTopLevel(setPart).map { a =>
          val eq = topLevelIndexOf(a, '=')
          if (eq < 0) throw new IllegalArgumentException(s"bad assignment: $a")
          (a.substring(0, eq).trim, a.substring(eq + 1).trim)
        }
        Update(table, assigns, Option(where).map(_.trim))
      case DeleteR(table, where) => Delete(table, Option(where).map(_.trim))
      case SnapshotR(table) => Snapshot(table)
      case OptimizeR(table, cols) =>
        Optimize(table, Option(cols).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
      case VacuumRetainR(table, seq) => VacuumRetain(table, seq.toLong)
      case CheckTableR(table, full) => CheckTable(table, full != null)
      case RepairTableR(table) => RepairTable(table)
      case DiffTableR(table, a, b) => DiffTable(table, a.toLong, b.toLong)
      case AnalyzeR(table) => Analyze(table)
      case ExplainR(an, fmt, inner) =>
        Explain(inner.trim, an != null,
          if (fmt == null) "text" else fmt.toLowerCase)
      case ShowTablesR() => ShowTables
      case DescribeR(table) => Describe(table)
      case CopyR(table, path, format) =>
        CopyFrom(table, path, Option(format).map(_.toLowerCase))
      case CopyToX(source, path, opts) =>
        val o = Option(opts).getOrElse("")
        CopyTo(source, path,
          CopyToFormatR.findFirstMatchIn(o).map(_.group(1).toLowerCase),
          CopyToZorderR.findFirstMatchIn(o).toSeq
            .flatMap(_.group(1).split(",")).map(_.trim).filter(_.nonEmpty))
      case BeginR() => Begin
      case CommitR() => Commit
      case RollbackR(sp) => Rollback(Option(sp))
      case SavepointR(name) => Savepoint(name)
      case ReleaseR(name) => ReleaseSavepoint(name)
    }

  private def topLevelIndexOf(s: String, c: Char): Int =
    SqlText.topLevelIndexOf(s, c)

  /** Split a migration body at the first code-position DOWN keyword —
    * a DOWN inside a string literal or comment doesn't split. */
  private def splitMigrationBody(body: String): (String, Option[String]) = {
    val code = SqlText.codeMask(body)
    val R = """(?i)\bDOWN\b""".r
    R.findAllMatchIn(body).find(m => code(m.start)) match {
      case Some(m) =>
        (body.substring(0, m.start).trim,
          Some(body.substring(m.end).trim).filter(_.nonEmpty))
      case None => (body, None)
    }
  }

  private def splitNames(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  /** Privilege list: SELECT/INSERT/UPDATE/DELETE, or ALL [PRIVILEGES]
    * (normalized to "ALL"). Unknown names are rejected here, not at
    * first enforcement. */
  private def parsePrivs(s: String): Seq[String] =
    if (s.trim.toUpperCase.startsWith("ALL")) Seq("ALL")
    else splitNames(s).map(_.toUpperCase).map { p =>
      if (Set("SELECT", "INSERT", "UPDATE", "DELETE")(p)) p
      else throw new IllegalArgumentException(s"unknown privilege: $p")
    }

  /** CREATE POLICY tail: AS/FOR/TO/USING/WITH CHECK clauses in any
    * order. USING and WITH CHECK expressions are extracted by matching
    * their parenthesis at code positions (an expr may nest parens or
    * quote them in literals), then handed verbatim to Catalyst. */
  private def parseCreatePolicy(name: String, table: String, rest0: String)
      : CreatePolicy = {
    var rest = rest0.trim
    var permissive = true
    var command = "ALL"
    var roles: Seq[String] = Nil
    var usingE: Option[String] = None
    var checkE: Option[String] = None
    val AsR = """(?is)^AS\s+(PERMISSIVE|RESTRICTIVE)\s*(.*)$""".r
    val ForR = """(?is)^FOR\s+(SELECT|INSERT|UPDATE|DELETE|ALL)\s*(.*)$""".r
    val ToR = """(?is)^TO\s+(\w+(?:\s*,\s*\w+)*)\s*(.*)$""".r
    val UsingR = """(?is)^USING\s*\(""".r
    val CheckR = """(?is)^WITH\s+CHECK\s*\(""".r
    def takeParen(prefix: scala.util.matching.Regex): Option[String] =
      prefix.findPrefixMatchOf(rest).map { m =>
        val open = m.end - 1
        val close = matchingCodeParen(rest, open)
        val e = rest.substring(open + 1, close).trim
        rest = rest.substring(close + 1).trim
        e
      }
    while (rest.nonEmpty) rest match {
      case AsR(mode, r) =>
        permissive = mode.equalsIgnoreCase("PERMISSIVE"); rest = r.trim
      case ForR(cmd, r) => command = cmd.toUpperCase; rest = r.trim
      case ToR(list, r) =>
        // TO PUBLIC ≡ no role restriction (PG; the reference's empty
        // roles vec means the same — row_level_security.rs:114-121)
        roles = list.split(",").toSeq.map(_.trim)
          .filter(x => x.nonEmpty && !x.equalsIgnoreCase("PUBLIC"))
        rest = r.trim
      case _ =>
        takeParen(UsingR).map(e => usingE = Some(e))
          .orElse(takeParen(CheckR).map(e => checkE = Some(e)))
          .getOrElse(throw new IllegalArgumentException(
            s"bad CREATE POLICY clause: $rest"))
    }
    CreatePolicy(name, table, command, roles, permissive, usingE, checkE)
  }

  /** Index of the ')' matching the '(' at `open`, counting only code
    * positions (parens inside string literals/comments don't nest). */
  private def matchingCodeParen(s: String, open: Int): Int = {
    val code = SqlText.codeMask(s)
    var depth = 0
    var i = open
    while (i < s.length) {
      if (code(i)) {
        if (s.charAt(i) == '(') depth += 1
        else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in: $s")
  }

  /** CREATE SEQUENCE options, consumed left-to-right in any order;
    * anything unrecognized is an error (sequences.rs:8-19 field set;
    * CACHE n parses and is ignored, NO MINVALUE/MAXVALUE are the
    * defaults). */
  private def parseCreateSequence(name: String, opts: String): CreateSequence = {
    var start: Option[Long] = None
    var inc: Option[Long] = None
    var min: Option[Long] = None
    var max: Option[Long] = None
    var cycle = false
    val OptR =
      ("""(?is)^(?:START(?:\s+WITH)?\s+(-?\d+)|INCREMENT(?:\s+BY)?\s+(-?\d+)|""" +
        """NO\s+MINVALUE|NO\s+MAXVALUE|NO\s+CYCLE|MINVALUE\s+(-?\d+)|""" +
        """MAXVALUE\s+(-?\d+)|CYCLE|CACHE\s+\d+)(?:\s+|$)""").r
    var rest = opts.trim
    while (rest.nonEmpty) {
      OptR.findPrefixMatchOf(rest) match {
        case Some(m) =>
          val kw = m.matched.trim.toUpperCase
          if (m.group(1) != null) start = Some(m.group(1).toLong)
          else if (m.group(2) != null) inc = Some(m.group(2).toLong)
          else if (m.group(3) != null) min = Some(m.group(3).toLong)
          else if (m.group(4) != null) max = Some(m.group(4).toLong)
          else if (kw == "CYCLE") cycle = true
          rest = rest.substring(m.end).trim
        case None =>
          throw new IllegalArgumentException(s"bad CREATE SEQUENCE option: $rest")
      }
    }
    CreateSequence(name, start, inc, min, max, cycle)
  }

  /** CREATE TABLE body: column defs with inline or trailing PRIMARY KEY
    * (both reference forms — sql_bridge.rs:5724-5949) and foreign keys
    * in both forms too — inline `col T REFERENCES t(c)`
    * (sql_bridge.rs:5738-5785) and table-level `FOREIGN KEY (col)
    * REFERENCES t(c)` (sql_bridge.rs:5799-5840). FK clauses are
    * stripped before the type DDL reaches Spark's `DataType.fromDDL`.
    * ON DELETE/UPDATE actions parse but act as RESTRICT, exactly like
    * the reference (fk.rs:20-23). */
  private def parseCreateBody(body: String)
      : (Seq[(String, String)], String, Seq[FkDef], Seq[ConstraintDef]) = {
    val parts = splitTopLevel(body)
    var pk: Option[String] = None
    val cols = Vector.newBuilder[(String, String)]
    val fks = Vector.newBuilder[FkDef]
    val cons = Vector.newBuilder[ConstraintDef]
    val PkConstraint = """(?is)^PRIMARY\s+KEY\s*\(\s*(\w+)\s*\)$""".r
    val FkConstraint =
      """(?is)^(?:CONSTRAINT\s+\w+\s+)?FOREIGN\s+KEY\s*\(\s*(\w+)\s*\)\s+REFERENCES\s+([\w.]+)\s*\(\s*(\w+)\s*\)(?:\s+ON\s+(?:DELETE|UPDATE)\s+[\w\s]+)*$""".r
    val UniqueConstraint =
      """(?is)^(?:CONSTRAINT\s+\w+\s+)?UNIQUE\s*\(\s*([\w\s,]+)\s*\)$""".r
    val CheckConstraint =
      """(?is)^(?:CONSTRAINT\s+\w+\s+)?CHECK\s*\((.*)\)$""".r
    val InlineFk =
      """(?is)\s+REFERENCES\s+([\w.]+)\s*\(\s*(\w+)\s*\)(\s+ON\s+(?:DELETE|UPDATE)\s+(?:CASCADE|RESTRICT|SET\s+NULL|SET\s+DEFAULT|NO\s+ACTION))*""".r
    val ColDef = """(?is)^(\w+)\s+(.+?)(\s+PRIMARY\s+KEY)?$""".r
    // inline column markers, peeled from the END of the def in a loop
    // so they compose in any order: `bal DOUBLE DEFAULT 0 NOT NULL
    // CHECK (bal >= 0) UNIQUE`. DEFAULT peels last (its value runs to
    // end-of-def once the markers after it are gone).
    val TrailingNotNull = """(?is)^(.+?)\s+NOT\s+NULL$""".r
    val TrailingAutoInc = """(?is)^(.+?)\s+AUTO_INCREMENT$""".r
    val TrailingUnique = """(?is)^(.+?)\s+UNIQUE$""".r
    val TrailingCheck = """(?is)^(.+?)\s+CHECK\s*\((.*)\)$""".r
    val TrailingDefault = """(?is)^(.+?)\s+DEFAULT\s+(.+)$""".r
    for (p <- parts) p match {
      case PkConstraint(k) => pk = Some(k)
      case FkConstraint(c, rt, rc) => fks += FkDef(c, rt, rc)
      case UniqueConstraint(cs) =>
        cons += UniqueDef(cs.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      case CheckConstraint(e) => cons += CheckDef(e.trim)
      case ColDef(name, typeDdl0, inlinePk) =>
        var typeDdl = typeDdl0.trim
        for (m <- InlineFk.findFirstMatchIn(typeDdl)) {
          fks += FkDef(name, m.group(1), m.group(2))
          typeDdl = InlineFk.replaceAllIn(typeDdl, "").trim
        }
        // `col T PRIMARY KEY REFERENCES t(c)`: the PK marker only
        // surfaces at the end of the def, so re-check after FK-stripping
        val TrailingPk = """(?is)(.+?)\s+PRIMARY\s+KEY$""".r
        var changed = true
        while (changed) {
          changed = true
          typeDdl match {
            case TrailingPk(ddl) => typeDdl = ddl.trim; pk = Some(name)
            case TrailingNotNull(ddl) => typeDdl = ddl.trim; cons += NotNullDef(name)
            case TrailingAutoInc(ddl) =>
              typeDdl = ddl.trim; cons += AutoIncrementDef(name)
            case TrailingUnique(ddl) => typeDdl = ddl.trim; cons += UniqueDef(Seq(name))
            case TrailingCheck(ddl, e) => typeDdl = ddl.trim; cons += CheckDef(e.trim)
            case TrailingDefault(ddl, v) =>
              typeDdl = ddl.trim; cons += DefaultDef(name, v.trim)
            case _ => changed = false
          }
        }
        cols += ((name, typeDdl))
        if (inlinePk != null) pk = Some(name)
      case other => throw new IllegalArgumentException(s"bad column def: $other")
    }
    val result = cols.result()
    (result, pk.getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE requires a PRIMARY KEY (single column, as in the reference)")),
      fks.result(), cons.result())
  }
}
