package graft.exec

import scala.collection.mutable

/** Security monitoring / intrusion detection — the deterministic slice
  * of the reference's SecurityMonitor (security_monitor.rs:13-120
  * ThreatDetector/SessionTracker/SecurityStats, detection rules
  * :436-520, risk formula :960-995, injection signatures :976-997).
  *
  * Pure control-plane bookkeeping: O(1) driver work per statement over
  * bounded rings — no Spark jobs, no per-row work, so it costs the
  * same at 100 TB as at 100 rows. Detections:
  *
  *  - Brute force: >= `bruteForceThreshold` failed logins from one
  *    source within `bruteForceWindowMs` (security_monitor.rs:436-470,
  *    :866-886). With auto-block on, the source is blocked and the
  *    wire server refuses its connections (mitigate_threat :684-703).
  *  - SQL injection signatures: the reference's lowercase substring
  *    scan over the statement text (:976-997). graft's parameter
  *    binding already neutralizes real injection (sql/Params.scala);
  *    the monitor FLAGS the attempt pattern for review.
  *  - Data exfiltration: a statement whose affected-row count exceeds
  *    `exfilRowThreshold` (:493-519).
  *  - Session risk: failure_rate*0.3 + large-data*0.4 + many-tables*0.2
  *    + long-session*0.1, capped at 1.0 (:960-995); a session first
  *    crossing 0.7 raises a SuspiciousSession threat (:540-556).
  *
  * All clock reads go through the injectable `clockMs` so specs drive
  * windows and session durations deterministically (same discipline as
  * the rate limiter's `rateClockNs`).
  */
final class SecurityMonitor(tables: () => Seq[String]) {

  @volatile var enabled = true
  @volatile var autoBlock = false
  private[exec] var clockMs: () => Long = () => System.currentTimeMillis()

  // detection thresholds (SecurityConfig defaults, security_monitor.rs:38-52)
  private[exec] var bruteForceThreshold = 5
  private[exec] var bruteForceWindowMs = 300000L
  private[exec] var exfilRowThreshold = 100000L
  private[exec] var riskAlertThreshold = 0.7
  private[exec] var largeSessionRows = 1000000L
  private[exec] var manyTables = 10
  private[exec] var longSessionMs = 4L * 3600 * 1000

  // the reference's injection signature list (security_monitor.rs:976-997)
  private val injectionSignatures = Vector(
    "' or '1'='1", "'; drop table", "'; delete from", "union select",
    "' union select", "or 1=1", "or true", "' or true", "admin'--",
    "' or ''='")

  final case class Threat(id: Long, threatType: String, severity: String,
      source: String, user: String, signal: String)

  final case class SessionStat(id: Long, var user: String,
      var statements: Long, var failed: Long, var rowsAccessed: Long,
      tablesAccessed: mutable.LinkedHashSet[String],
      startMs: Long, var lastMs: Long, var alerted: Boolean) {
    /** The reference's risk formula (security_monitor.rs:960-995). */
    def risk: Double = {
      var r = 0.0
      if (statements > 0) r += failed.toDouble / statements * 0.3
      if (rowsAccessed > largeSessionRows) r += 0.4
      if (tablesAccessed.size > manyTables) r += 0.2
      if (lastMs - startMs > longSessionMs) r += 0.1
      math.min(r, 1.0)
    }
  }

  private val threats = mutable.ArrayDeque.empty[Threat]
  private val ThreatsMax = 1000 // bounded ring, like the slow log
  private var nextThreatId = 1L

  // source -> recent failed-login stamps (pruned to the window)
  private val loginAttempts =
    mutable.HashMap.empty[String, mutable.ArrayDeque[Long]]
  private val blockedSources = mutable.LinkedHashSet.empty[String]

  // session identity -> stats; sessions are few (one per connection)
  private val sessions =
    new java.util.IdentityHashMap[AnyRef, SessionStat]()
  private var nextSessionId = 1L

  // SecurityStats counters (security_monitor.rs:383-396)
  private var statThreats = 0L
  private var statMitigated = 0L
  private var statFailedLogins = 0L
  private var statSuspiciousQueries = 0L

  private def record(threatType: String, severity: String, source: String,
      user: String, signal: String): Unit = {
    threats.append(
      Threat(nextThreatId, threatType, severity, source, user, signal))
    nextThreatId += 1
    if (threats.size > ThreatsMax) threats.removeHead()
    statThreats += 1
  }

  /** A failed authentication from `source` (the wire server's client
    * address). Fires a BruteForceAttack threat exactly when the count
    * in the sliding window reaches the threshold — not on every
    * attempt past it, so one attack is one threat. */
  def recordFailedLogin(source: String, user: String): Unit = synchronized {
    if (!enabled) return
    val now = clockMs()
    statFailedLogins += 1
    val q = loginAttempts.getOrElseUpdate(source, mutable.ArrayDeque.empty)
    q.append(now)
    while (q.nonEmpty && q.head < now - bruteForceWindowMs) q.removeHead()
    if (q.size == bruteForceThreshold) {
      record("BruteForceAttack", "HIGH", source, user,
        s"${q.size} failed logins in ${bruteForceWindowMs / 1000}s")
      if (autoBlock && blockedSources.add(source)) statMitigated += 1
    }
  }

  /** Is this client address auto-blocked? (the wire server refuses the
    * connection before authentication). */
  def isBlocked(source: String): Boolean =
    synchronized(blockedSources.contains(source))

  /** One top-level statement, after it ran (ok or not). `sessionKey`
    * is the engine Session's identity; `affected` is the DML summary's
    * affected-row count (None for lazy reads). */
  private[exec] def recordStatement(sessionKey: AnyRef, user: String,
      text: String, ok: Boolean, affected: Option[Long]): Unit =
    synchronized {
      if (!enabled) return
      val now = clockMs()
      val s = Option(sessions.get(sessionKey)).getOrElse {
        val st = SessionStat(nextSessionId, user, 0L, 0L, 0L,
          mutable.LinkedHashSet.empty, now, now, alerted = false)
        nextSessionId += 1
        sessions.put(sessionKey, st)
        st
      }
      s.user = user
      s.lastMs = now
      s.statements += 1
      if (!ok) s.failed += 1
      affected.foreach(n => s.rowsAccessed += n)
      // table mention extraction: catalog names vs the statement's word
      // tokens — O(statement length), control-plane only
      val words = text.toLowerCase.split("[^a-z0-9_.]+").toSet
      tables().foreach(t =>
        if (words.contains(t.toLowerCase)) s.tablesAccessed += t)

      val lower = text.toLowerCase
      injectionSignatures.find(lower.contains).foreach { sig =>
        statSuspiciousQueries += 1
        record("SQLInjection", "CRITICAL", null, user, sig)
      }
      affected.filter(_ > exfilRowThreshold).foreach { n =>
        record("DataExfiltration", "MEDIUM", null, user, s"$n rows")
      }
      if (!s.alerted && s.risk > riskAlertThreshold) {
        s.alerted = true
        record("SuspiciousSession", "MEDIUM", null, user,
          f"session ${s.id} risk ${s.risk}%.2f")
      }
    }

  def threatRows: Seq[(Long, String, String, String, String, String)] =
    synchronized(threats.toSeq.map(t =>
      (t.id, t.threatType, t.severity, t.source, t.user, t.signal)))

  def sessionRows: Seq[(Long, String, Long, Long, Long, Long, Double)] =
    synchronized {
      import scala.jdk.CollectionConverters._
      sessions.values.asScala.toSeq.sortBy(_.id).map(s =>
        (s.id, s.user, s.statements, s.failed, s.rowsAccessed,
          s.tablesAccessed.size.toLong, s.risk))
    }

  def statRows: Seq[(String, Long)] = synchronized(Seq(
    "blocked_sources" -> blockedSources.size.toLong,
    "failed_login_attempts" -> statFailedLogins,
    "sessions_tracked" -> sessions.size.toLong,
    "suspicious_queries" -> statSuspiciousQueries,
    "threats_detected" -> statThreats,
    "threats_mitigated" -> statMitigated))
}
