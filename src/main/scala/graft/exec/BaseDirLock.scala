package graft.exec

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** Single-writer guard for an engine base dir — the analogue of the
  * reference's process-wide write lock (index.rs:22-26). Two engines
  * writing one base dir would read the same sequence counter and assign
  * duplicate sequences, corrupting state collapse; the lock makes the
  * second writer fail fast instead.
  *
  * The lock is a file `<baseDir>/.engine.lock` holding `engineId \t pid`
  * created with overwrite=false (atomic create-if-absent on local disk
  * and HDFS). Liveness: a lock whose pid is a dead process — or our own
  * pid with no registered in-JVM holder — is stale and is stolen;
  * anything else fails the acquire. Readers never take the lock: only
  * state-changing paths call acquire (QueryEngine.ensureWriteLock).
  */
object BaseDirLock {

  /** Live holders in THIS JVM: normalized base dir -> engine id. Needed
    * because a same-pid lock file can't distinguish a live sibling
    * engine from one that was closed or abandoned. */
  private val inJvm = new ConcurrentHashMap[String, String]()

  private def pid: Long = ProcessHandle.current().pid()

  private def lockPath(baseDir: String) = new Path(s"$baseDir/.engine.lock")
  private def key(baseDir: String): String = new Path(baseDir).toString

  private def fs(spark: SparkSession, baseDir: String) =
    lockPath(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (engineId, pid) in the lock file, if one exists and parses. */
  private def readHolder(spark: SparkSession, baseDir: String): Option[(String, Long)] = {
    val p = lockPath(baseDir)
    val f = fs(spark, baseDir)
    if (!f.exists(p)) None
    else scala.util.Try {
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val Array(id, pidStr) = text.trim.split("\t")
      (id, pidStr.toLong)
    }.toOption
  }

  private def holderAlive(holder: (String, Long)): Boolean = holder match {
    case (id, holderPid) =>
      if (holderPid == pid) inJvm.containsValue(id) // same JVM: registry decides
      else ProcessHandle.of(holderPid).map[Boolean](_.isAlive).orElse(false)
  }

  /** Is the dir locked by a LIVE engine other than `selfId`? Used by the
    * engine-open staging sweep: a live holder may be mid-COMMIT, and its
    * staging dirs must not be touched. */
  def heldByLiveOther(spark: SparkSession, baseDir: String, selfId: String): Boolean =
    readHolder(spark, baseDir).exists(h => h._1 != selfId && holderAlive(h))

  // serializes same-JVM acquires/releases completely; cross-process
  // safety additionally relies on atomic create-if-absent + the
  // verify-after-write below
  private val monitor = new Object

  /** Take the write lock, stealing a stale one. Throws if a live engine
    * holds it. */
  def acquire(spark: SparkSession, baseDir: String, engineId: String): Unit =
    monitor.synchronized {
      val f = fs(spark, baseDir)
      val p = lockPath(baseDir)
      readHolder(spark, baseDir) match {
        case Some(h) if h._1 == engineId => return // already ours
        case Some(h) if holderAlive(h) =>
          throw new IllegalStateException(
            s"base dir $baseDir is locked by live engine ${h._1} (pid ${h._2}); " +
              "close that engine or use a different base dir")
        case Some(_) => f.delete(p, false) // stale: holder is gone
        case None =>
      }
      val base = new Path(baseDir)
      if (!f.exists(base)) f.mkdirs(base)
      // atomic create-if-absent: a concurrent acquire loses the race here
      val out =
        try f.create(p, false)
        catch {
          case e: java.io.IOException =>
            throw new IllegalStateException(
              s"base dir $baseDir lock acquisition lost a race: ${e.getMessage}", e)
        }
      try out.write(s"$engineId\t$pid".getBytes(UTF_8)) finally out.close()
      // verify-after-write: two PROCESSES that both observed the same
      // stale lock can interleave delete/create so that the second
      // delete removes the first's fresh lock — whoever's id is in the
      // file now owns it, the other backs off. (Same-JVM races are fully
      // excluded by the monitor.)
      if (!readHolder(spark, baseDir).exists(_._1 == engineId))
        throw new IllegalStateException(
          s"base dir $baseDir lock acquisition lost a stale-steal race")
      inJvm.put(key(baseDir), engineId)
    }

  /** Release if held by `engineId` (idempotent). */
  def release(spark: SparkSession, baseDir: String, engineId: String): Unit =
    monitor.synchronized {
      inJvm.remove(key(baseDir), engineId)
      if (readHolder(spark, baseDir).exists(_._1 == engineId))
        fs(spark, baseDir).delete(lockPath(baseDir), false)
    }
}
