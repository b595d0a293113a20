package graft.exec

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.KmsClient

/** Encryption at rest — the Spark-native slice of the reference's
  * AES-GCM encryption layer (driftdb-core/src/encryption.rs:1-1095:
  * master key + per-object data keys). Instead of a bespoke cipher
  * stream, graft delegates to parquet modular encryption (PME, the
  * format's own spec): every page and the footer are AES-GCM
  * encrypted, each file gets fresh data keys, and the data keys are
  * wrapped by a master key served from this in-process KMS.
  *
  * The master key itself NEVER lands on disk (the key material in the
  * parquet files holds only wrapped data keys) — a reopened engine
  * must be handed the key again via `SET ENCRYPTION KEY '<base64>'`
  * before encrypted tables are readable, the same contract as the
  * reference's key-provider registry.
  */
object Encryption {

  /** The master key id embedded in file key metadata. One id per JVM
    * key registry: re-registering with a different key makes files
    * wrapped under the old key unreadable until it is restored. */
  val MasterKeyId = "graft-master"

  private val masters =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** Register a master key (16/24/32 bytes, as AES requires). Purges
    * parquet's unwrapped-key caches: a key change must not let stale
    * cached data keys keep serving reads under the OLD key's
    * authority. */
  def register(id: String, key: Array[Byte]): Unit = {
    require(Set(16, 24, 32)(key.length),
      s"master key must be 16/24/32 bytes, got ${key.length}")
    masters.put(id, key.clone())
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
  }

  /** Remove a master key AND parquet's unwrapped-key caches — without
    * the purge, files opened while the key was registered would stay
    * readable until the cache's TTL. */
  def unregister(id: String): Unit = {
    masters.remove(id)
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
  }

  private[exec] def keyFor(id: String): Array[Byte] = {
    val k = masters.get(id)
    if (k == null)
      throw new KeyAccessDeniedException(
        s"master key not registered in this process: $id — run SET ENCRYPTION KEY")
    k
  }

  /** Hadoop-conf entries that activate PME for both write and read on
    * a session. Read-side decryption is automatic once these are set
    * and the master key is registered. */
  val HadoopConf: Seq[(String, String)] = Seq(
    "parquet.crypto.factory.class" ->
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    "parquet.encryption.kms.client.class" -> classOf[GraftKmsClient].getName)
}

/** parquet-hadoop KMS bridge: wraps/unwraps PME data keys with an
  * in-process master key using AES-GCM (12-byte random IV + ciphertext,
  * base64). Registered via `parquet.encryption.kms.client.class`. */
final class GraftKmsClient extends KmsClient {

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit = ()

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String = {
    val master = Encryption.keyFor(masterKeyIdentifier)
    val iv = new Array[Byte](12)
    // default SecureRandom (urandom-backed): getInstanceStrong can
    // block indefinitely on container entropy
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(master, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    val ct = cipher.doFinal(keyBytes)
    java.util.Base64.getEncoder.encodeToString(iv ++ ct)
  }

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] = {
    val master = Encryption.keyFor(masterKeyIdentifier)
    val raw = java.util.Base64.getDecoder.decode(wrappedKey)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(master, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, raw.take(12)))
    try cipher.doFinal(raw.drop(12))
    catch {
      case e: java.security.GeneralSecurityException =>
        throw new KeyAccessDeniedException(
          s"data key unwrap failed (wrong master key?): ${e.getMessage}")
    }
  }
}
