package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge for graft's custom
  * expressions. Spark 4 split `Column` from catalyst (Spark Connect),
  * making the direct constructors `private[sql]`; custom native
  * expressions (the extension tier below a full LogicalPlan/Strategy)
  * still need to enter the Column algebra somewhere, and this is the
  * same doorway other Spark-native libraries use. Only these two
  * one-line delegations live inside the spark namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Pin-and-count: materialize `df`'s physical RDD into persisted
    * blocks and return (pinned frame, per-partition row counts, the
    * pinned RDD for later release) — ONE job where a
    * localCheckpoint-then-count pair pays two, and at the InternalRow
    * layer so every downstream consumer (guard probes, sequence
    * assignment, the staging write) reads the blocks without Row
    * boxing. Mirrors Dataset.localCheckpoint's own internals
    * (execute → copy → persist → LogicalRDD.fromDataset); the count
    * pass is the forcing action localCheckpoint(eager) would have
    * spent on a plain count. */
  def pinCounted(df: DataFrame): (DataFrame, Array[Long], org.apache.spark.rdd.RDD[_]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitions(it => Iterator.single(it.size.toLong),
        preservesPartitioning = true)
      .collect()
    val plan = execution.LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
    (classic.Dataset.ofRows(cds.sparkSession, plan), counts, rdd)
  }

  /** pinCounted with a BOOLEAN-column tally folded into the same job:
    * returns (pinned frame, per-partition row counts, number of rows
    * whose `flagOrdinal` column is true, pinned RDD). Iterative
    * fixpoint loops (connected components, recursive CTEs) pay one
    * eager checkpoint job PLUS one convergence-probe job per round —
    * the probe answer is computable during the materialization pass,
    * so this folds the two into one job per round. */
  def pinCountedFlagged(df: DataFrame, flagOrdinal: Int)
      : (DataFrame, Array[Long], Long, org.apache.spark.rdd.RDD[_]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = rdd.mapPartitions({ it =>
      var n = 0L
      var f = 0L
      it.foreach { r =>
        n += 1
        if (!r.isNullAt(flagOrdinal) && r.getBoolean(flagOrdinal)) f += 1
      }
      Iterator.single((n, f))
    }, preservesPartitioning = true).collect()
    val plan = execution.LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
    (classic.Dataset.ofRows(cds.sparkSession, plan),
      stats.map(_._1), stats.map(_._2).sum, rdd)
  }

  /** pinCounted with a per-row ARRAY-LENGTH tally folded into the same
    * job: returns (pinned frame, per-partition row counts, Σ
    * numElements of the `arrayOrdinal` column across all rows (null
    * arrays count 0), pinned RDD). The streaming near-dup ingest pins
    * its shingled batch anyway; the total posting count decides —
    * inside the SAME materialization pass — whether the registry
    * probe's inline-key collect can possibly succeed, instead of
    * paying two always-overflowing probe jobs per batch. */
  def pinCountedSized(df: DataFrame, arrayOrdinal: Int)
      : (DataFrame, Array[Long], Long, org.apache.spark.rdd.RDD[_]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = rdd.mapPartitions({ it =>
      var n = 0L
      var elems = 0L
      it.foreach { r =>
        n += 1
        if (!r.isNullAt(arrayOrdinal))
          elems += r.getArray(arrayOrdinal).numElements().toLong
      }
      Iterator.single((n, elems))
    }, preservesPartitioning = true).collect()
    val plan = execution.LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
    (classic.Dataset.ofRows(cds.sparkSession, plan),
      stats.map(_._1), stats.map(_._2).sum, rdd)
  }

  /** pinCounted with small-batch LITERALIZATION folded into the SAME
    * job: each partition reports its row count and carries up to
    * rowCap+1 rows back with it. When the batch proves to be at or
    * under `rowCap` rows (so every partition's rows came back whole),
    * the result is a driver-resident LocalRelation — the whole
    * downstream statement then rides the literal fast path (driver
    * probe folding, job-free sequence assignment, driver-side staging
    * write) and NO pin blocks exist to track (returned RDD is None,
    * the cache is dropped immediately). Past the cap — or with
    * rowCap < 0 — behaves exactly like pinCounted. This is the floor
    * under OLTP-shaped UPDATE/DELETE statements, whose matched
    * batches are usually a handful of rows that previously paid a
    * distributed staging write each. */
  /** Total/per-partition byte ceiling for a batch that may become a
    * driver-resident LocalRelation: 1 MB embeds safely in any plan
    * (far under broadcast/task-size limits) and bounds the collect
    * regardless of per-row width. */
  val LiteralizeByteBudget: Long = 1L << 20

  def pinCountedOrLocal(df: DataFrame, rowCap: Long)
      : (DataFrame, Array[Long], Option[org.apache.spark.rdd.RDD[_]]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keep = if (rowCap < 0) 0 else rowCap.toInt + 1
    // row counts bound rows, not BYTES: a fixed-width-but-wide schema
    // (array<double> embeddings) at the row cap could ship
    // multi-GB to the driver only to be discarded. Per-partition byte
    // budget caps the carry; a partition that stops buffering reports
    // itself incomplete and the batch stays distributed. The TOTAL
    // byte gate below (round 18) additionally bounds what may become
    // a plan-embedded LocalRelation — with it, the row caps no longer
    // need to assume worst-case per-row strings, so ~1000-row short-
    // string DML batches (the OLTP scenario shape) literalize instead
    // of paying the distributed staging write.
    val byteBudget = LiteralizeByteBudget
    val fieldTypes = df.schema.fields.map(_.dataType)
    val capped = rdd.mapPartitions({ it =>
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[catalyst.InternalRow]
      // non-unsafe rows (driver-built RDD sources) carry no size; a
      // flat per-row guess could undercount wide rows past the byte
      // budget, so MEASURE them through an UnsafeProjection — the
      // converted copy is what buffers, so the budget gates the exact
      // bytes that would embed in the driver plan
      lazy val toUnsafe =
        catalyst.expressions.UnsafeProjection.create(fieldTypes)
      var n = 0L
      var bytes = 0L
      var complete = true
      it.foreach { r =>
        n += 1
        if (buf.length < keep && bytes <= byteBudget) {
          val u = r match {
            case u: catalyst.expressions.UnsafeRow => u
            case other => toUnsafe(other).copy()
          }
          bytes += u.getSizeInBytes.toLong
          if (bytes <= byteBudget) buf += u else complete = false
        } else if (n > buf.length) complete = false
      }
      Iterator.single((n, complete, bytes, buf.toArray))
    }, preservesPartitioning = true).collect()
    val counts = capped.map(_._1)
    // total rows <= cap AND total bytes within ONE budget AND every
    // partition carried ALL its rows ==> the carried arrays are the
    // whole batch and small enough to live in a driver plan — safe to
    // become the batch
    if (rowCap >= 0 && counts.sum <= rowCap &&
        capped.map(_._3).sum <= LiteralizeByteBudget &&
        capped.forall(_._2)) {
      rdd.unpersist(false)
      val attrs = catalyst.types.DataTypeUtils.toAttributes(df.schema)
      val rows = capped.iterator.flatMap(_._4).toIndexedSeq
      (classic.Dataset.ofRows(cds.sparkSession,
        catalyst.plans.logical.LocalRelation(attrs, rows)), counts, None)
    } else {
      val plan = execution.LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
      (classic.Dataset.ofRows(cds.sparkSession, plan), counts, Some(rdd))
    }
  }

  /** Driver-side single-file parquet write of a LITERAL batch — the
    * floor under OLTP-shaped statement streams. A DML batch whose
    * optimized plan is a LocalRelation lives on the driver already;
    * staging it through a Spark job pays scheduling, task launch and
    * the output-committer protocol (~100-140 ms warm) to move rows
    * that never left the driver. This writes the same parquet
    * directly with Spark's own ParquetWriteSupport under the same
    * session conf (schema, legacy format, timestamp type, rebase
    * modes, field ids), the session codec, and any per-column bloom
    * options — so readers, blooms and dtypes are indistinguishable
    * from the job path's output. The file lands in `dir` under a
    * Spark-shaped part name carrying a fresh uuid (publish renames by
    * NAME into a shared log dir) and the CODEC's true extension.
    * Returns false (nothing written) when the plan is NOT a
    * LocalRelation; callers fall back to the job write. */
  def writeLocalParquet(df: DataFrame, dir: String,
      options: Map[String, String]): Boolean = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    // a coalesce(1) over a literal batch (the small-batch single-file
    // discipline) is a no-op for a single driver-written file — see
    // through it; anything else is not driver-resident
    def localOf(p: catalyst.plans.logical.LogicalPlan)
        : Option[catalyst.plans.logical.LocalRelation] = p match {
      case lr: catalyst.plans.logical.LocalRelation => Some(lr)
      case r: catalyst.plans.logical.Repartition if !r.shuffle =>
        localOf(r.child)
      case _ => None
    }
    localOf(cds.queryExecution.optimizedPlan) match {
      case Some(lr) =>
        val spark = cds.sparkSession
        val sqlConf = spark.sessionState.conf
        val conf = spark.sessionState.newHadoopConfWithOptions(options)
        execution.datasources.parquet.ParquetWriteSupport
          .setSchema(df.schema, conf)
        conf.set(internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
          sqlConf.writeLegacyParquetFormat.toString)
        conf.set(internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
          sqlConf.parquetOutputTimestampType.toString)
        conf.set(internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
          sqlConf.parquetFieldIdWriteEnabled.toString)
        conf.set(internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
          sqlConf.getConf(internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
        conf.set(internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
          sqlConf.getConf(internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
        conf.set(internal.SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
          sqlConf.legacyParquetNanosAsLong.toString)
        conf.set(internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
          sqlConf.parquetAnnotateVariantLogicalType.toString)
        conf.set(internal.SQLConf.VARIANT_WRITE_SHREDDING_ENABLED.key,
          sqlConf.getConf(internal.SQLConf.VARIANT_WRITE_SHREDDING_ENABLED).toString)
        final class B(out: org.apache.parquet.io.OutputFile)
            extends org.apache.parquet.hadoop.ParquetWriter.Builder[
              catalyst.InternalRow, B](out) {
          override def self(): B = this
          override def getWriteSupport(c: org.apache.hadoop.conf.Configuration)
              : org.apache.parquet.hadoop.api.WriteSupport[catalyst.InternalRow] =
            new execution.datasources.parquet.ParquetWriteSupport
        }
        val codec = org.apache.parquet.hadoop.metadata.CompressionCodecName
          .fromConf(sqlConf.parquetCompressionCodec)
        val p = new org.apache.hadoop.fs.Path(dir,
          s"part-00000-${java.util.UUID.randomUUID}.c000" +
            s"${codec.getExtension}.parquet")
        var b = new B(org.apache.parquet.hadoop.util.HadoopOutputFile
            .fromPath(p, conf))
          .withConf(conf)
          .withCompressionCodec(codec)
        val bloomPrefix = "parquet.bloom.filter.enabled#"
        for ((k, v) <- options if k.startsWith(bloomPrefix))
          b = b.withBloomFilterEnabled(k.substring(bloomPrefix.length),
            v.toBoolean)
        // parquet modular encryption (round 17): a bare ParquetWriter
        // does NOT consult the crypto factory on its own (that is
        // ParquetOutputFormat's job-path wiring), so load the SAME
        // factory + KMS the job write uses from the conf whenever a
        // uniform key is requested — the driver-written file is
        // PARE-magic, fresh-data-keyed, its keys wrapped by the same
        // in-process KMS: indistinguishable from the job path's output
        if (conf.get("parquet.encryption.uniform.key") != null)
          b = b.withEncryption(
            org.apache.parquet.crypto.EncryptionPropertiesFactory
              .loadFactory(conf)
              .getFileEncryptionProperties(conf, p, null))
        val w = b.build()
        try lr.data.foreach(w.write) finally w.close()
        true
      case None => false
    }
  }

  /** Register a SQL function on an ALREADY-RUNNING session (notebooks,
    * tests). `spark.sql.extensions` is a static conf applied only at
    * session construction; this is the runtime path to the same
    * registry. */
  def registerFunction(spark: SparkSession, name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val info = new catalyst.expressions.ExpressionInfo(
      "graft.GraftExtensions", null, name, usage, "")
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
  }
}
