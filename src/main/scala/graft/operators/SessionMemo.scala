package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo of expensive, multiply-consumed curation tables
  * (LSH pair lists, resolved components, decontamination verdicts).
  *
  * Spark's CacheManager already shares InMemoryRelations between IDENTICAL
  * analyzed plans, but the composed curation queries rebuild their
  * sub-pipelines through fresh `localCheckpoint`/iteration boundaries that
  * never canonicalize equal — so q61 used to cost ~q50 + q56 even right
  * after both ran. Memoizing the RESULT DataFrame per (session, arguments)
  * lets every consumer in the session share one persisted computation;
  * results are deterministic, so sharing cannot change any query's output.
  *
  * Sessions are keyed by OBJECT IDENTITY (SparkSession does not override
  * equals), so one session's cache can never answer another's — unlike a
  * hash-derived string key, which could collide. A WeakHashMap would NOT
  * reclaim anything here: the memoized DataFrames strongly reference
  * their own session (value → key), which pins WeakHashMap entries
  * forever. Instead the per-session maps live in a small access-ordered
  * LRU (64 sessions); an evicted session's tables are unpersisted — any
  * still-held DataFrame stays correct and simply recomputes. Values are
  * persisted
  * MEMORY_AND_DISK — all memoized tables are pair/doc-count-sized, orders
  * of magnitude below the corpus. The benign race (two threads building
  * the same key once each) is accepted over `computeIfAbsent`, whose
  * reentrancy ban a nested memoized build (components → pairs) would trip;
  * the losing thread's already-persisted DataFrame is unpersisted so the
  * race cannot leak a CacheManager registration.
  *
  * ASSUMPTION: the data under a memo key (the parquet files of an sfDir)
  * is immutable for the session — keys carry the inputs' PATHS and
  * parameters, not content hashes. A session that rewrites its input
  * fixtures in place must call [[invalidate]] to drop the stale entries
  * (the specs that regenerate fixtures do exactly this).
  */
private[graft] object SessionMemo {
  private val MaxSessions = 64

  private val bySession =
    new java.util.LinkedHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, ConcurrentHashMap[String, DataFrame]]): Boolean = {
        val evict = size() > MaxSessions
        if (evict) e.getValue.forEach { (_, df) =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        }
        evict
      }
    }

  private def sessionTables(spark: SparkSession): ConcurrentHashMap[String, DataFrame] =
    bySession.synchronized {
      val existing = bySession.get(spark)
      if (existing != null) existing
      else {
        val m = new ConcurrentHashMap[String, DataFrame]()
        bySession.put(spark, m)
        m
      }
    }

  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val tables = sessionTables(spark)
    val existing = tables.get(key)
    if (existing != null) existing
    else {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = tables.putIfAbsent(key, df)
      if (prev != null) {
        // lost the benign build race: release this thread's persist so the
        // CacheManager holds exactly one registration per key
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
        prev
      } else {
        // materialize NOW and log the build cost: the cache fills with the
        // full plan output either way (InMemoryRelation doesn't prune per
        // consumer), and an attributed "[memo] built <key>" line is what
        // lets a cold-pass regression be traced to the memo that grew
        // instead of to whichever query happened to touch it first
        // (PERF.md memo-build table). Nested builds log their own lines.
        val t0 = System.nanoTime()
        try {
          val n = df.count()
          System.err.println(f"[memo] built $key: $n rows in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case _: Throwable => () } // consumer's action will re-throw
        df
      }
    }
  }

  /** Disk-backed tier over [[apply]] for the EXPENSIVE deterministic memo
    * families (LSH pair lists, decontamination verdicts, truth sets): the
    * result is published once per (code, data) fingerprint into a
    * `java.io.tmpdir` parquet cache via the race-safe publish-by-rename of
    * [[graft.lake.Lake.publishFingerprinted]], and every LATER JVM on the
    * same host reads the parquet instead of rebuilding (r11 verdict item
    * 1: the driver bench's first pass re-paid ~300 s of deterministic memo
    * builds that an earlier JVM on the same host had already done).
    *
    * Staleness safety — the cache key covers BOTH inputs of the function:
    *  - DATA: every file under `sfDir` by (name, length, mtime), one
    *    directory level deep (Spark-written table dirs list their part
    *    files; deeper nesting contributes the dir mtime);
    *  - CODE: the compiled classes' own fingerprint — the md5 of each
    *    .class file's CONTENT (relative path + bytes) under this class's
    *    code source, or of the jar's bytes when running from a jar.
    *    Content, not mtime: sbt repackages a fresh run jar per
    *    invocation, so an mtime key would never hit. Any real code
    *    change invalidates every durable entry, so a semantic change to
    *    a memo family can never be masked by a warm cache built by older
    *    code; a byte-identical repackage keeps hitting.
    *
    * Schema fidelity: the builder's schema (as-nullable) is stored in a
    * `_graft_schema.json` sidecar and replayed through `read.schema`, so
    * types round-trip exactly and an empty result still reads back with
    * its schema. Values round-trip exactly too — parquet stores the
    * binary forms of every type these memos emit (long/int/double/
    * decimal/string/array/struct; timestamps under the pinned-UTC
    * session).
    *
    * OPT-IN via the `graft.memo.durable` system property: the
    * driver-contract mains (Bench/Verify/TimeOne) enable it; tests and
    * library consumers keep the pure in-memory behavior (plan-shape
    * sweeps stay deterministic regardless of /tmp state). Any failure in
    * the durable path (unwritable tmp, exotic column name) logs and
    * falls back to the in-memory build — never to a wrong result.
    */
  def durable(spark: SparkSession, sfDir: String, key: String)(
      build: => DataFrame): DataFrame =
    if (!sys.props.get("graft.memo.durable").contains("true"))
      apply(spark, key)(build)
    else apply(spark, key) {
      // evaluated at most once: if the publish or read-back fails AFTER
      // the build ran, the fallback returns the already-built frame
      // instead of re-running the most expensive builds in the codebase
      var built: DataFrame = null
      try {
        val dest = durableDest(spark, sfDir, key)
        val destPath = new org.apache.hadoop.fs.Path(dest)
        val fs = destPath.getFileSystem(spark.sessionState.newHadoopConf())
        val done = new org.apache.hadoop.fs.Path(destPath, "_SUCCESS")
        if (!fs.exists(done)) {
          val t0 = System.nanoTime()
          graft.lake.Lake.publishFingerprinted(spark, dest) { tmp =>
            built = build
            built.write.parquet(tmp)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(tmp, SchemaSidecar), true)
            try out.write(allNullable(built.schema).json
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
          System.err.println(f"[memo] published durable $key in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s")
        } else System.err.println(s"[memo] durable hit for $key")
        val sidecar = new org.apache.hadoop.fs.Path(destPath, SchemaSidecar)
        val reader =
          if (fs.exists(sidecar)) {
            val in = fs.open(sidecar)
            val json = try {
              val buf = new java.io.ByteArrayOutputStream()
              org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 64 * 1024, false)
              buf.toString("UTF-8")
            } finally in.close()
            spark.read.schema(
              org.apache.spark.sql.types.DataType.fromJson(json)
                .asInstanceOf[org.apache.spark.sql.types.StructType])
          } else spark.read
        reader.parquet(dest)
      } catch {
        // NonFatal only: OOM/interrupt must propagate, not trigger a
        // silent full rebuild
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[memo] durable tier failed for $key " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
            (if (built != null) "serving the built frame in-memory"
             else "building in-memory"))
          if (built != null) built else build
      }
    }

  private val SchemaSidecar = "_graft_schema.json"

  /** Recursive nullable-everywhere copy (Spark's own asNullable is
    * private): the parquet reader reports nullable columns regardless, so
    * the sidecar schema must match or the scan would trust a nullability
    * the files cannot prove.
    */
  private def allNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = allNullable(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(allNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(allNullable(m.keyType), allNullable(m.valueType),
          valueContainsNull = true)
      case other => other
    }
  }

  private def allNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    allNullable(s: org.apache.spark.sql.types.DataType)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  private def md5hex(s: String): String =
    md5hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  /** `${tmpdir}/graft-memo/<md5(code+data fingerprint)>/<sanitized key>`.
    * The key tail keeps a readable prefix for humans inspecting the cache
    * plus a key hash so distinct keys can never collide post-sanitation.
    */
  private def durableDest(spark: SparkSession, sfDir: String,
      key: String): String = {
    val fp = md5hex(codeFingerprint + "\n" + dataFingerprint(spark, sfDir))
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_").take(48)
    s"${sys.props("java.io.tmpdir")}/graft-memo/$fp/$safe-${md5hex(key).take(16)}"
  }

  /** One-level-deep (name, len, mtime) listing of `sfDir`, hashed. */
  private def dataFingerprint(spark: SparkSession, sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(sfDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def line(s: org.apache.hadoop.fs.FileStatus, prefix: String): String =
      if (s.isDirectory) s"$prefix${s.getPath.getName}/:dir:${s.getModificationTime}"
      else s"$prefix${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
    val entries = fs.listStatus(p).toSeq.flatMap { c =>
      if (c.isDirectory)
        fs.listStatus(c.getPath).toSeq.map(line(_, c.getPath.getName + "/"))
      else Seq(line(c, ""))
    }.sorted
    md5hex((p.toString +: entries).mkString("\n"))
  }

  /** Fingerprint of the running code: the CONTENT hash of every .class
    * file under this class's code source (or of the jar file when running
    * from one). Content, not mtime — a no-op recompile (sbt re-stamping
    * identical bytes) must not invalidate a warm cache, and a real code
    * change always changes some class's bytes. Lazy — computed once per
    * JVM (~3 MB of class files here, tens of ms). An unreadable code
    * source yields a per-JVM token, which degrades durable to in-memory
    * semantics rather than risking a stale read — and is logged, because
    * silently rebuilding every JVM is the regression this tier fixes.
    */
  private lazy val codeFingerprint: String =
    try {
      val loc = getClass.getProtectionDomain.getCodeSource.getLocation.toURI
      val f = new java.io.File(loc)
      val fp =
        if (f.isFile) md5hex(f.getName + ":" +
          md5hex(java.nio.file.Files.readAllBytes(f.toPath)))
        else {
          import scala.jdk.CollectionConverters._
          val base = f.toPath
          val walk = java.nio.file.Files.walk(base)
          val entries = try walk.iterator().asScala
            .filter(_.toString.endsWith(".class"))
            .map { q =>
              s"${base.relativize(q)}:" +
                md5hex(java.nio.file.Files.readAllBytes(q))
            }.toSeq.sorted
          finally walk.close()
          md5hex(entries.mkString("\n"))
        }
      System.err.println(s"[memo] code fingerprint $fp from $f")
      fp
    } catch {
      case e: Throwable =>
        System.err.println("[memo] code fingerprint unavailable " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — durable cache " +
          "will not be shared across JVMs")
        s"nocode-${ProcessHandle.current().pid()}"
    }

  /** Drop (and unpersist) every memoized table of `spark` — for sessions
    * that rewrite the data under a previously-memoized sfDir in place.
    */
  def invalidate(spark: SparkSession): Unit = {
    val tables = bySession.synchronized(bySession.remove(spark))
    if (tables != null) tables.forEach { (_, df) =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
