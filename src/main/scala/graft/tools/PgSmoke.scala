package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.analytics.Sessions
import graft.serve.Jdbc

/** One-command Postgres smoke (see tools/pg_smoke.md): exercise the JDBC
  * serving layer (K3/K4/K5) against a REAL Postgres — the type mappings
  * Derby cannot witness (TIMESTAMPTZ, TEXT, NUMERIC(10,2) round-trips).
  * NOT runnable in the offline build sandbox — requires a reachable
  * Postgres and the org.postgresql driver on the classpath; the same
  * engine-side code paths are covered in-process by JdbcSpec (Derby).
  *
  * Mirrors the reference gold path: the 14-column user_session DDL
  * (spark_stream.py:114-133), batch overwrite of the session/user gold
  * tables (spark_batch_job.py:138-148) and a foreachBatch-style append
  * (spark_stream.py:135-151).
  */
object PgSmoke {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: PgSmoke <jdbc-url> <user> <password> [sfDir]")
      sys.exit(2)
    }
    val Array(url, user, pass) = args.take(3)
    val sf = args.lift(3).getOrElse("/root/testdata/sf0.001")
    val p = Jdbc.props(user, pass)
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // K5: the reference's exact 14-column DDL with REAL Postgres types
    // (TEXT, TIMESTAMPTZ, NUMERIC(10,2)) — the part Derby cannot check
    Jdbc.executeDdl(url, user, pass, "DROP TABLE IF EXISTS user_session")
    Jdbc.executeDdl(url, user, pass,
      """CREATE TABLE user_session (
        | user_session TEXT PRIMARY KEY,
        | user_id TEXT,
        | session_id TEXT,
        | session_start_time TIMESTAMPTZ,
        | session_end_time TIMESTAMPTZ,
        | session_duration_seconds BIGINT,
        | session_duration_minutes NUMERIC(10,2),
        | number_of_events INT,
        | first_product_id TEXT,
        | last_product_id TEXT,
        | first_product_category TEXT,
        | last_product_category TEXT,
        | events_json TEXT,
        | date TIMESTAMPTZ)""".stripMargin)
    val empty = spark.read.jdbc(url, "user_session", p)
    require(empty.columns.length == 14,
      s"DDL bootstrap: expected 14 columns, got ${empty.columns.length}")
    println("[smoke] K5 DDL bootstrap OK (14 columns)")

    // K3: overwrite the gold tables; verify replace-not-accumulate and
    // TIMESTAMP/NUMERIC round-trip fidelity through Postgres types
    val sessions = Sessions.sessionLevel(spark, sf).limit(100).cache()
    Jdbc.overwrite(sessions, url, "session_level_df", p, numPartitions = 2)
    val n1 = spark.read.jdbc(url, "session_level_df", p).count()
    require(n1 == sessions.count(), s"overwrite wrote $n1 rows")
    Jdbc.overwrite(sessions.limit(7), url, "session_level_df", p,
      numPartitions = 1)
    require(spark.read.jdbc(url, "session_level_df", p).count() == 7,
      "second overwrite must REPLACE, not accumulate")
    println("[smoke] K3 overwrite OK (replace semantics hold)")

    val users = Sessions.userLevel(spark, sf).cache()
    Jdbc.overwrite(users, url, "user_level_df", p, numPartitions = 2)
    val back = spark.read.jdbc(url, "user_level_df", p)
    val exp = users.collect().map(r => r.getAs[Any]("user_id").toString ->
      r.getAs[Long]("total_purchases")).toMap
    val got = back.select(col("user_id"), col("total_purchases"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    require(got == exp, "user_level_df round-trip values diverged")
    println(s"[smoke] K3 user_level round-trip OK (${got.size} users)")

    // timestamp fidelity: session start/end survive TIMESTAMPTZ
    val tsExp = sessions
      .select(col("user_session"), col("session_start_time"))
      .collect().map(r => r.get(0).toString -> r.getTimestamp(1)).toMap
    val tsGot = spark.read.jdbc(url, "session_level_df", p)
      .select(col("user_session"), col("session_start_time"))
      .collect().map(r => r.get(0).toString -> r.getTimestamp(1)).toMap
    require(tsGot.forall { case (k, v) => tsExp.get(k).forall(_ == v) },
      "TIMESTAMPTZ round-trip shifted a session start")
    println("[smoke] TIMESTAMPTZ round-trip OK")

    // K4/ST7: foreachBatch-style appends accumulate exactly once each
    Jdbc.executeDdl(url, user, pass, "DROP TABLE IF EXISTS stream_append")
    Jdbc.executeDdl(url, user, pass,
      "CREATE TABLE stream_append (user_id TEXT, n BIGINT)")
    val s = spark
    import s.implicits._
    Jdbc.appendBatch(Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "n"),
      url, "stream_append", p, numPartitions = 1)
    Jdbc.appendBatch(Seq(("u3", 3L)).toDF("user_id", "n"),
      url, "stream_append", p, numPartitions = 1)
    val rows = spark.read.jdbc(url, "stream_append", p)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    require(rows == Set(("u1", 1L), ("u2", 2L), ("u3", 3L)),
      s"append accumulated wrong rows: $rows")
    println("[smoke] K4 foreachBatch append OK")

    spark.stop()
    println("[smoke] PASS")
  }
}
