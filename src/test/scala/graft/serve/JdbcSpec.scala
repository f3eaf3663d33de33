package graft.serve

import graft.SparkTestBase
import graft.analytics.Sessions
import org.apache.spark.sql.functions._

/** Integration tests for the JDBC serving layer (K3/K4/K5) against an
  * embedded in-memory Apache Derby database — the same engine-side JDBC
  * code paths the reference points at Postgres (spark_batch_job.py:138-148
  * overwrite of three gold tables; spark_stream.py:135-151 foreachBatch
  * append; spark_stream.py:108-133 driver-side DDL bootstrap), exercised
  * end-to-end in-process. Derby ships with Spark's jars, so no external
  * service or extra dependency is needed.
  */
class JdbcSpec extends SparkTestBase {

  // keep Derby's log out of the repo working tree
  System.setProperty("derby.stream.error.file",
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-derby.log")

  private val url = "jdbc:derby:memory:graftserve;create=true"
  private def p = {
    val props = Jdbc.props("app", "app")
    // Derby embedded ignores credentials by default; driver class matters
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    props
  }

  private val sf = "/root/testdata/sf0.001"

  test("K5: driver-side DDL bootstrap creates the reference's gold table") {
    // spark_stream.py:114-133 DDL with Derby type spellings
    // (TEXT→VARCHAR, TIMESTAMPTZ→TIMESTAMP; NUMERIC/INT/BIGINT unchanged)
    Jdbc.executeDdl(url, "app", "app",
      """CREATE TABLE user_session (
        | user_session VARCHAR(128) PRIMARY KEY,
        | user_id VARCHAR(64),
        | session_id VARCHAR(64),
        | session_start_time TIMESTAMP,
        | session_end_time TIMESTAMP,
        | session_duration_seconds BIGINT,
        | session_duration_minutes NUMERIC(10,2),
        | number_of_events INT,
        | first_product_id VARCHAR(64),
        | last_product_id VARCHAR(64),
        | first_product_category VARCHAR(64),
        | last_product_category VARCHAR(64),
        | events_json VARCHAR(4000),
        | date TIMESTAMP)""".stripMargin)
    val read = spark.read.jdbc(url, "user_session", p)
    assert(read.count() === 0)
    assert(read.columns.length === 14)
    assert(read.columns.map(_.toLowerCase).contains("session_duration_seconds"))
  }

  test("K3: overwrite writes the gold tables and replaces on rewrite") {
    // the reference's batch job overwrites three gold tables per run
    val sessions = Sessions.sessionLevel(spark, sf).limit(100).cache()
    val users = Sessions.userLevel(spark, sf).cache()
    Jdbc.overwrite(sessions, url, "session_level_df", p, numPartitions = 2)
    Jdbc.overwrite(users, url, "user_level_df", p, numPartitions = 2)
    assert(spark.read.jdbc(url, "session_level_df", p).count() === sessions.count())
    assert(spark.read.jdbc(url, "user_level_df", p).count() === users.count())

    // overwrite semantics: second write REPLACES, never accumulates
    val fewer = sessions.limit(7)
    Jdbc.overwrite(fewer, url, "session_level_df", p, numPartitions = 1)
    assert(spark.read.jdbc(url, "session_level_df", p).count() === 7)

    // round-trip value fidelity on a keyed column
    val back = spark.read.jdbc(url, "user_level_df", p)
      .select(col("user_id"), col("total_purchases"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val exp = users.select(col("user_id"), col("total_purchases"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(back === exp)
  }

  test("K4/ST7: appendBatch accumulates micro-batches exactly once each") {
    val s = spark
    import s.implicits._
    Jdbc.executeDdl(url, "app", "app",
      "CREATE TABLE stream_append (user_id VARCHAR(64), n BIGINT)")
    val b1 = Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "n")
    val b2 = Seq(("u3", 3L)).toDF("user_id", "n")
    Jdbc.appendBatch(b1, url, "stream_append", p, numPartitions = 1)
    Jdbc.appendBatch(b2, url, "stream_append", p, numPartitions = 1)
    val rows = spark.read.jdbc(url, "stream_append", p)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("u1", 1L), ("u2", 2L), ("u3", 3L)))
  }
}
