package graft.serve

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import scala.util.Try

/** Skip-gated real-Postgres smoke (VERDICT r8 item 4): exercises the
  * reference's exact 14-column `user_session` DDL (spark_stream.py:114-133)
  * and the TIMESTAMPTZ / NUMERIC(10,2) mappings Derby cannot witness
  * (JdbcSpec covers the engine-side JDBC plumbing against Derby).
  *
  * Gating: probes `psql <PG_SMOKE_PSQL> -c "SELECT 1"` and CANCELS
  * cleanly (ScalaTest `assume`) when no live server answers — so the
  * suite stays green on any machine. With a reachable server (e.g. the
  * tools/pg_smoke.md docker one, or a local cluster started via
  * `initdb -A trust -U app` + `pg_ctl -o "-p 5432 -k /tmp"`) the DDL
  * and round-trips run for real. Connection args come from
  * `PG_SMOKE_PSQL` (default `-h /tmp -p 5432 -U app -d gold` — the
  * local-socket trust setup). The Spark-JDBC write path additionally
  * needs the org.postgresql driver jar (absent in the offline sandbox);
  * that end of the smoke stays in tools/PgSmoke.scala.
  */
class PgSmokeSpec extends AnyFunSuite {

  private val psqlArgs: Seq[String] = sys.env
    .getOrElse("PG_SMOKE_PSQL", "-h /tmp -p 5432 -U app -d gold")
    .split("\\s+").toSeq

  private def psql(sql: String): Option[String] =
    Try((Seq("psql") ++ psqlArgs ++ Seq("-X", "-qAt", "-v",
      "ON_ERROR_STOP=1", "-c", sql)).!!(ProcessLogger(_ => ()))).toOption

  private def live: Boolean = psql("SELECT 1").exists(_.trim == "1")

  test("reference user_session DDL bootstraps with real Postgres types") {
    assume(live, "no reachable Postgres (set PG_SMOKE_PSQL or start one)")
    psql("DROP TABLE IF EXISTS graft_smoke_user_session")
    val ddl = """CREATE TABLE graft_smoke_user_session (
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
      | date TIMESTAMPTZ)""".stripMargin
    assert(psql(ddl).isDefined, "DDL must execute")
    val cols = psql("""SELECT column_name || ':' || data_type
      FROM information_schema.columns
      WHERE table_name = 'graft_smoke_user_session'
      ORDER BY ordinal_position""").get.trim.linesIterator.toSeq
    assert(cols.length === 14, s"14 columns, got $cols")
    assert(cols(3) === "session_start_time:timestamp with time zone")
    assert(cols(6) === "session_duration_minutes:numeric")
    psql("DROP TABLE graft_smoke_user_session")
  }

  test("TIMESTAMPTZ round-trips at microsecond fidelity under UTC") {
    assume(live, "no reachable Postgres")
    val got = psql("""SET timezone = 'UTC';
      SELECT CAST(TIMESTAMPTZ '2020-06-01 12:34:56.789012+00' AS TEXT)""").get.trim
    assert(got === "2020-06-01 12:34:56.789012+00",
      "microseconds and zone must survive (GraftSession pins UTC)")
  }

  test("NUMERIC(10,2) rounds half away from zero at insert time") {
    assume(live, "no reachable Postgres")
    // 25.005 -> 25.01 (NOT banker's 25.00): any gold-table writer must
    // pre-round 2-dp values engine-side or the stored value diverges
    // from the engine's — the exact class of silent drift the smoke is
    // for. Negative mirror: -25.005 -> -25.01.
    val got = psql("""SELECT CAST(CAST(25.005 AS NUMERIC(10,2)) AS TEXT)
      || ',' || CAST(CAST(-25.005 AS NUMERIC(10,2)) AS TEXT)""").get.trim
    assert(got === "25.01,-25.01")
  }

  test("Spark JDBC path needs org.postgresql driver (documented gate)") {
    val driver = Try(Class.forName("org.postgresql.Driver")).isSuccess
    assume(driver && live,
      "org.postgresql driver not on classpath — Spark-side smoke lives in tools/PgSmoke.scala")
    // with a driver present, the full tool is one command away; here just
    // prove the driver resolves so the gate is honest
    assert(driver)
  }
}
