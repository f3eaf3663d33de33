package graft.analytics

import java.sql.Timestamp
import graft.SparkTestBase
import graft.model.Models.EcommerceEvent

/** Golden-value tests for the reference's own batch queries on its own
  * schema (hand-computed expectations over a small fixture).
  */
class EcommerceBatchSpec extends SparkTestBase {

  private def t(s: String) = Some(Timestamp.valueOf(s))

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      // session s1 (u1): view, view(other product), purchase 99.5 over 90s
      EcommerceEvent("u1", Some("view"), Some("p1"), t("2019-10-01 10:00:00"),
        Some("c1"), Some("electronics.phone"), Some("b"), Some("1.0"), Some("s1")),
      EcommerceEvent("u1", Some("view"), Some("p2"), t("2019-10-01 10:00:30"),
        Some("c1"), Some("electronics.phone"), Some("b"), Some("2.0"), Some("s1")),
      EcommerceEvent("u1", Some("purchase"), Some("p1"), t("2019-10-01 10:01:30"),
        Some("c1"), Some("electronics.phone"), Some("b"), Some("99.5"), Some("s1")),
      // session s2 (u1, next day): one view, home.kitchen
      EcommerceEvent("u1", Some("view"), Some("p3"), t("2019-10-02 09:00:00"),
        Some("c2"), Some("home.kitchen"), Some("b"), Some("5.0"), Some("s2")),
      // session s3 (u2): two purchases, one with null price; null category
      EcommerceEvent("u2", Some("purchase"), Some("p4"), t("2019-10-02 12:00:00"),
        Some("c3"), None, Some("b"), Some("10.25"), Some("s3")),
      EcommerceEvent("u2", Some("purchase"), Some("p4"), t("2019-10-02 12:00:10"),
        Some("c3"), None, Some("b"), None, Some("s3"))
    ).toDF()
  }

  test("session_level_df matches hand-computed golden values") {
    val out = EcommerceBatch.sessionLevel(fixture).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(out("s1") === ((90L, 3L, 2L, 1)))
    assert(out("s2") === ((0L, 1L, 1L, 0)))
    assert(out("s3") === ((10L, 2L, 1L, 1)))
  }

  test("user_level_df with favorite category and recency sentinel") {
    val out = EcommerceBatch.userEnriched(fixture).collect()
      .map(r => r.getAs[String]("user_id") -> r).toMap
    val u1 = out("u1")
    assert(u1.getAs[Long]("total_purchases") === 1L)
    assert(u1.getAs[Double]("total_spent") === 99.5)
    assert(u1.getAs[String]("favorite_category") === "electronics.phone")
    // anchor = 2019-10-02 (max date); u1's purchase on 10-01 → 1 day
    assert(u1.getAs[Int]("days_since_last_purchase") === 1)
    val u2 = out("u2")
    assert(u2.getAs[Long]("total_purchases") === 2L)
    assert(u2.getAs[Double]("total_spent") === 10.25) // null price ignored
    assert(u2.getAs[String]("favorite_category") === null) // all categories null
    assert(u2.getAs[Int]("days_since_last_purchase") === 0)
  }

  test("user with no purchases gets the -1 sentinel") {
    val s = spark
    import s.implicits._
    val noBuy = fixture.where("user_id = 'u1' AND event_type = 'view'")
    val r = EcommerceBatch.userEnriched(noBuy).collect().head
    assert(r.getAs[Long]("total_purchases") === 0L)
    assert(r.getAs[Int]("days_since_last_purchase") === -1)
    assert(r.isNullAt(r.fieldIndex("total_spent"))) // sum of empty set
  }
}
