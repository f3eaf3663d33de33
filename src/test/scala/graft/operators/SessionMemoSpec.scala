package graft.operators

import graft.SparkTestBase

class SessionMemoSpec extends SparkTestBase {

  test("same session + key returns the same DataFrame; different keys build separately") {
    val s = spark
    import s.implicits._
    var builds = 0
    def build() = { builds += 1; Seq((1L, "a")).toDF("id", "v") }
    val a = SessionMemo(spark, "memo-spec-k1")(build())
    val b = SessionMemo(spark, "memo-spec-k1")(build())
    val c = SessionMemo(spark, "memo-spec-k2")(build())
    assert(a eq b, "same (session, key) must return the memoized instance")
    assert(!(a eq c))
    assert(builds === 2)
  }

  test("a different session never sees another session's entry") {
    val s = spark
    import s.implicits._
    val one = SessionMemo(spark, "memo-spec-iso")(Seq(1L).toDF("id"))
    val other = spark.newSession()
    var built = false
    val two = SessionMemo(other, "memo-spec-iso") {
      built = true
      val o = other
      import o.implicits._
      Seq(2L).toDF("id")
    }
    assert(built, "an unseen session must build its own entry")
    assert(!(one eq two))
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(two.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("memoized result is persisted so consumers share one computation") {
    val s = spark
    import s.implicits._
    val df = SessionMemo(spark, "memo-spec-persist")(Seq((1L, 2L)).toDF("a", "b"))
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk,
      s"expected a persisted storage level, got ${df.storageLevel}")
  }
}
