package graft.operators

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 behavior pins (r14 verdict items 1-2): the gated grid-DBSCAN
  * pair now shares a memoized candidate stage and principalDirection
  * memoizes its d²-row scatter table — both must stay row-identical to
  * their unmemoized round-14 forms, and the memo must actually be shared
  * (the second consumer replays the persisted pack, not the corpus).
  */
class Round15OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("gated grid-DBSCAN memo path equals the unmemoized gridDbscanOf, both resolvers") {
    // same projection as the gated entries' feature stage
    val feats = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long").as("x"),
        (length(col("text")) - length(translate(col("text"), " ", "")))
          .cast("long").as("y"))
    val direct = rows(Curation.gridDbscanOf(spark, feats, 5L, 2L, 4L))
    val directStar = rows(
      Curation.gridDbscanOf(spark, feats, 5L, 2L, 4L, distributedResolve = true))
    assert(direct == directStar, "resolver equivalence (r14 pin) must hold")
    assert(rows(Curation.gridDbscan(spark, sf)) == direct,
      "q348's memoized path must equal the unmemoized driver-resolve")
    assert(rows(Curation.gridDbscanStar(spark, sf)) == direct,
      "q385's memoized path must equal the unmemoized star-resolve")
  }

  test("q348 and q385 populate ONE shared memo family — no per-resolver rebuild") {
    // output equality alone would still pass if the entries' memo keys
    // drifted apart (each rebuilding the corpus-scale candidate stage —
    // the exact r14 cost this round removes); pin the SHARING itself
    SessionMemo.invalidate(spark)
    graft.SparkEntry.queries("q385_grid_dbscan_star")(spark, sf).collect()
    val afterStar = SessionMemo.cachedKeys(spark)
    assert(afterStar.count(_.startsWith("gridDbscanShared|")) == 1,
      s"q385 must build exactly one shared family, got: $afterStar")
    graft.SparkEntry.queries("q348_grid_dbscan")(spark, sf).collect()
    val afterBoth = SessionMemo.cachedKeys(spark)
    assert(afterBoth == afterStar,
      "q348 after q385 must add NO memo entry (same family, driver " +
        s"resolve only): new keys ${afterBoth -- afterStar}")
  }

  test("principalDirection replays identically from its memoized scatter table") {
    val first = rows(Similarity.principalDirection(spark, sf))
    val again = rows(Similarity.principalDirection(spark, sf))
    assert(first == again, "memo replay must be bit-identical")
    assert(first.nonEmpty)
  }
}
