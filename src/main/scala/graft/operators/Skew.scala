package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equality joins — the fallback when AQE's
  * runtime skew-join split isn't available (e.g. the skew is known ahead of
  * time, or the build side must stay a shuffle join).
  *
  * Salting: the skewed (big) side scatters each key into `salt` sub-keys;
  * the other side replicates every row `salt` times, once per sub-key. The
  * join key becomes (key, salt_bucket), so one hot key's rows spread over
  * `salt` reducers instead of one. Replication multiplies the small side by
  * `salt` — keep it for dimension-sized right sides.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salt` buckets. Result equals the unsalted join (row-for-row).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__graft_salt"
    // per-row scatter via seeded rand(): identical duplicate rows (the
    // common cause of a hot key in raw event logs) must land in DIFFERENT
    // buckets, which a row-content hash cannot do. rand(seed) is
    // deterministic per (seed, partition, row position), so task retries
    // reproduce the same buckets given deterministic input partitioning.
    val bigSalted = big.withColumn(saltCol,
      floor(rand(20260812L) * salt).cast("int"))
    val smallReplicated = small.withColumn(saltCol,
      explode(array((0 until salt).map(lit): _*)))
    bigSalted.join(smallReplicated, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Top-n most frequent values of a column — the cheap skew probe to run
    * before choosing a mitigation (one pass + small shuffle).
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
