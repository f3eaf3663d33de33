package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the capability class
  * the reference never reached but a session pipeline grows into (e.g.
  * attributing purchases to ad clicks across two live streams).
  *
  * State on both sides is bounded by the watermark + the join's time range:
  * rows older than (watermark − maxDelay) are evicted. Without the range
  * condition the state would grow forever — Spark rejects that in append
  * mode, by design.
  */
object StreamJoins {

  /** Join clicks to purchases of the same user where the purchase happens
    * within [click time, click time + maxDelay]. Both inputs need the
    * named timestamp columns; output one row per (click, purchase) pair.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes",
      maxDelay: String = "30 minutes"): DataFrame = {
    val c = clicks
      .withWatermark("click_ts", watermark)
      .select(col("user_id"), col("click_ts"), col("click_id"))
    val p = purchases
      .withWatermark("purchase_ts", watermark)
      .select(col("user_id").as("p_user_id"), col("purchase_ts"),
        col("purchase_id"), col("amount"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxDelay"),
      "inner")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("amount"))
  }
}
