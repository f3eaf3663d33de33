package graft.tools

import graft.core.GraftSession

/** Ad-hoc query profiler (dev tool): evaluates named SparkEntry queries via
  * the noop sink (so Catalyst cannot prune the projection) and prints
  * per-query wall time. Usage: Profile <sfDir> [queryName ...] — with no
  * names, runs every query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/file-listing costs must not land on the
    // first profiled query
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
