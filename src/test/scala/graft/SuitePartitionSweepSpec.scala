package graft

/** The whole-surface generalization of `PartitionInvarianceSpec`: every
  * `SparkEntry.queries` entry runs at `spark.sql.shuffle.partitions` 1 and
  * 7 (sf0.001) and must produce the same canonical result hash — the class
  * of flake the round-9 driver caught on t30 (a physical-partition
  * dependence that unit tests at one fixed parallelism can never see),
  * caught in CI instead of by the driver.
  *
  * Documented waivers — queries whose SEMANTICS are partition-dependent,
  * not implementation accidents:
  *   - a7/a7x: `approx_percentile` is a Greenwald–Khanna sketch whose
  *     merge is order-sensitive by construction (the driver gates them
  *     rows-only for the same reason; their exact twins sweep clean).
  */
class SuitePartitionSweepSpec extends SparkSuite {

  private val Waived = Set(
    "a7_approx_value_quantiles",
    "a7x_gk_error_bound")

  private def canonicalHash(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    s"${rows.length}:${md.digest().map("%02x".format(_)).mkString}"
  }

  test("every query hashes identically at shuffle.partitions 1 and 7") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(Waived)
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    try {
      val at = Seq("1", "7").map { parts =>
        spark.conf.set(key, parts)
        parts -> names.map { n =>
          val h =
            try canonicalHash(SparkEntry.queries(n)(spark, sf0001))
            catch { case scala.util.control.NonFatal(e) => s"ERROR:${e.getClass.getName}" }
          n -> h
        }.toMap
      }.toMap
      for (n <- names) {
        val h1 = at("1")(n)
        val h7 = at("7")(n)
        if (h1 != h7) failures += s"$n: parts=1 -> $h1, parts=7 -> $h7"
        if (h1.startsWith("ERROR")) failures += s"$n failed to run: $h1"
      }
    } finally spark.conf.set(key, saved)
    assert(failures.isEmpty,
      s"${failures.size} partitioning-sensitive queries:\n${failures.mkString("\n")}")
  }
}
