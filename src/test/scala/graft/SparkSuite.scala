package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session via
  * getOrCreate; suites must not stop it).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // the events table carries nanosecond timestamps (see
    // RelationalOps.eventsTable)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // keep catalog/Derby droppings out of the repo working tree (the
    // warehouse dir and derby.log otherwise land at CWD = repo root)
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-test-warehouse")
    .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"
}
