package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.sys.process._

/** Executes EVERY `SparkEntry.oracleSql` under DuckDB (via the
  * driver-side python3 package, `tools/oracle_lint.py`) and fails if any
  * result column plans to an unnamed-width type (HUGEINT/UHUGEINT) or an
  * unaliased expression name.
  *
  * Why: DuckDB widens `sum(BIGINT)` — and any arithmetic touching such a
  * sum — to HUGEINT, and the driver's correctness hasher distinguishes
  * HUGEINT from BIGINT even when all values agree.  This exact failure
  * mode cost q-family rows in round 10 and t47/u2 in round 13 (see
  * VERDICT r13 "What's wrong" #1).  The rule this enforces: every oracle
  * output column is cast to a named SQL width.
  *
  * Cancels (does not fail) when python3+duckdb or the testdata are
  * absent, so `sbt test` stays portable to engines-only hosts.
  */
class OracleLintSpec extends SparkSuite {

  private def haveDuckdb: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  test("every oracleSql plans under DuckDB with only named-width output columns") {
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(Paths.get(sfDir)), s"no testdata at $sfDir")
    assume(Files.exists(Paths.get("tools/oracle_lint.py")), "lint script missing")
    assume(haveDuckdb, "python3+duckdb unavailable on this host")

    // the DATA-DEPENDENT oracles (centroid/model literals) only join the
    // map under an active session + sfdir prop — provide both, exactly as
    // Verify does, so the lint covers the full oracle surface. Restore
    // both afterwards: leaving the prop set would flip what every later
    // suite in this JVM observes from SparkEntry.oracleSql.
    val prevProp = System.getProperty("graft.sfdir")
    val prevSession = org.apache.spark.sql.SparkSession.getActiveSession
    System.setProperty("graft.sfdir", sfDir)
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    try {
      val oracles = SparkEntry.oracleSql
      assert(oracles.contains("v7_ivf_topk"),
        "data-dependent oracles missing — lint would silently cover only the static set")

      val json = oracles.toSeq.sortBy(_._1).map { case (k, v) =>
        // minimal JSON string escape — names are [a-z0-9_], SQL needs \ " \n
        val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "")
        s""""$k": "$esc""""
      }.mkString("{", ",\n", "}")
      val tmp = Files.createTempFile("oracle_sql", ".json")
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))

      val out = new StringBuilder
      val code = Seq("python3", "tools/oracle_lint.py", tmp.toString, sfDir)
        .!(ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n')))
      Files.deleteIfExists(tmp)
      assume(code != 3, s"lint environment problem:\n$out")
      assert(code == 0, s"oracle width-lint violations (cast every output " +
        s"column to a named SQL width):\n$out")
    } finally {
      if (prevProp == null) System.clearProperty("graft.sfdir")
      else System.setProperty("graft.sfdir", prevProp)
      prevSession match {
        case Some(s) => org.apache.spark.sql.SparkSession.setActiveSession(s)
        case None    => org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }
  }
}
