package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM via Test/fork) — built
  * through [[graft.Sessions.local]] so tests run with exactly the
  * production session config + extensions (native function registry). */
object SparkSpec {
  lazy val session: SparkSession = graft.Sessions.local("4")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Smallest driver-provided SF for data-backed tests. */
  val sfDir = "/root/testdata/sf0.001"
}
