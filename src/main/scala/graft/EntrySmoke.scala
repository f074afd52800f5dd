package graft

/** Drives the driver contract's flagship [[SparkEntry.entry]] and prints
  * its row count — the smoke the driver itself performs (rows > 0). A
  * dedicated main because the `sbt console` route is brittle under the
  * unmanaged Spark jars (REPL classloader rejects `java.sql` splits). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    try println("entry rows = " + SparkEntry.entry(spark).count())
    finally spark.stop()
  }
}
