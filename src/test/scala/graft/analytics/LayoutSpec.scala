package graft.analytics

import graft.SparkSpec

/** Laws for the zone-map manifest ([[Layout.zoneStats]]): the manifest
  * must partition the table exactly, and every tile's bounding box must
  * fit the aligned cell its z-prefix promises — that containment is WHY
  * a reader may prune by box intersection without scanning the tile. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val manifest = Layout.zoneStats(spark, sfDir)
    .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()

  test("zone-map rows partition the events table exactly") {
    val total = graft.Tables.events(spark, sfDir).count()
    assert(manifest.map(_._2).sum == total)
    assert(manifest.map(_._1).distinct.length == manifest.length)
    assert(manifest.length > 1, "manifest degenerated to a single tile")
  }

  test("every tile box fits the aligned cell its z-prefix promises") {
    val cb = Layout.CellBits
    val side = 1L << cb
    manifest.foreach { case (tile, _, xMin, xMax, yMin, yMax, zMin, zMax) =>
      // box inside ONE aligned 2^CellBits-square: all bits above the low
      // CellBits of x and y are fixed by the tile id
      assert(xMin >> cb == xMax >> cb,
        s"tile $tile x range [$xMin,$xMax] crosses a cell boundary")
      assert(yMin >> cb == yMax >> cb,
        s"tile $tile y range [$yMin,$yMax] crosses a cell boundary")
      assert(xMax - xMin < side && yMax - yMin < side)
      // z-range inside the tile's key interval [tile<<2cb, (tile+1)<<2cb)
      assert(zMin >> (2 * cb) == tile && zMax >> (2 * cb) == tile)
      assert(zMin <= zMax)
    }
  }

  test("a predicate box prunes to exactly the tiles whose boxes intersect it") {
    // take the densest tile's exact box as the predicate: the pruned tile
    // set must cover every in-box row, and must discard distant tiles
    val (_, n, xMin, xMax, yMin, yMax, _, _) = manifest.maxBy(_._2)
    val events = graft.Tables.events(spark, sfDir)
      .select($"user_id".as("x"),
        org.apache.spark.sql.functions.expr("ts_us div 86400000000").as("y"))
    val inBox = events
      .where($"x".between(xMin, xMax) && $"y".between(yMin, yMax)).count()
    val survivors = manifest.filter { case (_, _, xa, xb, ya, yb, _, _) =>
      xa <= xMax && xMin <= xb && ya <= yMax && yMin <= yb
    }
    // correctness: the surviving tiles cover every in-box row
    assert(survivors.map(_._2).sum >= inBox && inBox >= n)
    // effectiveness: a one-cell box must not keep the whole manifest
    assert(survivors.length < manifest.length,
      s"box predicate pruned nothing across ${manifest.length} tiles")
  }
}
