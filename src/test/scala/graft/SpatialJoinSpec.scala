package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def haversine(
      lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    6371.0 * 2 * math.asin(math.sqrt(a))
  }

  private def brute(
      pts: Seq[(Long, Double, Double)], r: Double, maxLat: Double) =
    (for {
      (ia, la, lo) <- pts if math.abs(la) <= maxLat
      (ib, lb, lob) <- pts if math.abs(lb) <= maxLat
      if ia < ib && haversine(la, lo, lb, lob) <= r
    } yield (ia, ib)).sorted

  test("matches brute force on random points, including the antimeridian") {
    val rnd = new scala.util.Random(3)
    val pts: Seq[(Long, Double, Double)] =
      (0 until 120).map(i =>
        (i.toLong, rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 360 - 180)) ++
        // explicit antimeridian pair ~60 km apart at lat 10
        Seq((500L, 10.0, 179.7), (501L, 10.0, -179.8),
          // and a polar-band pair that must be EXCLUDED by the contract
          (600L, 75.0, 10.0), (601L, 75.1, 10.2))
    val df = pts.toDF("id", "lat", "lon")
    val got = SpatialJoin
      .withinRadius(df, "id", "lat", "lon",
        radiusKm = 500.0, cellDeg = 10.0, maxAbsLat = 60.0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == brute(pts, 500.0, 60.0))
    assert(got.contains((500L, 501L)), "antimeridian pair must be found")
    assert(!got.exists(p => p._1 >= 600L), "beyond-band points are excluded")
  }

  test("distances are the exact haversine, pairs unique") {
    val pts = Seq((1L, 48.8566, 2.3522), (2L, 50.8503, 4.3517), // Paris-Brussels
      (3L, 45.7640, 4.8357)) // Lyon
    val rows = SpatialJoin
      .withinRadius(pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        radiusKm = 500.0, cellDeg = 10.0)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 3L)), rows.toString)
    assert(math.abs(rows((1L, 2L)) - haversine(48.8566, 2.3522, 50.8503, 4.3517)) < 1e-9)
    // Brussels-Lyon ~560 km: correctly outside
  }

  test("a non-divisor cell size is refused, not silently wrapped wrong") {
    val df = Seq((1L, 0.0, 0.0)).toDF("id", "lat", "lon")
    intercept[IllegalArgumentException] {
      SpatialJoin.withinRadius(df, "id", "lat", "lon",
        radiusKm = 100.0, cellDeg = 7.0)
    }
  }
}
