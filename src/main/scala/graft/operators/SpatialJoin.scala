package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.masking.Masking

/** Distance self-join on coordinates without a cartesian: the classic
  * grid-bucket spatial join. Each point lands in one `cellDeg`-degree
  * cell; the LEFT side explodes into its 3×3 cell neighborhood and
  * equi-joins the right side's single cell, so every candidate pair
  * shares a cell edge — then the exact haversine predicate keeps pairs
  * within `radiusKm`. With `cellDeg` chosen ≥ the radius in degrees
  * (at French latitudes 0.5° ≈ 38 km east-west, 55 km north-south), no
  * qualifying pair can escape the neighborhood, so the join is EXACT;
  * the shuffle is keyed on cells and the fan-out is 9×, never n².
  *
  * The degenerate alternative — `join(a, b, haversine(...) < r)` — is a
  * BroadcastNestedLoopJoin over every pair: the thing the plan gate
  * bans. Reference analogue: the coordinate masking macros
  * (mask_coordinates.sql) handle points one at a time; this is the
  * pairwise question ("which services sit within r of each other") a
  * re-identification review asks about coarsened coordinates.
  */
object SpatialJoin {

  /** Pairs (id_a < id_b) within `radiusKm`, with the exact distance.
    * Rows with null/invalid coordinates, or beyond `maxAbsLat`, are
    * excluded: a fixed longitude grid shrinks toward the poles, so the
    * exactness guarantee (`lon cell width >= radius`) only holds inside
    * a stated latitude band — the require spells the contract out
    * instead of silently missing polar pairs.
    */
  def withinRadius(
      df: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      radiusKm: Double,
      cellDeg: Double = 0.5,
      maxAbsLat: Double = 60.0
  ): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0 && maxAbsLat > 0 && maxAbsLat < 90)
    require(cellDeg * 111.0 >= radiusKm,
      s"spatial join: cell $cellDeg deg (~${cellDeg * 111} km) must cover radius $radiusKm km")
    require(cellDeg * 111.0 * math.cos(math.toRadians(maxAbsLat)) >= radiusKm,
      s"spatial join: at lat $maxAbsLat the lon cell is ~" +
        s"${cellDeg * 111.0 * math.cos(math.toRadians(maxAbsLat))} km < radius $radiusKm km")
    // longitude wraps: cells are modular so the antimeridian pair
    // (-179.9, +179.9) lands in adjacent cells, not 36 apart
    val nLonCells = math.round(360.0 / cellDeg).toInt
    require(nLonCells * cellDeg == 360.0,
      s"spatial join: cellDeg $cellDeg must divide 360 for modular lon cells")
    val pts = df
      .filter(Masking.areValidCoordinates(col(latCol), col(lonCol)) &&
        abs(col(latCol).cast("double")) <= maxAbsLat)
      .select(
        col(idCol).as("id"),
        col(latCol).cast("double").as("lat"),
        col(lonCol).cast("double").as("lon"),
        floor(col(latCol).cast("double") / cellDeg).cast("long").as("cla"),
        pmod(floor((col(lonCol).cast("double") + 180.0) / cellDeg).cast("long"),
          lit(nLonCells.toLong)).as("clo"))

    val offsets = for (i <- -1 to 1; j <- -1 to 1) yield (i, j)
    val probe = pts.select(
      col("id"), col("lat"), col("lon"),
      explode(array(offsets.map { case (i, j) =>
        struct(
          (col("cla") + i).as("cla"),
          pmod(col("clo") + j, lit(nLonCells.toLong)).as("clo"))
      }: _*)).as("cell"))
      .select(col("id"), col("lat"), col("lon"),
        col("cell.cla").as("cla"), col("cell.clo").as("clo"))

    val dist = Masking.haversineDistance(
      col("a.lat"), col("a.lon"), col("b.lat"), col("b.lon"))
    probe.as("a")
      .join(
        pts.as("b"),
        col("a.cla") === col("b.cla") && col("a.clo") === col("b.clo") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        dist.as("dist_km"))
      .filter(col("dist_km") <= radiusKm)
  }
}
