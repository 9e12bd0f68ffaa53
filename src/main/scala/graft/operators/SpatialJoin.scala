package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-zone spatial join — the downstream half of the reference's
  * raster→points pipeline (raster2points emits pixel centroids; the
  * canonical consumer aggregates them per zone: tree-cover loss per admin
  * area, emissions per tile). [[graft.Raster.zonalStats]] is the
  * uniform-grid sibling (pure GROUP BY, no zone table); this operator
  * handles ARBITRARY zone rectangles, where the naive form is a theta join
  * (point-in-box inequality) that Spark can only execute as a nested-loop
  * product. Grid bucketing makes it a KEY-EQUALITY join — the interval-join
  * technique of q08 lifted to 2-D:
  *
  *   1. each point gets ONE grid-cell key: (floor(x/cell), floor(y/cell));
  *   2. each zone bbox is exploded to EVERY cell it overlaps (a zone
  *      spanning c cells appears c times — choose `cellSize` near the
  *      median zone extent so c stays small);
  *   3. equi-join on the cell key, then the exact containment predicate
  *      filters the per-cell candidates.
  *
  * Scale posture: the shuffle is hash-partitioned on cell keys — points
  * never replicate, zone replication is bounded by ceil(w/cell)*ceil(h/cell)
  * per zone, and a dense cell is one shuffle partition's worth of work, not
  * a driver loop. With few zones AQE broadcasts the exploded zone side and
  * the points never shuffle at all. Containment is CLOSED on both edges
  * ([xmin,xmax] x [ymin,ymax]): a point on a shared boundary belongs to
  * both zones, matching the inner-join semantics of the theta-join oracle.
  */
object SpatialJoin {

  /** Points (with `xCol`,`yCol`) inner-joined to the zones whose bbox
    * contains them. Zones: (zone id column(s), xmin, ymin, xmax, ymax).
    *
    * `maxCellsPerZone` (default 1M) fails LOUDLY — in the plan, no extra
    * scan — when a zone's bbox/cellSize ratio would explode it to more
    * grid cells than that: the silent alternative is a billion-row
    * Generate from one mis-sized `cellSize` argument. Raise the limit
    * only with a cellSize chosen near the median zone extent.
    */
  def pointsInZones(
      points: DataFrame,
      zones: DataFrame,
      cellSize: Double,
      xCol: String = "x",
      yCol: String = "y",
      maxCellsPerZone: Long = 1000000L): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    // a shared column name (e.g. a zone centroid also called `x`) would
    // make the containment filter's col(xCol) ambiguous and die in an
    // opaque AnalysisException mid-plan — fail up front, self-describing
    val shared = points.columns.toSet.intersect(zones.columns.toSet)
    require(shared.isEmpty,
      s"pointsInZones: points and zones must not share column names, both " +
        s"have [${shared.toSeq.sorted.mkString(", ")}] — rename or prefix " +
        "the zone columns before joining")
    val reserved = Set("_cx", "_cy")
      .intersect(points.columns.toSet ++ zones.columns.toSet)
    require(reserved.isEmpty,
      s"pointsInZones: [${reserved.toSeq.sorted.mkString(", ")}] are " +
        "reserved working-column names — rename them first")
    def cell(c: Column): Column = floor(c / lit(cellSize)).cast("long")
    val p = points
      .withColumn("_cx", cell(col(xCol)))
      .withColumn("_cy", cell(col(yCol)))
    val nCells = (cell(col("xmax")) - cell(col("xmin")) + 1) *
      (cell(col("ymax")) - cell(col("ymin")) + 1)
    // the guard lives INSIDE the sequence bound the explode consumes — a
    // standalone guard column would be pruned away as unused (the
    // winnowedSpans npos lesson)
    val cxMaxGuarded = when(nCells <= maxCellsPerZone, cell(col("xmax")))
      .otherwise(raise_error(concat(
        lit(s"pointsInZones: a zone bbox spans more than $maxCellsPerZone " +
          s"grid cells at cellSize=$cellSize ("),
        nCells.cast("string"),
        lit(") — pick cellSize near the median zone extent or raise " +
          "maxCellsPerZone"))).cast("long"))
    val z = zones
      .withColumn("_cx", explode(sequence(cell(col("xmin")), cxMaxGuarded)))
      .withColumn("_cy", explode(sequence(cell(col("ymin")), cell(col("ymax")))))
    p.join(z, Seq("_cx", "_cy"))
      .filter(col(xCol) >= col("xmin") && col(xCol) <= col("xmax") &&
        col(yCol) >= col("ymin") && col(yCol) <= col("ymax"))
      .drop("_cx", "_cy")
  }

  /** Radius self-join — all pairs of points within Euclidean distance
    * `radius` (the near-neighbor primitive under DBSCAN, stay-point
    * detection, trajectory co-location). Cell size = radius, so every
    * qualifying pair sits in the same or an ADJACENT cell: the left side
    * is exploded to its 3x3 cell neighborhood (constant 9x replication),
    * the right side keeps its single home cell, and the equi-join on the
    * cell key bounds candidates to local density — never all-pairs. The
    * exact predicate compares SQUARED distance (no sqrt: exact arithmetic
    * on exact inputs, and monotone so the filter is equivalent). Pairs are
    * emitted once (`idCol` left < right), self-pairs excluded.
    */
  def radiusJoin(
      points: DataFrame,
      radius: Double,
      idCol: String = "pid",
      xCol: String = "x",
      yCol: String = "y"): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    def cell(c: Column): Column = floor(c / lit(radius)).cast("long")
    val offsets = Seq(-1L, 0L, 1L)
    val a = points
      .select(col(idCol).as("id_a"), col(xCol).as("x_a"), col(yCol).as("y_a"))
      .withColumn("_dx", explode(typedLit(offsets)))
      .withColumn("_dy", explode(typedLit(offsets)))
      .select(col("id_a"), col("x_a"), col("y_a"),
        (cell(col("x_a")) + col("_dx")).as("_cx"),
        (cell(col("y_a")) + col("_dy")).as("_cy"))
    val b = points
      .select(col(idCol).as("id_b"), col(xCol).as("x_b"), col(yCol).as("y_b"))
      .withColumn("_cx", cell(col("x_b")))
      .withColumn("_cy", cell(col("y_b")))
    val d2 = (col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
      (col("y_a") - col("y_b")) * (col("y_a") - col("y_b"))
    a.join(b, Seq("_cx", "_cy"))
      .filter(col("id_a") < col("id_b") && d2 <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("x_a"), col("y_a"),
        col("x_b"), col("y_b"))
  }

  /** Per-zone aggregate of a value column: n points, sum, min, max.
    * (mean = sum/n is derivable; kept out so the output stays exact
    * integer-friendly for oracle comparison.)
    */
  def zonalStats(
      points: DataFrame,
      zones: DataFrame,
      cellSize: Double,
      valueCol: String,
      zoneIdCol: String = "zone_id",
      xCol: String = "x",
      yCol: String = "y"): DataFrame =
    pointsInZones(points, zones, cellSize, xCol, yCol)
      .groupBy(col(zoneIdCol))
      .agg(count(lit(1)).as("n_points"),
        sum(col(valueCol)).as("val_sum"),
        min(col(valueCol)).as("val_min"),
        max(col(valueCol)).as("val_max"))
}
