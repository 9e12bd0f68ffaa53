package graft

import graft.operators.VectorMean
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator centroids equal the posexplode/avg long form") {
    val e = Tables.embeddings(spark, sf())
    val viaAgg = e.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new VectorMean(64).toColumn.name("centroid"))
      .collect().toMap
    val viaExplode = graft.SparkEntry.queries("q41_vector_stats")(spark, sf())
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean_c")))
      .toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (label, centroid) =>
      centroid.zip(viaExplode(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 5e-5, s"label $label: $a vs rounded $b")
      }
    }
  }

  test("aggregator handles an empty group gracefully") {
    val empty = spark.emptyDataset[(Int, Array[Float])]
    val out = empty.groupByKey(_._1).mapValues(_._2)
      .agg(new VectorMean(4).toColumn).collect()
    assert(out.isEmpty)
  }
}
