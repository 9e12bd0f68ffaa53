package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * A shuffle join hashes rows to reducers by key, so one hot key → one
  * overloaded reducer regardless of cluster size. Salting spreads each hot
  * key across `salts` reducers: the (large, skewed) left side gets a salt
  * in [0, salts), the (smaller) right side is replicated once per salt, and
  * the join runs on (key, salt). Result set is identical to the plain join;
  * cost is `salts`× replication of the right side — use for moderate right
  * sides when AQE's runtime skew splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default) isn't available or
  * the skew is known up front.
  */
object SkewJoin {

  def saltedInnerJoin(
      skewed: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // any per-row salt assignment is correct (it only balances load);
    // spark_partition_id + a row-local counter via monotonically_increasing_id
    // spreads rows without a shuffle of its own
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
