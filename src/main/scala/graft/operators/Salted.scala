package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed keys.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reduce
  * task. Salting splits each key into `salts` sub-keys for a first
  * partial aggregation (spreading the hot key over `salts` tasks), then
  * re-aggregates the partials by the bare key — the second shuffle
  * carries at most |keys| × salts rows. Worth it only for aggregates
  * with small partial state that compose associatively (count/sum/min/
  * max); for mean, carry (sum, count) pairs as shown in saltedAvg.
  *
  * AQE's skew-join splitting handles JOIN skew at runtime; aggregation
  * skew is already mostly absorbed by partial aggregation — explicit
  * salting matters when the per-key partial state itself is large
  * (collect_list-like) or when AQE is unavailable. Provided as the
  * documented escape hatch the 100 TB design calls for.
  */
object Salted {

  private def salted(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .withColumn("__key", key)

  /** count(*) per key, skew-spread over `salts` sub-aggregations. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    salted(df, key, salts)
      .groupBy(col("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("n"))
      .withColumnRenamed("__key", "key")

  /** avg(value) per key — partials carry (sum, count) so the final
    * merge is exact.
    */
  def saltedAvg(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    salted(df, key, salts)
      .withColumn("__v", value)
      .groupBy(col("__key"), col("__salt"))
      .agg(sum(col("__v")).as("__sum"), count(col("__v")).as("__cnt"))
      .groupBy(col("__key"))
      .agg((sum(col("__sum")) / sum(col("__cnt"))).as("avg"))
      .withColumnRenamed("__key", "key")
}
