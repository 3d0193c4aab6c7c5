package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning hygiene helpers. */
object Partitioning {

  /** Ensure a CPU-heavy narrow pipeline gets the session's full
    * shuffle parallelism. A small single-file parquet scan yields one
    * input split, which would serialize hashing/shingling/vector math
    * onto one core; at real scale inputs arrive in many splits and this
    * is a no-op (it never *reduces* partitioning). The repartition key
    * keeps co-location meaningful for downstream aggregates. */
  def parallelize(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
