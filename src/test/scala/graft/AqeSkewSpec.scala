package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime complement to q45's manual
  * salting: for ORDINARY skew (a few hot keys, no single pathological
  * key), Spark's adaptive execution splits oversized shuffle
  * partitions at runtime and no hand-rolled salt is needed. This spec
  * pins that behavior so the scale posture documented in SURVEY §5
  * ("salting for the pathological tail, AQE for the rest") stays
  * true under config or version drift.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 90% on one hot key; right: 1k distinct keys
      val left = spark.range(200000).select(
        when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 1000).as("k"),
        col("id").as("lv"))
      val right = spark.range(1000).select(
        col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      val row = joined.collect()(0)
      // every left row matches exactly one right row
      assert(row.getAs[Long]("n") === 200000L)
      // the FINAL adaptive plan must have flagged the hot partition
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew="),
        s"expected a skew-split SMJ in the final adaptive plan:\n${finalPlan.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
