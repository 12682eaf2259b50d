package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]` — same pattern as
  * `sql.GraftColumnBridge` for the sql-private surface. Bench drains
  * the async listener bus between queries so per-query
  * `executorCpuTime` sums don't bleed into the next query's window.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Run `f` over `items` in executor tasks with the driver's Hadoop
    * configuration shipped along (`SerializableConfiguration` is
    * `private[spark]` — the bridge pattern). Partition order is
    * preserved, so the collected output aligns with `items`. Used by
    * the snapshot layer's parallel footer-stats harvest: a commit of
    * 10⁴ files must not pay 10⁴ driver-sequential footer opens.
    */
  def mapPartitionsWithConf[T: scala.reflect.ClassTag](
      sc: SparkContext,
      conf: org.apache.hadoop.conf.Configuration,
      items: Seq[String], parallelism: Int)(
      f: (org.apache.hadoop.conf.Configuration, Iterator[String]) => Iterator[T])
      : Array[T] = {
    val ser = serializableConf(conf)
    sc.parallelize(items, math.max(1, parallelism))
      .mapPartitions(it => f(confOf(ser), it))
      .collect()
  }

  /** A serializable wrapper around the driver's Hadoop configuration
    * for DSv2 reader factories (`SerializableConfiguration` is
    * `private[spark]`): the snapshot change-stream reader must open
    * parquet with the SESSION's conf (s3a credentials, fs overrides),
    * not an empty default.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : java.io.Serializable with AnyRef =
    new org.apache.spark.util.SerializableConfiguration(conf)

  def confOf(ser: AnyRef): org.apache.hadoop.conf.Configuration =
    ser.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value
}
