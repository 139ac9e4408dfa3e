package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

case class TwsIn(g: Long, cents: Long, id: Long)
case class TwsOut(g: Long, n: Long, cents_sum: Long, id_max: Long)
case class TwsState(n: Long, centsSum: Long, idMax: Long)

/** Spark 4's `transformWithState` arbitrary-stateful API, exercised
  * on the DETERMINISTIC generator stream so the result is
  * oracle-checkable — the forward-looking replacement for
  * `mapGroupsWithState` (typed `ValueState`/`ListState` handles, TTL,
  * timers, RocksDB-backed), here keeping per-group running totals
  * across micro-batches.
  *
  * The processor emits the UPDATED running totals once per group per
  * batch, so the sink's row count per group equals the number of
  * micro-batches that touched it — which the oracle pins at the
  * closed-form admission count alongside the final totals: a run that
  * collapsed into one batch, or state that failed to carry between
  * batches, both hash-mismatch.
  *
  * Scale shape: state is one small fixed record per group key in the
  * RocksDB state store (transformWithState requires that provider —
  * set for the query, restored after), update is one pass over each
  * batch's rows, and nothing is ever replayed.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, TwsIn, TwsOut] {
  @transient private var st: ValueState[TwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TwsState]("totals",
      Encoders.product[TwsState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsIn],
      timerValues: TimerValues): Iterator[TwsOut] = {
    var s = if (st.exists()) st.get() else TwsState(0L, 0L, Long.MinValue)
    rows.foreach { r =>
      s = TwsState(s.n + 1L, s.centsSum + r.cents, math.max(s.idMax, r.id))
    }
    st.update(s)
    Iterator.single(TwsOut(key, s.n, s.centsSum, s.idMax))
  }
}

object TwsStream {

  def runningTotals(spark: SparkSession, rows: Long = 100000L,
                    parts: Int = 8,
                    rowsPerBatch: Long = 30000L): DataFrame = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val name = "tws_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-tws-ckpt").toString
      // 10-key group domain: clamp the drain's shuffle width so each
      // micro-batch opens 4 RocksDB stores, not the session's 32
      val q = Clamp.withShuffleParts(spark, Clamp.BoundedDrainParts) {
        val src = spark.readStream.format("graft.sources.GenSource")
          .option("rows", rows.toString)
          .option("parts", parts.toString)
          .option("rowsPerBatch", rowsPerBatch.toString)
          .load()
          .select(($"bucket" % 10).as("g"), $"cents", $"id")
          .as[TwsIn]
        val q0 = src.groupByKey(_.g)
          .transformWithState(new RunningTotalsProcessor,
            TimeMode.None(), OutputMode.Append())
          .writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q0.awaitTermination()
        q0
      }
      q.stop()
      // final totals per group = the max (monotone) running values;
      // n_updates = emitted rows per group = batches that touched it
      val out = spark.table(name)
        .groupBy($"g")
        .agg(max($"n").as("n"),
          max($"cents_sum").as("cents_sum"),
          max($"id_max").as("id_max"),
          count(lit(1)).as("n_updates"))
        .orderBy($"g")
      val collected = out.collect()
      spark.catalog.dropTempView(name)
      spark.createDataFrame(
        spark.sparkContext.parallelize(collected.toIndexedSeq, 1),
        out.schema).orderBy($"g")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
