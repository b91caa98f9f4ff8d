package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (analytics beyond the
  * reference's surface, exercising the same window machinery as the W1
  * carry-forward).
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMs`. One shuffle on user_id; both
    * window functions share the same spec so Catalyst evaluates them in a
    * single Window operator.
    */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val newSession =
      when(col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1L)
        .otherwise(when(lag(col("ts_ms"), 1).over(byUser).isNull, 1L).otherwise(0L))
    events
      .withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("session_id"))
  }
}
