package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, ts, type) event log: funnel
  * conversion and cohort retention. Beyond-parity pipeline operators (the
  * reference has no event model; SURVEY.md §7.5) expressed as pure
  * aggregation cascades so they scale: no per-user event list is ever
  * materialized — a user with millions of events costs the same state as a
  * user with three (a `collect_list`-and-fold funnel would OOM on power
  * users at 100 TB).
  */
object Behavior {

  /** Ordered funnel: for each prefix of `stages`, the number of users who
    * completed that prefix in order — stage k+1 must occur strictly after
    * the user's earliest completion time of stage k (the greedy/earliest
    * matching; comparisons are on the event timestamp only, so ties on
    * identical timestamps resolve identically on any engine).
    *
    * Shape: one conditional-min hash aggregate per stage, each keyed on
    * the user, and no join ever has a data-sized build side. The per-stage
    * count branches repeat earlier stages' subtrees; identical exchanges
    * are eligible for reuse (a ReusedExchange is observed at runtime), and
    * what isn't reused is a filtered-scan + tiny aggregate per branch —
    * bounded by stages², not data. Returns (stage, event_type, users).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // reached(k): (u, t) = users who completed stages 0..k, with the
    // earliest completion timestamp of stage k.
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      events.join(prev, events(userCol) === prev("__u"))
        .filter(col(typeCol) === stage && col(tsCol) > col("__t"))
        .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    }
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _).orderBy("stage")
  }

  /** Time-boxed funnel: like [[funnel]], but each stage must follow the
    * previous one within `window` (a SQL interval literal, e.g.
    * "1 HOUR") — the "did the user click within an hour of viewing"
    * question, where the unbounded funnel overcounts lazy conversions.
    * Same greedy earliest-anchor semantics and the same per-stage
    * aggregation-cascade shape (one keyed aggregate per stage, no
    * per-user event lists); counts are monotonically ≤ the unbounded
    * funnel's stage for stage.
    */
  def funnelWindowed(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, stages: Seq[String],
                     window: String): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    val reached = stages.tail.scanLeft(first) { (prev, stage) =>
      events.join(prev, events(userCol) === prev("__u"))
        .filter(col(typeCol) === stage && col(tsCol) > col("__t") &&
          col(tsCol) <= col("__t") + expr(s"INTERVAL $window"))
        .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t"))
    }
    reached.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _).orderBy("stage")
  }

  /** Weekly cohort retention: users bucketed by the ISO week of their first
    * event; for each (cohort week, week offset), how many of that cohort
    * were active. Two aggregates and one equi-join, all keyed on the user —
    * co-partitioned, so the join adds no extra exchange. Week arithmetic
    * stays on Monday-truncated dates (exact multiples of 7 days), making
    * the offset division exact on any engine.
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val wk = date_trunc("week", col(tsCol))
    // min(week(ts)) == week(min(ts)); aggregating the truncated value keeps
    // the partial-aggregate state a single timestamp either way.
    val cohort = events.groupBy(col(userCol).as("__u"))
      .agg(min(wk).as("__cohort_wk"))
    val activity = events.select(col(userCol).as("__u"), wk.as("__wk")).distinct()
    activity.join(cohort, "__u")
      .groupBy(
        date_format(col("__cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__wk"), col("__cohort_wk")) / 7).cast("int")
          .as("week_offset"))
      // activity is distinct (u, wk) and the offset is a function of wk for
      // a fixed cohort, so each user appears once per group: plain count.
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Hourly resample with a dense time grid: per key, one row for every
    * hour between the global min and max — counts zero-filled, the hourly
    * value sum forward-filled across gaps (pandas `resample().ffill()`
    * semantics, distributed).
    *
    * Shape: one hash aggregate to hourly buckets (tiny — bounded by
    * keys × hours, not by raw events), a broadcast of the 1-row global
    * bounds, `sequence`+`explode` to build the grid without a driver loop,
    * and one window per key for the fill. The raw event table is only ever
    * touched by the first aggregate.
    */
  def resampleHourly(events: DataFrame, keyCol: String, tsCol: String,
                     valCol: String): DataFrame = {
    val w = Window.partitionBy("__k").orderBy("__hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourlyGrid(events, keyCol, tsCol, valCol)
      .select(col("__k").as(keyCol),
        date_format(col("__hr"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("__c"), lit(0L)).as("n_events"),
        last(col("__v"), ignoreNulls = true).over(w).as("value_ffill"))
      .orderBy(keyCol, "hour")
  }

  /** Hourly resample with *linear interpolation* across gaps (pandas
    * `resample().interpolate()`): a missing hour gets the straight-line
    * value between its nearest observed neighbours; hours outside the
    * key's observed span stay null (no extrapolation).
    *
    * Same dense-grid shape as [[resampleHourly]]; the fill needs two
    * frames over one (key, hour) ordering — previous and next observed
    * (value, hour) via ignore-nulls last/first — so both windows reuse a
    * single exchange + sort. The interpolation itself is one closed-form
    * IEEE expression over already-rounded hourly values (the a7_corr
    * discipline): identical operation order on any engine.
    */
  def resampleHourlyInterp(events: DataFrame, keyCol: String, tsCol: String,
                           valCol: String): DataFrame = {
    val ord = Window.partitionBy("__k").orderBy("__hr")
    val prevW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextW = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // epoch hour index: the grid is hour-truncated, so micros divide evenly
    val obsHr = when(col("__v").isNotNull, col("__hr"))
    val h = expr("unix_micros(__hr) div 3600000000")
    val ph = expr("unix_micros(__ph) div 3600000000")
    val nh = expr("unix_micros(__nh) div 3600000000")
    hourlyGrid(events, keyCol, tsCol, valCol)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(prevW))
      .withColumn("__ph", last(obsHr, ignoreNulls = true).over(prevW))
      .withColumn("__nv", first(col("__v"), ignoreNulls = true).over(nextW))
      .withColumn("__nh", first(obsHr, ignoreNulls = true).over(nextW))
      .select(col("__k").as(keyCol),
        date_format(col("__hr"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("__c"), lit(0L)).as("n_events"),
        when(col("__v").isNotNull, col("__v"))
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            round(col("__pv") + (col("__nv") - col("__pv")) *
              ((h - ph).cast("double") / (nh - ph).cast("double")), 6))
          .as("value_interp"))
      .orderBy(keyCol, "hour")
  }

  /** Shared dense-grid skeleton: hourly (count, rounded decimal value sum)
    * per key, left-joined onto the key × [global min hour, global max hour]
    * grid. Columns: (__k, __hr, __c, __v) with __c/__v null on gap hours.
    *
    * One hash aggregate to hourly buckets (tiny — bounded by keys × hours,
    * not by raw events), a broadcast of the 1-row global bounds, and
    * `sequence`+`explode` to build the grid without a driver loop; the raw
    * event table is only ever touched by the first aggregate.
    */
  private def hourlyGrid(events: DataFrame, keyCol: String, tsCol: String,
                         valCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol).as("__k"), date_trunc("hour", col(tsCol)).as("__hr"))
      .agg(count(lit(1)).as("__c"),
        // decimal sum → order-independent; round once here so the
        // fill above carries already-stable values.
        round(sum(col(valCol).cast("decimal(18,4)")).cast("double"), 6)
          .as("__v"))
    val bounds = hourly.agg(min("__hr").as("__mn"), max("__hr").as("__mx"))
    val grid = hourly.select("__k").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("__k"),
        explode(sequence(col("__mn"), col("__mx"), expr("interval 1 hour")))
          .as("__hr"))
    grid.join(hourly, Seq("__k", "__hr"), "left")
  }

  /** Trailing-`days`-day rolling distinct actives (e.g. 7-day DAU): for
    * each observed calendar day, the count of distinct users active in the
    * trailing window ending that day.
    *
    * Scale shape: collapse to day grain first ((user, day) distinct — the
    * only data-sized aggregate), then *explode each row into the `days`
    * future days it covers* and hash-aggregate on the day. That turns the
    * textbook non-equi self-join (range predicate → broadcast nested
    * loop, O(|rows|·|days|)) into one equi-shuffle with a bounded `days`×
    * fan-out; the observed-days semi-join that trims phantom trailing
    * days broadcasts a |days|-row relation. Returns (day, active_users).
    */
  def rollingDistinctUsers(events: DataFrame, userCol: String, tsCol: String,
                           days: Int = 7): DataFrame = {
    require(days >= 1, s"window must be >= 1 day, got $days")
    val du = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .distinct()
    val observed = du.select("day").distinct()
    val covered = du.select(col("__u"),
      explode(expr(s"sequence(day, date_add(day, ${days - 1}), interval 1 day)"))
        .as("day"))
    covered.join(broadcast(observed), "day")
      .groupBy("day").agg(countDistinct(col("__u")).as("active_users"))
  }

  /** First-touch attribution: credit each user's conversion to the channel
    * of their very first event (total order (ts, id) — the unique event id
    * breaks timestamp ties, so "first" is deterministic on any engine). A
    * user counts as converted if any *later* event is of `convType`; a
    * conversion that IS the first event doesn't self-attribute.
    *
    * Shape: one window pass keyed on the user (rank + first-value share
    * the same sort), one per-user aggregate on the same key (so the window
    * exchange is reused), then a channel-level aggregate over a
    * cardinality-|channels| relation. Returns (channel, n_users,
    * n_converted, conv_rate) — rate rounded to 6dp.
    */
  def firstTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                            idCol: String, typeCol: String,
                            convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val perUser = events
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(userCol))
      .agg(max(when(col("__rn") === 1, col(typeCol))).as("channel"),
        max(when(col("__rn") > 1 && col(typeCol) === convType, 1)
          .otherwise(0)).as("__conv"))
    perUser.groupBy("channel")
      .agg(count(lit(1)).as("n_users"), sum("__conv").as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_users"), 6))
  }

  /** Exponentially-weighted moving average over each key's daily series,
    * in EXACT scaled-integer arithmetic: daily totals are decimal sums
    * (order-independent) scaled to integer 1e-4 units, and each smoothing
    * step is s_i = (num·v_i + (den-num)·s_{i-1}) div den — integral floor
    * division, so the whole series is bit-identical on any engine and
    * replays as a recursive-CTE SQL oracle (doubles would drift: a float
    * EWMA is a different number on every accumulation order).
    *
    * Scale shape: ONE hash aggregate to daily grain, then the smoothing
    * runs inside a per-key sorted-array fold — keys process independently
    * (perfectly parallel) and the fold touches only that key's days
    * (bounded by the calendar, not the data; 10 years ≈ 3.7k entries).
    * No global window, no iteration, no driver state.
    *
    * Values must be non-negative (floor division on negatives differs
    * between floor- and truncation-semantics engines; daily activity
    * totals are sums of non-negative measurements).
    *
    * @return (key, day, v_scaled, ewma_scaled) — 1e-4 units, day-ordered
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, num: Long = 1, den: Long = 4): DataFrame = {
    require(num > 0 && den > num, s"alpha = num/den must be in (0,1)")
    val daily = events.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("day"))
      .agg((sum(col(valueCol).cast("decimal(18,4)")) * 10000)
        .cast("long").as("v"))
    daily.groupBy("key")
      .agg(array_sort(collect_list(struct(col("day"), col("v")))).as("__s"))
      .select(col("key"), explode(expr(
        s"""aggregate(__s,
           |  CAST(array() AS ARRAY<STRUCT<day: DATE, v: BIGINT, e: BIGINT>>),
           |  (acc, x) -> acc || array(named_struct('day', x.day, 'v', x.v,
           |    'e', CASE WHEN size(acc) = 0 THEN x.v
           |              ELSE ($num * x.v + ${den - num} *
           |                    element_at(acc, -1).e) div $den END)))""".stripMargin
      )).as("__e"))
      .select(col("key"), col("__e.day").as("day"), col("__e.v").as("v_scaled"),
        col("__e.e").as("ewma_scaled"))
      .orderBy("key", "day")
  }
}
