package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join — for each left row, the most recent right row
  * at or before its timestamp with the same key. The reference engine has
  * no joins at all (SURVEY.md §2.9); this is a harness-mandated extension
  * operator Spark itself lacks as a primitive.
  *
  * Implementation is the UNION + running-carry formulation, not a range
  * join: both sides are tagged and unioned, sorted within each key
  * partition by (time, side), and a running `last(..., ignoreNulls)` over
  * the growing window carries the latest right payload forward onto every
  * left row. That costs exactly ONE shuffle of both inputs keyed on the
  * join key plus a per-key time sort — the minimum any as-of algorithm
  * needs — and never materializes candidate pairs, while a naive
  * `l.ts >= r.ts` range join explodes to O(left × right-per-key) rows
  * before its per-row argmax. Equal timestamps match inclusively (the
  * right row sorts first), the standard backward-as-of convention.
  * Several right rows sharing (key, time) resolve deterministically by
  * payload-struct order (greatest wins backward, least forward) —
  * pre-aggregate the right side per (key, time) for any other rule.
  *
  * Scale notes: the shuffle key is the join key, so one pathological key
  * (a single hot user) serializes its own partition but nothing else;
  * AQE's skew splitting cannot split a window partition, which is the
  * known cost of per-key ordered semantics in ANY engine. Payloads ride
  * the window as one struct column, evaluated once per row.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param left         driving rows; ALL its columns pass through
    * @param right        lookup rows; only `keys`, `timeCol`,
    *                     `rightPayload` are read
    * @param timeCol      timestamp/ordering column present in BOTH inputs
    * @param keys         equality join key(s)
    * @param rightPayload right columns to surface on matches (must not
    *                     collide with left column names)
    * @param tolerance    max lookback as an interval (e.g.
    *                     `expr("INTERVAL 1 HOUR")`); matches older than
    *                     `timeCol - tolerance` are nulled out, preserving
    *                     left-join row count
    * @return left rows + `rightPayload` columns + `asof_<timeCol>` (the
    *         matched right timestamp), nulls where no match qualifies
    */
  def asOfBackward(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      keys: Seq[String],
      rightPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, timeCol, keys, rightPayload, tolerance, forward = false)

  /** Forward as-of join: the EARLIEST right row at or after each left
    * row's timestamp — the mirror of [[asOfBackward]] (same plan shape:
    * one keyed shuffle, per-key sort, running carry over the following
    * frame). `tolerance` bounds the look-AHEAD: matches beyond
    * `timeCol + tolerance` are nulled out.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      keys: Seq[String],
      rightPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, timeCol, keys, rightPayload, tolerance, forward = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      timeCol: String,
      keys: Seq[String],
      rightPayload: Seq[String],
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equality key")
    val collisions = rightPayload.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"rightPayload collides with left columns: ${collisions.mkString(", ")} " +
        "— rename on the right side first")
    val payload = struct((timeCol +: rightPayload).map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
    // one unified layout; the right side nulls the left-only columns
    val lNorm = left.select(
      (keys :+ timeCol).map(col) ++ leftRest.map(col) ++ Seq(
        lit(null).cast(payloadType).as("_asof"), lit(1).as("_src")): _*)
    // SQL join semantics on dirty data: a NULL key or NULL timestamp can
    // never match. Window.partitionBy groups NULL keys together and NULL
    // times sort to the frame's visible edge, so unfiltered right rows
    // would produce matches an equi/as-of join must not emit.
    val rNorm = right
      .filter((keys :+ timeCol).map(col(_).isNotNull).reduce(_ && _))
      .select(
        (keys :+ timeCol).map(col) ++ leftRest.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
          payload.as("_asof"), lit(0).as("_src")): _*)
    // equal timestamps are inclusive in BOTH directions: the right row
    // sorts into the visible side of the frame (before the left row for
    // backward, after it for forward). The payload struct is the FINAL
    // sort key so that multiple right rows sharing (key, time) resolve
    // deterministically (greatest payload wins backward, least forward)
    // instead of by shuffle order — without it last()/first() over the
    // tie is run-dependent.
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(
        col(timeCol).asc,
        if (forward) col("_src").desc else col("_src").asc,
        col("_asof").asc)
    val carry =
      if (forward)
        first(col("_asof"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("_asof"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val carried = lNorm.unionByName(rNorm)
      .withColumn("_match", carry)
      .filter(col("_src") === 1)
    val withinTol = tolerance.map { tol =>
      if (forward) col("_match")(timeCol) <= col(timeCol) + tol
      else col("_match")(timeCol) >= col(timeCol) - tol
    }
    // a NULL-timestamped LEFT row has no position on the time axis: it
    // keeps its row (left-join contract) but matches nothing
    val inRange = withinTol match {
      case Some(p) => col("_match").isNotNull && col(timeCol).isNotNull && p
      case None    => col("_match").isNotNull && col(timeCol).isNotNull
    }
    val matchedCols = (timeCol +: rightPayload).map { c =>
      val out = if (c == timeCol) s"asof_$timeCol" else c
      when(inRange, col("_match")(c)).as(out)
    }
    carried.select(
      (keys :+ timeCol).map(col) ++ leftRest.map(col) ++ matchedCols: _*)
  }
}
