package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * `rightTs <= leftTs` in the same key group (pandas `merge_asof` /
  * kdb `aj` semantics) — event attribution, slowly-changing-dimension
  * lookup, price-at-trade joins.
  *
  * Spark-first shape: NO join at all. Both sides union into one relation
  * tagged by side, and a single window per key — ordered by (ts, side,
  * right-payload) with right rows sorting before left rows at equal
  * timestamps — carries the last non-null right payload forward
  * (`last(..., ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT ROW, a
  * running aggregate Spark evaluates streamingly, never materializing the
  * frame). One shuffle on the key, linear scan within each key group.
  * The naive alternative — a range join `l.ts >= r.ts` then max-per-left
  * dedup — builds O(|L|·|R|) intermediate pairs per key and shuffles
  * twice; this form is what a 100 TB event log needs.
  *
  * Determinism: ties among right rows at the same (key, ts) break by the
  * lexicographic order of the right payload struct (fields: rightTs, then
  * the remaining right columns in their original order) — retry-stable and
  * reproducible in plain SQL (`ORDER BY ts, side, <payload cols>`).
  * Left rows with no prior right row carry null right columns. `leftTs`
  * and `rightTs` must be mutually comparable (same type; the caller casts).
  * A `merge_asof`-style tolerance is a post-filter:
  * `when(l.ts - r_ts <= tol, ...)` on the output.
  *
  * Skew bound: each key group is ONE window partition — a single hot key
  * (one instrument carrying most of the tape) serializes onto one task.
  * When one key dominates, pre-split it on a coarse time bucket and
  * stitch the bucket boundaries with a per-(key, bucket) last-right
  * carry-forward, or accept the single-task bound if the hot key fits an
  * executor. */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "r_"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    val lPayload = left.columns.filterNot(keyCols.contains).toSeq
    val rPayload = (rightTs +: right.columns.filterNot(c =>
      keyCols.contains(c) || c == rightTs)).toSeq
    require(lPayload.nonEmpty, "left side carries no non-key columns")
    // prefixed right names must not collide with the left output (a left
    // payload column literally named e.g. "r_uts" would yield duplicate
    // output names, silently breaking downstream name-based selection)
    val outLeft = (keyCols ++ lPayload).toSet
    val clashes = rPayload.map(rightPrefix + _).filter(outLeft.contains)
    require(clashes.isEmpty,
      s"asofJoin output name collision: ${clashes.mkString(", ")} — " +
        "already present on the left side; pass a different rightPrefix")
    val rType = right.select(struct(rPayload.map(col): _*).as("__r"))
      .schema("__r").dataType
    val lType = left.select(struct(lPayload.map(col): _*).as("__l"))
      .schema("__l").dataType
    val l = left.select(keyCols.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(lPayload.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r")): _*)
    // a null right timestamp has no position on the time axis — Spark's
    // ASC-nulls-first would otherwise sort it BEFORE every left row and
    // serve it as the "earliest prior match" (diverging from merge_asof
    // and from the nulls-last plain-SQL twin); such rows can match nothing
    val r = right.where(col(rightTs).isNotNull)
      .select(keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // a null LEFT timestamp likewise has no as-of point: emit the row with
    // null right columns instead of whatever the null-first sort ordered
    // before it (rows are preserved, never silently dropped)
    out.select(keyCols.map(col) ++
      lPayload.map(c => col("__l").getField(c).as(c)) ++
      rPayload.map(c => when(col("__ts").isNotNull,
        col("__m").getField(c)).as(rightPrefix + c)): _*)
  }
}
