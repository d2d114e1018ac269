package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join (backward, inclusive): each left row picks up the payload of
 * the LATEST right row with the same key and `rightTs` <= `leftTs` —
 * attribution ("the view that preceded this click"), mark-to-market
 * ("the quote in force at trade time"), config-as-of-event, etc.
 *
 * Spark has no native as-of join, and the common workarounds are wrong at
 * scale: a range join generates |L|×|R| candidates per key before the
 * per-left max, and a windowed `last()` over the union funnels a key's
 * whole history through one window frame. This operator is the plan a
 * native implementation would emit:
 *
 *   tag-and-union both sides → ONE hash shuffle on the key →
 *   sort within partitions by (key, ts, side) → single forward sweep
 *   per partition carrying exactly one pending payload per key.
 *
 * O(1) state per task beyond the sort, no window funnel, no candidate
 * blowup. The sweep is the only non-declarative step (a mapPartitions
 * pass — genuine per-partition imperative logic).
 *
 * Contract: rows with a null key or null timestamp never match (SQL
 * join-on-null semantics; unmatched left rows surface with null payload
 * columns). Equal timestamps on both sides match (inclusive). If several
 * right rows share (key, ts), the last in encounter order wins —
 * pre-aggregate the right side to one row per (key, ts) for full
 * determinism.
 */
object AsofJoin {

  /**
   * @param payloadCols right-side columns carried onto matched left rows
   *        (appended to the left schema, nullable; names must not collide
   *        with left columns — rename before joining if they do).
   */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTsCol: String, rightTsCol: String,
                   payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCols, leftTsCol, rightTsCol, payloadCols,
      forward = false)

  /** Forward (inclusive) variant: each left row picks up the EARLIEST
    * right row with `rightTs` >= `leftTs` — "the next event after this
    * point". Same single-shuffle sorted sweep, run in descending time
    * order so the pending payload is always the nearest following row. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTsCol: String, rightTsCol: String,
                  payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCols, leftTsCol, rightTsCol, payloadCols,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTsCol: String, rightTsCol: String,
                       payloadCols: Seq[String], forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    // same precedent as Layout.zOrderWrite's _z guard: a caller column
    // named like our tag/struct columns would silently collide in the
    // tagged union
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("_asof_"))
    require(reserved.isEmpty,
      s"as-of join reserves internal column names _asof_*, found: ${reserved.mkString(", ")}")
    val lSchema = left.schema
    val overlap = payloadCols.toSet.intersect(lSchema.fieldNames.toSet)
    require(overlap.isEmpty, s"payload columns collide with left columns: $overlap")
    // the union would otherwise silently coerce (e.g. date vs timestamp),
    // changing comparison semantics mid-operator
    val (lt, rt) = (lSchema(leftTsCol).dataType, right.schema(rightTsCol).dataType)
    require(lt == rt, s"timestamp column types differ: $leftTsCol is $lt, $rightTsCol is $rt")
    val lType = StructType(lSchema.fields)
    val pType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields.map(_.copy(nullable = true)))

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("_asof_ts"),
        lit(1).as("_asof_side"),
        struct(lSchema.fieldNames.map(col): _*).as("_asof_l"),
        lit(null).cast(pType).as("_asof_r")): _*)
    val rTagged = right
      .filter(col(rightTsCol).isNotNull)
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("_asof_ts"),
          lit(0).as("_asof_side"),
          lit(null).cast(lType).as("_asof_l"),
          struct(payloadCols.map(col): _*).as("_asof_r")): _*)

    val nKeys = keyCols.length
    val nPayload = pType.length
    // backward sweeps time ascending; forward sweeps descending. Either
    // way null-ts left rows sort FIRST (before any right row of their
    // key), so they emit null payloads with no explicit guard, and the
    // right-before-left tie order makes equal timestamps match
    // (inclusive).
    val tsOrder = if (forward) col("_asof_ts").desc_nulls_first
                  else col("_asof_ts").asc_nulls_first
    val parted = lTagged.unionByName(rTagged)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(
        keyCols.map(col) ++ Seq(tsOrder, col("_asof_side")): _*)

    val outSchema = StructType(lSchema.fields ++ pType.fields)
    parted.mapPartitions { it =>
      // semantic key equality: boxed Seq equality is REFERENCE equality
      // for Array[Byte] (every binary key would look new, silently
      // nulling all matches), and boxed-Double equals puts -0.0 ≠ 0.0 /
      // NaN ≠ NaN where Spark's join/grouping semantics do the opposite.
      def sameVal(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
        case (a: java.lang.Double, b: java.lang.Double) =>
          java.lang.Double.compare(a + 0.0, b + 0.0) == 0
        case (a: java.lang.Float, b: java.lang.Float) =>
          java.lang.Float.compare(a + 0.0f, b + 0.0f) == 0
        case (a, b) => a == b
      }
      def sameKey(a: Seq[Any], b: Seq[Any]): Boolean =
        a.length == b.length && a.indices.forall(i => sameVal(a(i), b(i)))
      var curKey: Seq[Any] = null
      var lastR: Row = null
      it.flatMap { row =>
        val k = (0 until nKeys).map(row.get)
        if (curKey == null || !sameKey(k, curKey)) { curKey = k; lastR = null }
        if (row.getInt(nKeys + 1) == 0) {
          // right row: becomes the pending payload unless its key is null
          if (!k.exists(_ == null)) lastR = row.getStruct(nKeys + 3)
          Iterator.empty
        } else {
          // left row: null ts sorts before every right row of its key, so
          // lastR is still null there — no explicit guard needed
          val l = row.getStruct(nKeys + 2)
          val rVals = if (lastR == null) Seq.fill[Any](nPayload)(null) else lastR.toSeq
          Iterator.single(Row.fromSeq(l.toSeq ++ rVals))
        }
      }
    }(Encoders.row(outSchema))
  }
}
