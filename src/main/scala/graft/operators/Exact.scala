package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine numeric comparison helpers.
  *
  * `round(sum(double), k)` is NOT reproducible across engines (or even
  * across partitionings): parallel summation reorders additions, and
  * engines disagree on decimal tie-rounding of doubles. Two exact
  * alternatives, used for every hash-compared float output:
  *
  *  - [[e]]: scaled integer rounding of a PER-ROW value —
  *    `floor(x·10^k + 0.5)`: multiply, add, floor are all exact IEEE ops,
  *    so identical input doubles give identical int64 in any engine.
  *  - [[sumE]]: scale per row with [[e]], then SUM the resulting integers —
  *    integer addition is associative, so the aggregate is independent of
  *    partitioning and summation order. (This is also the 100 TB-correct
  *    way to aggregate money.)
  */
object Exact {

  /** floor(x·10^k + 0.5) as bigint (round-half-up in exact arithmetic). */
  def e(c: Column, k: Int): Column =
    floor(c * lit(math.pow(10, k)) + lit(0.5)).cast("long")

  /** Order-independent scaled-integer sum. */
  def sumE(c: Column, k: Int): Column = sum(e(c, k))
}
