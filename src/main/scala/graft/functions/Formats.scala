package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference exact output formats (FIXTURES.md §8) as column
  * expressions — pure `concat`/`array_join` compositions, codegen'd,
  * so rendering a 100 TB result is a map-side projection feeding
  * [[graft.sources.Sinks.textLines]], never a driver loop (the
  * reference formats on the driver after collect(),
  * Assignment2/task1.py:117-126).
  */
object Formats {

  /** Python-tuple rendering of a string itemset:
    * `('a')` for singletons (the reference strips the 1-tuple's
    * trailing comma via replace(",)" → ")"), so NOT `('a',)`),
    * `('a', 'b')` for larger sets — Assignment2/task1.py:122. */
  def itemsetTuple(items: Column): Column =
    concat(lit("('"), array_join(items, "', '"), lit("')"))

  /** One line per itemset SIZE: all size-k itemsets as tuples joined
    * by "," in lexicographic order — the grouped-candidates /
    * frequent-itemsets block of Assignment2/task1.py:117-126 (the
    * write-side appends the blank separator line; the trailing comma
    * the reference builds then slices off is never emitted).
    * Input: (itemset array<string>, sz). Output: one `line` column,
    * ascending size. */
  def groupedItemsetLines(df: DataFrame): DataFrame =
    df.withColumn("t", itemsetTuple(col("itemset")))
      .groupBy(col("sz"))
      .agg(array_join(sort_array(collect_list(col("t"))), ",").as("line"))
      .orderBy(col("sz"))
      .select(col("line"))

  /** The `('u1', 'u2'), <value>` edge-betweenness line of
    * Assignment4/task2.py:117-119 — tuple repr of the (sorted) node
    * pair, then ", " and the numeric value via str(). */
  def pairValueLine(a: Column, b: Column, v: Column): Column =
    concat(lit("('"), a, lit("', '"), b, lit("'), "), v.cast("string"))
}
