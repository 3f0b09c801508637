package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import graft.functions.expressions.TopKAgg

/** Column API over the custom Catalyst aggregates. */
object AggFunctions {

  /** Bounded-heap top-k aggregate: the k largest (value, id) pairs
    * per group as array<struct<value, id>> in (value desc, id asc)
    * order. O(k) state per group per task, merged map-side — the
    * scale-safe alternative to the window row_number form, whose
    * per-group full sort melts on hot keys (see TopKAgg scaladoc). */
  def topK(value: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKAgg(GraftSqlBridge.expression(value),
      GraftSqlBridge.expression(id), k).toAggregateExpression())
}
