package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed shuffles.
  *
  * AQE's skew-join splitting handles most hot keys at runtime, but it only
  * applies to sort-merge join stages of batch queries — a hot key in a
  * stream-static join, or one whose skew AQE's size heuristics miss, still
  * serializes one reducer. Salting is the explicit fix: spread each fact key
  * across `buckets` sub-keys and replicate the dimension row once per
  * sub-key, so the hot key's rows land on `buckets` reducers instead of one.
  * The join result is row-identical to the unsalted join (every fact row
  * still meets exactly one copy of its dimension row), which is what makes
  * the pattern oracle-checkable.
  */
object Skew {
  /** Inner equi-join of `fact` to `dim` on `key`, salted `buckets` ways.
    *
    * `saltSrc` must be deterministic per fact row (e.g. a hash of a row id)
    * so replays and retries salt identically; it never appears in the
    * output. The dim side pays ×`buckets` replication — keep buckets at the
    * skew factor you need, not higher. The join is pinned to sort-merge:
    * a broadcast join has no per-key reducer to salt, and at the scale where
    * salting matters the dim side is past broadcast size anyway. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSrc: Column, buckets: Int): DataFrame = {
    // a null saltSrc must not drop the row (the contract is row-identity
    // with the unsalted join) — park it in bucket 0
    val fs = fact.withColumn("__salt",
      coalesce(pmod(saltSrc, lit(buckets.toLong)), lit(0L)))
    val ds = dim.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    fs.join(ds.hint("merge"), Seq(key, "__salt")).drop("__salt")
  }
}
