package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{OutTypes, Tables}

/** x113: the bucketed-table CO-LOCATED join — the layout-level answer to the
  * fact⋈fact shuffle that q04 pays per query.
  *
  * At 100 TB the dominant cost of a repeated fact⋈fact join is re-shuffling
  * both tables on the join key EVERY query. The warehouse fix is a layout
  * decision, not a query decision: write both tables bucketed (hash-clustered
  * and sorted) on the key ONCE at ingest, and every subsequent join reads
  * co-located buckets directly — the sort-merge join's clustering requirement
  * is already satisfied by the scan, so EnsureRequirements inserts no
  * Exchange on either side (asserted in PlanSpec; BucketingSpec proves the
  * same property on lineitem⋈orders).
  *
  * The registered query performs the bucketed orders⋈customer join and
  * aggregates per market segment. Results are byte-identical to the plain
  * shuffled join — bucketing changes WHERE rows sit, never what they are —
  * so the DuckDB oracle is the ordinary join SQL.
  */
object Layout {
  private val dec = DecimalType(18, 2)

  /** One bucketed write per (sf dir, JVM): bucketing is paid once at ingest
    * and amortized over every later join — caching the write here mirrors
    * that contract, so Verify/Bench re-invocations time the shuffle-free
    * join, not a re-ingest. Table names carry the dir hash: scale factors
    * get distinct tables, and re-runs overwrite deterministically. */
  private val written = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Collision-resistant dir tag: first 16 hex chars of SHA-256(dir).
    * `String.hashCode` is 32-bit — two data dirs colliding in one
    * JVM/warehouse would overwrite each other's bucketed tables and serve
    * the wrong dir's data through the cached name pair; 64 bits of a
    * cryptographic digest makes that practically impossible. */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString

  /** A managed-table location can survive the JVM that created it (the
    * in-memory catalog dies with the session; /tmp/graft_warehouse does
    * not), and Spark refuses a managed CTAS into a non-empty orphan
    * location (LOCATION_ALREADY_EXISTS). Reset both halves: the catalog
    * entry if present, and the orphaned directory if not. */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripPrefix("//")
    val loc = new java.io.File(wh, table)
    if (loc.exists())
      org.apache.spark.network.util.JavaUtils.deleteRecursively(loc)
  }

  private[graft] def bucketedPair(spark: SparkSession, dir: String): (String, String) =
    written.getOrElseUpdate(dir, {
      val tag = dirTag(dir)
      val ord = s"x113_orders_$tag"
      val cust = s"x113_customer_$tag"
      reset(spark, ord)
      reset(spark, cust)
      Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ord)
      Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(cust)
      (ord, cust)
    })

  /** The co-located join itself, exposed for PlanSpec: hint("merge") pins the
    * sort-merge strategy (customer would broadcast at test SF — trivially
    * exchange-free and beside the point), and the 8-way bucketed scans on
    * both sides satisfy SMJ's clustering requirement with zero Exchange. */
  private[graft] def colocatedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ord, cust) = bucketedPair(spark, dir)
    spark.table(ord).hint("merge")
      .join(spark.table(cust), col("o_custkey") === col("c_custkey"))
  }

  def x113(spark: SparkSession, dir: String): DataFrame =
    colocatedJoin(spark, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           OutTypes.money(sum(col("o_totalprice").cast(dec))).as("revenue"),
           OutTypes.money(max(col("o_totalprice").cast(dec))).as("max_price"))
      .orderBy("c_mktsegment")

  /** One year-partitioned ingest per (sf dir, JVM) — x113's amortization
    * contract applied to PARTITIONED layout: directory-partition the fact
    * once, and every later query whose join or filter lands on the
    * partition column skips whole directories at planning or runtime. */
  private val partWritten = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def yearPartitionedOrders(spark: SparkSession, dir: String): String =
    partWritten.getOrElseUpdate(dir, {
      val tbl = s"x197_orders_byyear_${dirTag(dir)}"
      reset(spark, tbl)
      Tables.orders(spark, dir)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").saveAsTable(tbl)
      tbl
    })

  /** x197: DYNAMIC PARTITION PRUNING — the runtime half of data skipping
    * (x193 measures the zone-map half): the fact table is
    * directory-partitioned by order year; the query joins it to a
    * year-list that only EXISTS at runtime (the distinct years of a
    * filtered scan — not a foldable literal, so static pruning cannot
    * fire). Spark plants a `dynamicpruningexpression` in the fact scan's
    * PartitionFilters and reuses the broadcast of the dim side, so the
    * fact read touches ONLY the surviving year directories. The filter
    * here (orders before 1996) pins the dim list to {1995}: 1 of the ~7
    * partitions is read at every sf. PlanSpec-style assertion lives in
    * Round8hSpec (plan must carry dynamicpruning; results must equal the
    * oracle's plain semi-join).
    *
    * 100 TB: this is THE mechanism that turns a fact⋈dim join with a
    * selective dim filter from a full-table scan into a few directory
    * reads — zero query rewrite, pure layout + runtime pruning. */
  /** x209: PARTITION BACKFILL — dynamic partition overwrite, the lakehouse
    * reprocessing pattern (x197 covered the READ half of partitioned
    * layout; this is the WRITE half): a corrected batch containing ONLY
    * 1995 rows (every 1995 order's total bumped one cent) is written with
    * `partitionOverwriteMode=dynamic` + `insertInto`, which replaces
    * exactly the partitions PRESENT IN THE BATCH and leaves every other
    * year's directory untouched. The oracle pins that semantics: the
    * per-year rollup must equal base data with 1995-only corrections — if
    * the mode regressed to STATIC the whole table would be truncated to
    * one year and every other year's row would vanish from the output.
    *
    * Deliberately NOT amortized (contrast yearPartitionedOrders): each call
    * re-ingests then backfills, so the registered query IS the full
    * reprocessing cycle and repeated runs stay deterministic.
    *
    * 100 TB: backfill cost is proportional to the CORRECTED partitions, not
    * the table — the whole point of partition-granular overwrite; the
    * rewrite is one shuffle-free scan→write of the affected year. */
  def x209(spark: SparkSession, dir: String): DataFrame = {
    val tbl = s"x209_backfill_${dirTag(dir)}"
    reset(spark, tbl)
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
              year(col("o_orderdate")).as("o_year"))
    base.write.partitionBy("o_year").saveAsTable(tbl)
    val corrected = base.filter(col("o_year") === 1995)
      .withColumn("o_totalprice", col("o_totalprice") + lit(0.01))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try corrected.write.mode("overwrite").insertInto(tbl)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.table(tbl)
      .groupBy(col("o_year").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
           sum(round(col("o_totalprice") * 100, 0).cast("long"))
             .as("revenue_cents"))
      .orderBy("o_year")
  }

  /** x217: SMALL-FILE COMPACTION AUDIT — the maintenance op every lakehouse
    * runs weekly (Delta OPTIMIZE / Iceberg rewrite_data_files), completing
    * the layout family beside x113 bucketing, x150 z-order, x197 DPP and
    * x209 backfill. A deliberately fragmented copy of orders (64 tiny
    * files — `repartition(64)`, so the "before" file count is exact by
    * construction) is bin-pack rewritten toward a target bytes-per-file:
    * k = ceil(total_bytes / target) output files via `coalesce(k)` — NO
    * shuffle, each output task concatenates whole input files, which is
    * the real compactor's plan shape (rewrite ≠ repartition; data order
    * within files is preserved and no exchange is paid).
    *
    * Theorem-form contract (the x15/x18 device): per stage the emitted
    * (n_rows, revenue_cents) are recomputed FROM THE REWRITTEN FILES —
    * row conservation is the oracle-checkable half (both stages must equal
    * the source table, which DuckDB restates) — while the file-count
    * evidence rides the engine-computed `audit_ok` flag the oracle states
    * as TRUE: before must be exactly 64 files, after exactly k with
    * k < 64 (monotone drop). A compactor that loses or duplicates a row
    * flips the cents; one that fragments instead of packing flips the flag.
    *
    * 100 TB: listing is driver-side metadata (the table's manifest), the
    * rewrite is one scan + one write with no exchange, and k output tasks
    * each stream ~target bytes — the audit itself aggregates the rewritten
    * table once per stage. Compaction cost scales with bytes rewritten,
    * never with cluster-wide file count. */
  def x217(spark: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_compact_${dirTag(dir)}"
    val frag = s"$root/fragmented"
    val comp = s"$root/compacted"
    val targetBytes = 32L << 20
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              col("o_orderdate"))
      .repartition(64)
      .write.mode("overwrite").parquet(frag)
    def dataFiles(p: String): Array[Long] =
      new java.io.File(p).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(_.length())
    val fragSizes = dataFiles(frag)
    val k = math.max(1, math.ceil(fragSizes.sum.toDouble / targetBytes).toInt)
    spark.read.parquet(frag).coalesce(k)
      .write.mode("overwrite").parquet(comp)
    val compSizes = dataFiles(comp)
    def stage(path: String, name: String, ok: Boolean): DataFrame =
      spark.read.parquet(path).agg(
        count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents"))
        .select(lit(name).as("stage"), col("n_rows"), col("revenue_cents"),
                lit(ok).as("audit_ok"))
    stage(frag, "fragmented", fragSizes.length == 64)
      .unionByName(stage(comp, "compacted",
        compSizes.length == k && k < 64))
      .orderBy("stage")
  }

  /** x234: DICTIONARY-ENCODING ADVISOR — the column-level storage audit a
    * lakehouse writer consults before (re)encoding a table: per audited
    * string column, exact (n, ndv, plain bytes) plus a fixed-slot
    * dictionary cost model — ndv·max_len value storage + ⌈n·bits/8⌉ index
    * storage with bits = ⌈log₂ ndv⌉ — and the resulting recommendation.
    * The cost ratio is reported as `dict_cost_ppm` (dict·10⁶ DIV plain):
    * strictly positive, so the floor-div semantics can never straddle the
    * truncate-vs-floor divergence a signed saving would hit (Spark DIV
    * truncates toward zero, DuckDB // floors). ⌈log₂⌉ is an integer CASE
    * ladder (Σ [ndv > 2^k]), never a float log. documents.text is in the
    * audit precisely so one column recommends 'plain' — an advisor that
    * can only ever say 'dict' isn't advising.
    *
    * 100 TB: ONE scan per table computes every column's aggregates —
    * the multi-distinct aggregate rides Spark's Expand (row multiplication
    * by #distinct groups, still a single pass + partial aggregation); the
    * reshape to per-column rows happens on the 1-row aggregate. At real
    * scale the same audit swaps countDistinct for approx_count_distinct
    * per column — the advisor needs magnitude, not exactness; here
    * exactness is what makes the key oracle-checkable. */
  /** The audited (table, string columns) list — ONE shared val: the engine
    * iterates it and the oracle SQL is GENERATED from it (the x215/x223
    * device), so adding a column to the audit is a one-line change that
    * cannot desynchronize the two sides. */
  val encodingAuditCols: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderstatus", "o_orderpriority"),
    "lineitem" -> Seq("l_returnflag", "l_linestatus"),
    "part" -> Seq("p_brand", "p_type", "p_name"),
    "customer" -> Seq("c_mktsegment"),
    "documents" -> Seq("text"))

  def x234(spark: SparkSession, dir: String): DataFrame = {
    def colStats(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"n_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        sum(expr(s"octet_length($c)").cast("long")).as(s"pb_$c"),
        max(expr(s"octet_length($c)").cast("long")).as(s"ml_$c")))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c => struct(
          lit(c).as("col"), col(s"n_$c").as("n"), col(s"ndv_$c").as("ndv"),
          col(s"pb_$c").as("plain_bytes"), col(s"ml_$c").as("max_len"))): _*))
          .as("s"))
        .select(lit(table).as("tbl"), col("s.col").as("col"), col("s.n").as("n"),
                col("s.ndv").as("ndv"), col("s.plain_bytes").as("plain_bytes"),
                col("s.max_len").as("max_len"))
    }
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "orders" -> (Tables.orders _), "lineitem" -> (Tables.lineitem _),
      "part" -> (Tables.part _), "customer" -> (Tables.customer _),
      "documents" -> (Tables.documents _))
    encodingAuditCols
      .map { case (t, cols) => colStats(loaders(t)(spark, dir), t, cols) }
      .reduce(_ unionByName _)
      .withColumn("dict_bits",
        (0 until 31).map(k => when(col("ndv") > (1L << k), 1L).otherwise(0L))
          .reduce(_ + _))
      .withColumn("dict_bytes",
        col("ndv") * col("max_len") + expr("(n * dict_bits + 7) DIV 8"))
      .select(col("tbl"), col("col"), col("n"), col("ndv"), col("plain_bytes"),
              col("dict_bytes"),
              expr("dict_bytes * 1000000 DIV plain_bytes").as("dict_cost_ppm"),
              when(col("dict_bytes") < col("plain_bytes"), "dict")
                .otherwise("plain").as("encoding"))
      .orderBy("tbl", "col")
  }

  /** x235: DELETION-VECTOR MERGE-ON-READ — the Iceberg/Delta DV pattern,
    * the read-side complement of x221's copy-on-write erasure: a DELETE
    * predicate (o_orderkey ≡ 0 mod 13) materializes as a compact bitmap
    * index — 32-bit buckets keyed by o_orderkey DIV 32, mask = OR of
    * 1 << (key mod 32); bit 31 is the ceiling ON PURPOSE (a 1 << 63
    * BIGINT mask overflows DuckDB's checked shift while Java wraps — the
    * one cross-engine trap in the chain) — and the scan applies it as a
    * broadcast mask test instead of rewriting any file. The audit emits
    * per stage (base / deleted / merge_on_read) exact row and cents mass,
    * the DV's bucket count and bit-density, and `mor_eq_cow`: a genuine
    * two-sided EXCEPT proving the masked scan returns EXACTLY the rows a
    * copy-on-write rewrite would keep — recomputed by the oracle, not
    * asserted.
    *
    * 100 TB: the DV is |deletes|/32-bounded and broadcasts; merge-on-read
    * is then a map-side mask test on an unmodified scan — zero shuffle,
    * zero write amplification, the reason DVs exist. The audit legs cost
    * one scan each BY DESIGN (they are the verification, run per release
    * not per read); the equivalence check is the one deliberate keyed
    * anti-join pair. */
  def x235(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val del = ord.filter(col("o_orderkey") % 13 === 0)
    val dv = del
      .select(expr("o_orderkey DIV 32").as("bucket"),
              expr("CAST(o_orderkey % 32 AS INT)").as("bit"))
      .groupBy("bucket")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("mask"))
    val mor = ord
      .join(broadcast(dv), expr("o_orderkey DIV 32") === col("bucket"), "left")
      .filter(col("mask").isNull ||
        expr("mask & shiftleft(CAST(1 AS BIGINT), CAST(o_orderkey % 32 AS INT))") === 0L)
    val cow = ord.filter(col("o_orderkey") % 13 =!= 0)
    def cents = coalesce(
      sum(round(col("o_totalprice") * 100, 0).cast("long")), lit(0L))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_rows"), cents.as("cents"))
        .select(lit(name).as("stage"), col("n_rows"), col("cents"))
    val stages = stage(ord, "base")
      .unionByName(stage(del, "deleted"))
      .unionByName(stage(mor, "merge_on_read"))
    val dvs = dv.agg(count(lit(1)).as("dv_buckets"))
      .crossJoin(del.agg(count(lit(1)).as("n_del")))
      .select(col("dv_buckets"),
              expr("n_del * 1000000 DIV (dv_buckets * 32)").as("dv_density_ppm"))
    val mism = mor.select("o_orderkey").except(cow.select("o_orderkey"))
      .unionByName(cow.select("o_orderkey").except(mor.select("o_orderkey")))
      .agg(count(lit(1)).as("n_mismatch"))
    stages.crossJoin(broadcast(dvs)).crossJoin(broadcast(mism))
      .select(col("stage"), col("n_rows"), col("cents"), col("dv_buckets"),
              col("dv_density_ppm"), (col("n_mismatch") === 0L).as("mor_eq_cow"))
      .orderBy("stage")
  }

  def x197(spark: SparkSession, dir: String): DataFrame = {
    val fact = spark.table(yearPartitionedOrders(spark, dir))
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(year(col("o_orderdate")).as("y")).distinct()
    fact.join(broadcast(dim), col("o_year") === col("y"))
      .groupBy(col("o_year").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
           sum(round(col("o_totalprice") * 100, 0).cast("long"))
             .as("revenue_cents"))
      .orderBy("o_year")
  }
}
