package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed exact order statistics.
  *
  * Spark's exact forms of rank-based statistics funnel the whole input
  * through ONE task: `percentile(...)` buffers every (value, count) pair in
  * a single ImperativeAggregate buffer, and `ntile(k)` over an
  * unpartitioned (or low-cardinality-partitioned) window sorts the full
  * data in one partition. Both are executor-OOM shapes at 100 TB, not just
  * slow ones.
  *
  * [[withExactRank]] replaces them with a partition-friendly exact rank:
  *
  *   1. sample ~`buckets*64` rows by a deterministic hash order (a
  *      distributed `TakeOrderedAndProject`, no RNG) and derive up to
  *      `buckets-1` composite-key range boundaries;
  *   2. assign each row a bucket map-side — the bucket expression is a sum
  *      of monotone `key > boundary` indicators over LITERAL boundaries,
  *      so it is a pure function of the row (any two plan subtrees agree,
  *      no reliance on partition placement or exchange reuse);
  *   3. count rows per (group, bucket) — collected as index metadata
  *      (≤ |groups|·buckets rows, same discipline as IVF centroids) and
  *      turned into broadcast per-bucket rank offsets;
  *   4. exact rank = offset + `row_number` over a window PARTITIONED BY
  *      (group, bucket) — every sort partition holds ~n/buckets rows.
  *
  * The rank is exact and deterministic whatever the sample produced:
  * boundary quality affects only balance, never the rank value. Quantile
  * consumers then become pure expressions of the rank ([[ntileFromRank]])
  * or a 6-row filter + interpolation (`Analytics.orderValuePercentiles`).
  *
  * Scale contract: one pass for the sample, one for the counts, one for
  * the ranked output; all shuffles hash on (group, bucket); `buckets`
  * defaults to `spark.sql.shuffle.partitions` and should track cluster
  * parallelism. Order keys must be NOT NULL and, with the group columns,
  * form a strict total order per group (callers append a unique id).
  */
object Quantiles {

  /** Adds `rankCol` (1-based exact rank within `group` under `order`) and
    * `nCol` (per-group row count) to `df`.
    *
    * @param order  (column name, ascending?) pairs; composite must be
    *               strict per group and null-free.
    * @param buckets range-bucket count; 0 → `spark.sql.shuffle.partitions`.
    * @param materialize localCheckpoint the input once (three passes read
    *                    it); disable when the input is a bare scan.
    */
  def withExactRank(
      df: DataFrame,
      group: Seq[String],
      order: Seq[(String, Boolean)],
      rankCol: String,
      nCol: String,
      buckets: Int = 0,
      materialize: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val fullKey: Seq[(String, Boolean)] = group.map((_, true)) ++ order
    val keyCols = fullKey.map { case (n, _) => col(n) }

    // The rank needs three passes over the input (boundary sample,
    // bucket counts, ranked output). With `materialize` the input is
    // localCheckpoint'd ONCE instead of recomputing its lineage three
    // times — essential for aggregated or CHAINED inputs (RFM's three
    // axes would otherwise recompute their rollup exponentially), a net
    // loss for a plain column pruned scan (pass false there: re-reading
    // parquet beats writing a checkpoint of it).
    val input = if (materialize) Materialize(df) else df

    // 1. Deterministic pseudo-random boundary sample: top-N by xxhash64 of
    // the (unique) composite key is a distributed TakeOrdered — no RNG, no
    // sampling seed that could disagree between plan subtrees.
    val sampleN = nb * 64
    val sampled: Array[Row] = input
      .select(keyCols: _*)
      .orderBy(xxhash64(keyCols: _*) +: keyCols: _*)
      .limit(sampleN)
      .collect()

    val ord: Ordering[Row] = (a: Row, b: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < fullKey.length) {
        c = compareAny(a.get(i), b.get(i))
        if (!fullKey(i)._2) c = -c
        i += 1
      }
      c
    }
    val sorted = sampled.sorted(ord)
    val boundaries: Seq[Row] =
      if (sorted.isEmpty) Nil
      else (1 until nb).map(i => sorted(math.min(i * sorted.length / nb, sorted.length - 1)))
        .distinct

    // 2. Monotone bucket id from literal boundaries. `strictlyAfter` is
    // monotone in the composite order, so the sum is too — bucket b's keys
    // all precede bucket b+1's, whatever the boundary quality.
    val bkt = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(strictlyAfter(fullKey, b), 1).otherwise(0)
    }
    val withB = input.withColumn("__bkt", bkt.cast("int"))

    // 3. Per-(group, bucket) counts: ≤ |groups|·nb rows of index metadata.
    val grpB = group :+ "__bkt"
    val counts = withB
      .groupBy(grpB.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .collect()
    val byGroup = counts.groupBy(r => group.indices.map(r.get).toList)
    val offRows: Seq[Row] = byGroup.toSeq.flatMap { case (_, rows) =>
      def bktOf(r: Row): Int = r.getAs[Number]("__bkt").intValue()
      def cntOf(r: Row): Long = r.getAs[Number]("__cnt").longValue()
      val inOrder = rows.sortBy(bktOf)
      val total = inOrder.map(cntOf).sum
      var off = 0L
      inOrder.map { r =>
        val o = off
        off += cntOf(r)
        // Seq[Any], not Seq(...): Scala would widen the Int bucket id to
        // Long to unify with the Long offsets, breaking the row schema.
        Row.fromSeq(group.indices.map(r.get) ++ Seq[Any](bktOf(r), o, total))
      }
    }
    val offSchema = StructType(
      group.map(g => df.schema(g)) ++ Seq(
        StructField("__bkt", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("__off", LongType, nullable = false),
        StructField("__n", LongType, nullable = false)))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)

    // 4. offset + per-bucket row_number = exact rank; the window partitions
    // by (group, bucket) so each sort sees ~n/buckets rows.
    val w = Window
      .partitionBy(grpB.map(col): _*)
      .orderBy(order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }: _*)
    withB
      .join(broadcast(offs), grpB)
      .withColumn(rankCol, col("__off") + row_number().over(w).cast("long"))
      .withColumn(nCol, col("__n"))
      .drop("__bkt", "__off", "__n")
  }

  /** Distributed EXACT PREFIX SUM — the running-total sibling of
    * [[withExactRank]]: every row gets the decimal-exact sum of
    * `valueCol` over all rows at-or-before it in the composite
    * (group, order) ordering, plus the group total. The naive form is an
    * unpartitioned running-sum window (one task sorts everything — the
    * same OOM shape exact rank replaces); here the identical
    * range-bucket machinery applies: per-(group, bucket) decimal
    * subtotals are collected as index metadata, folded into broadcast
    * bucket OFFSETS driver-side (exact `BigDecimal` adds), and each
    * bucket computes only its local running sum — every sort partition
    * holds ~n/buckets rows.
    *
    * Determinism: all accumulation is fixed-scale decimal (exact, order-
    * independent), so the prefix is bit-equal to a single-task running
    * sum and to the oracle's window SUM at any parallelism. Output
    * columns `prefixCol`/`totalCol` are DecimalType(38, 6); cast to
    * double at the consumer.
    *
    * CONTRACT (mirrors [[withExactRank]]): the composite (group ++
    * order) key must be UNIQUE per row. With ties, the bucket-local
    * running-sum window assigns tied rows' prefixes in partition-
    * dependent order, diverging nondeterministically from a single
    * window's result — append a tiebreaker column (e.g. a row id) to
    * `order` if the natural key can repeat. */
  def withExactPrefixSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[(String, Boolean)],
      valueCol: String,
      prefixCol: String,
      totalCol: String,
      buckets: Int = 0,
      materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val dec = DecimalType(27, 6)
    val decW = DecimalType(38, 6)
    val fullKey: Seq[(String, Boolean)] = group.map((_, true)) ++ order
    val keyCols = fullKey.map { case (n, _) => col(n) }
    val input = if (materialize) Materialize(df) else df

    val sampleN = nb * 64
    val sampled: Array[Row] = input
      .select(keyCols: _*)
      .orderBy(xxhash64(keyCols: _*) +: keyCols: _*)
      .limit(sampleN)
      .collect()
    val ord: Ordering[Row] = (a: Row, b: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < fullKey.length) {
        c = compareAny(a.get(i), b.get(i))
        if (!fullKey(i)._2) c = -c
        i += 1
      }
      c
    }
    val sorted = sampled.sorted(ord)
    val boundaries: Seq[Row] =
      if (sorted.isEmpty) Nil
      else (1 until nb).map(i => sorted(math.min(i * sorted.length / nb, sorted.length - 1)))
        .distinct
    val bkt = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(strictlyAfter(fullKey, b), 1).otherwise(0)
    }
    val withB = input.withColumn("__bkt", bkt.cast("int"))

    val grpB = group :+ "__bkt"
    val subtotals = withB
      .groupBy(grpB.map(col): _*)
      .agg(sum(col(valueCol).cast(dec)).as("__vsum"))
      .collect()
    val byGroup = subtotals.groupBy(r => group.indices.map(r.get).toList)
    val offRows: Seq[Row] = byGroup.toSeq.flatMap { case (_, rows) =>
      def bktOf(r: Row): Int = r.getAs[Number](group.length).intValue()
      def sumOf(r: Row): java.math.BigDecimal = {
        val d = r.getDecimal(group.length + 1)
        if (d == null) java.math.BigDecimal.ZERO.setScale(6) else d
      }
      val inOrder = rows.sortBy(bktOf)
      val total = inOrder.map(sumOf)
        .foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_.add(_))
      var off = java.math.BigDecimal.ZERO.setScale(6)
      inOrder.map { r =>
        val o = off
        off = off.add(sumOf(r))
        Row.fromSeq(group.indices.map(r.get) ++ Seq[Any](bktOf(r), o, total))
      }
    }
    val offSchema = StructType(
      group.map(g => df.schema(g)) ++ Seq(
        StructField("__bkt", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("__voff", decW, nullable = false),
        StructField("__vtot", decW, nullable = false)))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)

    val w = Window
      .partitionBy(grpB.map(col): _*)
      .orderBy(order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offs), grpB)
      .withColumn(prefixCol,
        (col("__voff") + sum(col(valueCol).cast(dec)).over(w)).cast(decW))
      .withColumn(totalCol, col("__vtot"))
      .drop("__bkt", "__voff", "__vtot")
  }

  /** [[withExactRank]] AND [[withExactPrefixSum]] over the SAME
    * (group, order) key in one pass: one input checkpoint, one boundary
    * sample, one combined (count, subtotal) metadata collect, and one
    * window operator evaluating both frames over a single sort —
    * consumers that need rank and prefix together (threshold selection)
    * previously paid the full three-pass machinery twice. Values are
    * bit-identical to the two separate calls: the rank is exact whatever
    * the boundaries, and the decimal prefix is order-independent by
    * fixed-scale exactness. */
  def withExactRankAndPrefixSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[(String, Boolean)],
      valueCol: String,
      rankCol: String,
      nCol: String,
      prefixCol: String,
      totalCol: String,
      buckets: Int = 0,
      materialize: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val dec = DecimalType(27, 6)
    val decW = DecimalType(38, 6)
    val fullKey: Seq[(String, Boolean)] = group.map((_, true)) ++ order
    val keyCols = fullKey.map { case (n, _) => col(n) }
    val input = if (materialize) Materialize(df) else df

    val sampleN = nb * 64
    val sampled: Array[Row] = input
      .select(keyCols: _*)
      .orderBy(xxhash64(keyCols: _*) +: keyCols: _*)
      .limit(sampleN)
      .collect()
    val ord: Ordering[Row] = (a: Row, b: Row) => {
      var i = 0
      var c = 0
      while (c == 0 && i < fullKey.length) {
        c = compareAny(a.get(i), b.get(i))
        if (!fullKey(i)._2) c = -c
        i += 1
      }
      c
    }
    val sorted = sampled.sorted(ord)
    val boundaries: Seq[Row] =
      if (sorted.isEmpty) Nil
      else (1 until nb).map(i => sorted(math.min(i * sorted.length / nb, sorted.length - 1)))
        .distinct
    val bkt = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(strictlyAfter(fullKey, b), 1).otherwise(0)
    }
    val withB = input.withColumn("__bkt", bkt.cast("int"))

    val grpB = group :+ "__bkt"
    val perBucket = withB
      .groupBy(grpB.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol).cast(dec)).as("__vsum"))
      .collect()
    val byGroup = perBucket.groupBy(r => group.indices.map(r.get).toList)
    val offRows: Seq[Row] = byGroup.toSeq.flatMap { case (_, rows) =>
      def bktOf(r: Row): Int = r.getAs[Number]("__bkt").intValue()
      def cntOf(r: Row): Long = r.getAs[Number]("__cnt").longValue()
      def sumOf(r: Row): java.math.BigDecimal = {
        val d = r.getAs[java.math.BigDecimal]("__vsum")
        if (d == null) java.math.BigDecimal.ZERO.setScale(6) else d
      }
      val inOrder = rows.sortBy(bktOf)
      val total = inOrder.map(cntOf).sum
      val vTotal = inOrder.map(sumOf)
        .foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_.add(_))
      var off = 0L
      var vOff = java.math.BigDecimal.ZERO.setScale(6)
      inOrder.map { r =>
        val o = off
        val vo = vOff
        off += cntOf(r)
        vOff = vOff.add(sumOf(r))
        Row.fromSeq(group.indices.map(r.get) ++ Seq[Any](bktOf(r), o, total, vo, vTotal))
      }
    }
    val offSchema = StructType(
      group.map(g => df.schema(g)) ++ Seq(
        StructField("__bkt", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("__off", LongType, nullable = false),
        StructField("__n", LongType, nullable = false),
        StructField("__voff", decW, nullable = false),
        StructField("__vtot", decW, nullable = false)))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)

    // rank's whole-partition row_number and the prefix's running frame
    // share one sort: same partition + order spec, two frames, ONE
    // WindowExec.
    val w = Window
      .partitionBy(grpB.map(col): _*)
      .orderBy(order.map { case (n, asc) => if (asc) col(n).asc else col(n).desc }: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .join(broadcast(offs), grpB)
      .withColumn(rankCol, col("__off") + row_number().over(w).cast("long"))
      .withColumn(nCol, col("__n"))
      .withColumn(prefixCol,
        (col("__voff") + sum(col(valueCol).cast(dec)).over(wRun)).cast(decW))
      .withColumn(totalCol, col("__vtot"))
      .drop("__bkt", "__off", "__n", "__voff", "__vtot")
  }

  /** `ntile(k)` as a pure expression of the exact 1-based rank and the
    * group size — Spark/DuckDB semantics: the first `n % k` tiles take
    * `n div k + 1` rows, the rest `n div k`. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val base = floor(n / lit(k)).cast("long")
    val rem = n % lit(k)
    val cut = rem * (base + lit(1L))
    when(rank <= cut,
      floor((rank - lit(1L)) / (base + lit(1L))).cast("long") + lit(1L))
      .otherwise(rem +
        floor((rank - lit(1L) - cut) / greatest(base, lit(1L))).cast("long") + lit(1L))
  }

  /** Lexicographic "row strictly after `b`" under per-key directions, as a
    * Column over literal boundary values. */
  private def strictlyAfter(fullKey: Seq[(String, Boolean)], b: Row): Column =
    fullKey.zipWithIndex.foldRight(lit(false)) { case (((name, asc), i), tail) =>
      val c = col(name)
      val v = lit(b.get(i))
      val strict = if (asc) c > v else c < v
      strict || (c === v && tail)
    }

  private def compareAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"unsupported rank key type: ${a.getClass}")
  }
}
