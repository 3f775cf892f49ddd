package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global (or per-group) row_number / prefix-sum WITHOUT a
  * corpus-sized window partition — the classic two-pass distributed
  * ranking plan (range-partition on the order key, per-partition sort +
  * local rank, driver-collected per-partition counts, prefix offsets).
  *
  * Spark's `Window.orderBy(...)` with no partition key (or a
  * low-cardinality partition key like `event_type`) funnels every row
  * through ONE task — fine at sf0.1, fatal at 100 TB. This kernel keeps
  * the same total order but spreads the sort across
  * `spark.sql.shuffle.partitions` range partitions: each task ranks only
  * its own slice and the global offsets are added from a tiny
  * (partitions × groups) count table collected to the driver.
  *
  * Beyond rank it can carry, in the same pass:
  *   - an exact Long running (inclusive prefix) sum of an integer column
  *     — the Lorenz-curve / cumulative-share building block;
  *   - the per-group total count and total sum as plain columns — what
  *     ntile-style bucketing needs (bucket is pure arithmetic on
  *     (rank, n): SQL-standard ntile gives the first n%k buckets
  *     ceil(n/k) rows and the rest floor(n/k)).
  *
  * Scale contract: the driver holds (numPartitions × |groups|) count
  * rows — thousands, never corpus-sized — so `groupCols` must be
  * low-cardinality (high-cardinality groups don't need this kernel; a
  * plain partitioned window already parallelizes them). The input is
  * persisted (MEMORY_AND_DISK) so the count pass and the emit pass see
  * the SAME range boundaries; at cluster scale that persist is one
  * shuffle-write's worth of local blocks, the price every exact
  * two-pass ranking pays.
  *
  * No counterpart in the reference (its rank shapes all fit one Lambda's
  * memory, e.g. sorted-reduce in `reduce_handler.py`); this is the
  * scale-out spelling of the same semantics.
  */
object DistributedRank {

  /** Appends to `df`:
    *   - `rankCol`: Long row_number within `groupCols` under `order`
    *     (1-based, ties impossible if `order` is total — callers pass a
    *     unique tiebreak column, same as they would to a window);
    *   - `cumCol` (if `sumCol` set): inclusive prefix Long sum of
    *     `sumCol` in rank order;
    *   - `nGroupCol` (if set): total row count of the row's group;
    *   - `sumGroupCol` (if `sumCol` and it set): total group sum.
    *
    * `order` columns must be plain column references (possibly .desc),
    * present in `df`'s output — pre-compute expressions into columns
    * first so the range partitioner, the sort, and the counter all see
    * identical values.
    */
  def withRowNumber(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      rankCol: String,
      sumCol: Option[String] = None,
      cumCol: Option[String] = None,
      nGroupCol: Option[String] = None,
      sumGroupCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val outNames = Seq(rankCol) ++ cumCol ++ nGroupCol ++ sumGroupCol
    require(outNames.distinct.size == outNames.size &&
      !outNames.exists(df.columns.contains),
      s"output columns $outNames must be fresh and distinct " +
        s"(input has ${df.columns.mkString(",")})")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortKeys = groupCols.map(col) ++ order

    // One range shuffle + in-partition sort; persisted so both passes
    // (counts, emit) read identical partition boundaries and row order.
    val ranged = df
      .repartitionByRange(nPart, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .persist()

    val schema = ranged.schema
    val groupIdx = groupCols.map(schema.fieldIndex)
    val sumIdx = sumCol.map(schema.fieldIndex)

    // Pass 1 — per-(partition, group) count and sum: a few thousand rows
    // to the driver, never the data itself. This action also
    // materializes the persisted sort.
    val partStats: Array[((Int, Seq[Any]), (Long, Long))] =
      ranged.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val acc = scala.collection.mutable.LinkedHashMap
            .empty[Seq[Any], (Long, Long)]
          it.foreach { row =>
            val g = groupIdx.map(row.get)
            val (n, s) = acc.getOrElse(g, (0L, 0L))
            val v = sumIdx.fold(0L)(i => asLong(row.get(i)))
            acc.update(g, (n + 1L, s + v))
          }
          acc.iterator.map { case (g, ns) => ((pid, g), ns) }
        }
        .collect()

    // Prefix offsets per group across partitions (pid ascending = range
    // order), plus per-group totals.
    val byGroup = partStats.groupBy(_._1._2)
    val totals: Map[Seq[Any], (Long, Long)] = byGroup.map { case (g, rows) =>
      g -> rows.foldLeft((0L, 0L)) { case ((n, s), (_, (dn, ds))) => (n + dn, s + ds) }
    }
    val offsets: Map[(Int, Seq[Any]), (Long, Long)] = byGroup.flatMap {
      case (g, rows) =>
        var n = 0L; var s = 0L
        rows.sortBy(_._1._1).map { case ((pid, _), (dn, ds)) =>
          val o = ((pid, g), (n, s)); n += dn; s += ds; o
        }
    }

    // Pass 2 — emit: running counter + running sum per (partition,
    // group), shifted by the driver-computed offsets. Zero extra shuffle;
    // rows stream out in the already-sorted order.
    val emitCum = sumCol.isDefined && cumCol.isDefined
    val emitN = nGroupCol.isDefined
    val emitS = sumCol.isDefined && sumGroupCol.isDefined
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curGroup: Seq[Any] = null
      var rk = 0L; var cum = 0L; var nG = 0L; var sG = 0L
      it.map { row =>
        val g = groupIdx.map(row.get)
        if (g != curGroup) {
          curGroup = g
          val (offN, offS) = offsets.getOrElse((pid, g), (0L, 0L))
          rk = offN; cum = offS
          val (tn, ts) = totals.getOrElse(g, (0L, 0L))
          nG = tn; sG = ts
        }
        rk += 1L
        cum += sumIdx.fold(0L)(i => asLong(row.get(i)))
        val extras = Seq(rk) ++
          (if (emitCum) Seq(cum) else Nil) ++
          (if (emitN) Seq(nG) else Nil) ++
          (if (emitS) Seq(sG) else Nil)
        Row.fromSeq(row.toSeq ++ extras)
      }
    }
    val outSchema = StructType(schema.fields ++
      (Seq(StructField(rankCol, LongType, nullable = false)) ++
        (if (emitCum) Seq(StructField(cumCol.get, LongType, nullable = false)) else Nil) ++
        (if (emitN) Seq(StructField(nGroupCol.get, LongType, nullable = false)) else Nil) ++
        (if (emitS) Seq(StructField(sumGroupCol.get, LongType, nullable = false)) else Nil)))
    spark.createDataFrame(outRdd, outSchema)
  }

  /** SQL-standard ntile bucket from (1-based rank, group size): the
    * first n%k buckets get ceil(n/k) rows, the rest floor(n/k) — the
    * exact rule DuckDB and Spark both implement, as pure Long arithmetic
    * (`div`, never double `/`) so it rides the distributed rank instead
    * of a one-task window. Takes column NAMES so the whole formula stays
    * integer-typed via SQL `div`.
    */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = {
    val base = s"($nCol div $k)"
    val rem = s"($nCol % $k)"
    expr(
      s"CAST(CASE WHEN $base = 0 THEN $rankCol " +
        s"WHEN $rankCol <= $rem * ($base + 1) " +
        s"THEN ($rankCol - 1) div ($base + 1) + 1 " +
        s"ELSE $rem + ($rankCol - 1 - $rem * ($base + 1)) div $base + 1 " +
        "END AS BIGINT)")
  }

  private def asLong(v: Any): Long = v match {
    case null       => 0L
    case l: Long    => l
    case i: Int     => i.toLong
    case s: Short   => s.toLong
    case b: Byte    => b.toLong
    case d: java.math.BigDecimal => d.longValueExact()
    case other => throw new IllegalArgumentException(
      s"sumCol must be integral, got ${other.getClass}")
  }
}
