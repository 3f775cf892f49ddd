package graft.sources.kv

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A real DataSource V2 connector for the reference's DynamoDB-shaped KV
  * tables (SURVEY.md §2A A14 source / A16 sink; reference
  * `data_sources/input_handler_dynamodb.py:135-213`,
  * `output_handler_dynamodb.py:62-112`) — `spark.read.format("graft-kv")`,
  * not a parquet analogy. The backing store here is an in-process map
  * (this sandbox has no network KV service; in production the reader
  * factory would carry connection config instead of a table name — every
  * planner-side mechanism below is the real one):
  *
  *  - **projection pushdown** (`SupportsPushDownRequiredColumns`): the
  *    store materializes ONLY the pruned attributes per item, the DSv2
  *    analog of a DynamoDB `ProjectionExpression` — at scale this is the
  *    difference between shipping 2 attributes and shipping the item.
  *  - **key-equality pushdown** (`SupportsPushDownFilters`): an `EqualTo`
  *    on the key column becomes a point lookup (DynamoDB `Query`/GetItem)
  *    instead of a full scan, and the filter is consumed at the source so
  *    Spark plans no post-scan filter for it.
  *  - **partitioned scan**: the key space splits into `partitions` slices
  *    by a stable hash (DynamoDB parallel-`Scan` segments,
  *    `input_handler_dynamodb.py:173-189`) so the read parallelizes.
  *  - **DSv2 write** (`SupportsWrite` + `SupportsTruncate`): per-task
  *    writers batch puts and commit last-write-wins per key (PutItem
  *    semantics); overwrite truncates first.
  */
class KvDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-kv"

  private def tableName(options: CaseInsensitiveStringMap): String = {
    val t = options.get("table")
    require(t != null, "graft-kv requires option(\"table\", <name>)")
    t
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.schemaOf(tableName(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("table"), schema,
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))

  override def supportsExternalMetadata(): Boolean = true
}

/** In-process KV backing store: table → (key column, schema, items).
  * Items are last-write-wins per key, like DynamoDB PutItem. Values are
  * stored as plain Scala rows (`Seq[Any]` aligned to the schema) so
  * reader partitions can prune attributes positionally. */
object KvStore {
  /** `changes` is the table's append-only put log — the DynamoDB-Streams
    * analog the streaming read path replays. CopyOnWriteArrayList:
    * index-sliceable snapshots under concurrent appends. */
  final case class TableData(keyCol: String, schema: StructType,
      items: TrieMap[String, Seq[Any]],
      changes: java.util.concurrent.CopyOnWriteArrayList[Seq[Any]] =
        new java.util.concurrent.CopyOnWriteArrayList[Seq[Any]])

  private val tables = TrieMap.empty[String, TableData]

  // DynamoDB-style request-unit meters, consumed by graft.CostAccounting
  // (A21 cost model analog). Units are SIZE-SCALED like the real service
  // bills them — ceil(itemBytes/1KB) per write, ceil(itemBytes/4KB) per
  // read (min 1 each) — so large items are not underpriced relative to
  // the reference's cost model. In-process like the store itself; a
  // networked provider would read these from the service's metrics.
  private val writeCounter = new java.util.concurrent.atomic.LongAdder
  private val readCounter = new java.util.concurrent.atomic.LongAdder
  def writeOps: Long = writeCounter.sum
  def readOps: Long = readCounter.sum

  /** Serialized-size proxy: attribute values as strings (DynamoDB bills
    * on attribute names + values; names are schema-constant, values
    * dominate for large items). */
  private[kv] def itemBytes(r: Seq[Any]): Long =
    r.foldLeft(0L)((a, v) => a + (if (v == null) 1 else String.valueOf(v).length))

  private def units(bytes: Long, per: Long): Long = math.max(1L, (bytes + per - 1) / per)

  def register(name: String, keyCol: String, schema: StructType): Unit = {
    require(schema.fieldNames.contains(keyCol),
      s"key column $keyCol not in schema ${schema.fieldNames.mkString(",")}")
    tables.putIfAbsent(name, TableData(keyCol, schema, TrieMap.empty))
  }

  def put(name: String, rows: Iterable[Seq[Any]]): Unit = {
    val t = data(name)
    val ki = t.schema.fieldIndex(t.keyCol)
    rows.foreach { r =>
      t.items.put(String.valueOf(r(ki)), r)
      t.changes.add(r)
      writeCounter.add(units(itemBytes(r), 1024))
    }
  }

  /** Reads bill the FULL stored item (projection does not shrink a
    * DynamoDB read unit), 4KB per unit. */
  private[graft] def readUnits(fullRow: Seq[Any]): Unit =
    readCounter.add(units(itemBytes(fullRow), 4096))

  def truncate(name: String): Unit = {
    val t = data(name)
    t.items.clear()
    t.changes.clear() // a rebuilt table starts a fresh change feed
  }
  def exists(name: String): Boolean = tables.contains(name)
  def schemaOf(name: String): StructType = data(name).schema
  def data(name: String): TableData =
    tables.getOrElse(name,
      throw new IllegalArgumentException(s"graft-kv table not registered: $name"))
}

class KvTable(table: String, schema0: StructType, partitions: Int)
    extends Table with SupportsRead with SupportsWrite {
  /** Exposed for the KvLookupJoin strategy (plans package). */
  private[graft] def tableName: String = table
  override def name(): String = s"graft-kv:$table"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(table, schema0, partitions)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(table, info.schema())
}

class KvScanBuilder(table: String, full: StructType, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var keyLookup: Option[String] = None
  private var limit: Option[Int] = None
  private var aggs: Option[Seq[KvAgg]] = None

  // ── Aggregate pushdown (SupportsPushDownAggregates) ────────────────────
  // Ungrouped COUNT(*) / COUNT(col) / MIN(col) / MAX(col) run INSIDE the
  // provider: the scan returns one pre-aggregated row instead of the
  // table (complete pushdown — the store is the single source of truth,
  // so no partial/final re-aggregation is needed). The DSv2 analog of a
  // service-side Select COUNT — at scale the difference between moving
  // the table and moving one row. Grouped aggregates and anything beyond
  // the four verbs stay in Spark (pushAggregation returns false and the
  // normal scan path applies).
  private def fieldOf(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }

  private def translate(agg: Aggregation): Option[Seq[KvAgg]] =
    if (agg.groupByExpressions.nonEmpty || keyLookup.isDefined || limit.isDefined) None
    else {
      val out: Seq[Option[KvAgg]] = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some(KvAgg("count_star", None))
        case c: Count if !c.isDistinct => fieldOf(c.column).map(f => KvAgg("count", Some(f)))
        case m: Min => fieldOf(m.column).map(f => KvAgg("min", Some(f)))
        case m: Max => fieldOf(m.column).map(f => KvAgg("max", Some(f)))
        case _ => None
      }
      if (out.forall(_.isDefined)) Some(out.flatten) else None
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    translate(agg) match {
      case Some(specs) => aggs = Some(specs); true
      case None => false
    }
  }

  // LIMIT pushdown: each scan partition stops after n items (a DynamoDB
  // Scan `Limit`); Spark still applies the exact global limit above.
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val keyCol = KvStore.data(table).keyCol
    val (point, rest) = filters.partition {
      case EqualTo(c, v) => c == keyCol && v != null && keyLookup.isEmpty
      case _ => false
    }
    keyLookup = point.headOption.map { case EqualTo(_, v) => String.valueOf(v) }
    // a consumed key-equality is FULLY satisfied at the source; everything
    // else (and any extra equalities) stays a post-scan filter
    rest ++ point.drop(1)
  }

  override def pushedFilters(): Array[Filter] =
    keyLookup.map(v => EqualTo(KvStore.data(table).keyCol, v): Filter).toArray

  override def build(): Scan = aggs match {
    case Some(specs) => new KvAggScan(table, full, specs)
    case None => new KvScan(table, full, required, keyLookup, partitions, limit)
  }
}

/** One pushed aggregate verb: op ∈ count_star | count | min | max. */
case class KvAgg(op: String, col: Option[String]) {
  def name: String = op match {
    case "count_star" => "count(*)"
    case other => s"$other(${col.get})"
  }
}

/** Scan for a completely-pushed ungrouped aggregation: ONE partition,
  * ONE output row, computed inside the provider (executor-side over the
  * store snapshot). Read metering still bills per item examined — the
  * aggregate scans the table server-side, it does not ship it. */
class KvAggScan(table: String, full: StructType, specs: Seq[KvAgg])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(specs.map { a =>
    a.op match {
      case "count_star" | "count" => StructField(a.name, LongType, nullable = false)
      case _ => StructField(a.name, full(full.fieldIndex(a.col.get)).dataType)
    }
  })
  override def description(): String =
    s"graft-kv table=$table aggPushed=[${specs.map(_.name).mkString(",")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(KvAggPartition(table, specs))
  override def createReaderFactory(): PartitionReaderFactory =
    new KvAggReaderFactory
}

case class KvAggPartition(table: String, specs: Seq[KvAgg]) extends InputPartition

class KvAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvAggPartition]
    val data = KvStore.data(part.table)
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        val idx = part.specs.map(_.col.map(data.schema.fieldIndex))
        val counts = new Array[Long](part.specs.length)
        val extremes = new Array[Any](part.specs.length)
        data.items.values.foreach { r =>
          KvStore.readUnits(r)
          var j = 0
          while (j < part.specs.length) {
            val spec = part.specs(j)
            spec.op match {
              case "count_star" => counts(j) += 1
              case "count" => if (r(idx(j).get) != null) counts(j) += 1
              case "min" | "max" =>
                val v = r(idx(j).get)
                if (v != null) {
                  val cur = extremes(j)
                  // Strings must compare in UTF-8 BINARY order (what
                  // Spark's min/max on UTF8String uses), not java
                  // String's UTF-16 code-unit order — they diverge on
                  // supplementary characters, and the pushed aggregate
                  // must agree with the un-pushed scan path.
                  val cmp = (v, cur) match {
                    case (_, null) => 0
                    case (a: String, b: String) =>
                      org.apache.spark.unsafe.types.UTF8String.fromString(a)
                        .compareTo(
                          org.apache.spark.unsafe.types.UTF8String.fromString(b))
                    case _ => v.asInstanceOf[Comparable[Any]].compareTo(cur)
                  }
                  if (cur == null || (spec.op == "min" && cmp < 0) ||
                      (spec.op == "max" && cmp > 0)) extremes(j) = v
                }
            }
            j += 1
          }
        }
        InternalRow.fromSeq(part.specs.zipWithIndex.map { case (spec, j) =>
          spec.op match {
            case "count_star" | "count" => counts(j)
            case _ =>
              val dt = data.schema(data.schema.fieldIndex(spec.col.get)).dataType
              KvConvert.toCatalyst(dt)(extremes(j))
          }
        })
      }
      override def close(): Unit = ()
    }
  }
}

class KvScan(table: String, full: StructType, required: StructType,
    val keyLookup: Option[String], partitions: Int,
    val limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  // shows up in .explain so specs (and users) can see what was pushed
  override def description(): String =
    s"graft-kv table=$table pruned=[${required.fieldNames.mkString(",")}] " +
      s"keyLookup=${keyLookup.getOrElse("none")}" +
      limit.map(n => s" limit=$n").getOrElse("")
  override def toBatch: Batch = this

  /** Real source statistics (row count + serialized bytes) so Catalyst
    * sizes this relation from the STORE, not from the pessimistic
    * defaultSizeInBytes — the difference between a dimension-sized KV
    * table broadcasting and it forcing a shuffle join. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val data = KvStore.data(table)
    private val bytes = data.items.values.foldLeft(0L)((a, r) => a + KvStore.itemBytes(r))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(data.items.size.toLong)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val prunedIdx = required.fieldNames.map(full.fieldIndex)
    keyLookup match {
      // point lookup: one partition, one key (DynamoDB Query/GetItem)
      case Some(k) => Array(KvPartition(table, 0, 1, prunedIdx, Some(k), limit))
      case None => (0 until partitions).map(i =>
        KvPartition(table, i, partitions, prunedIdx, None, limit)).toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required)

  /** Streaming read: replay the table's put log — the DynamoDB-Streams
    * shape. Offsets are log positions, so checkpoint recovery is exact:
    * a resumed query replays precisely the puts that landed after its
    * committed offset (KvSourceSpec pins this), and projection pruning
    * applies to the feed the same as to a scan. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KvMicroBatchStream(table, full, required)
}

case class KvOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

class KvMicroBatchStream(table: String, full: StructType, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  override def initialOffset(): Offset = KvOffset(0L)
  override def latestOffset(): Offset =
    KvOffset(KvStore.data(table).changes.size().toLong)
  override def deserializeOffset(json: String): Offset = KvOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val prunedIdx = required.fieldNames.map(full.fieldIndex)
    val until = end.asInstanceOf[KvOffset].n
    // The change log is indexed by Int; fail loudly at PLANNING time
    // rather than wrapping to a negative index mid-read past 2^31.
    require(until <= Int.MaxValue,
      s"kv change feed for '$table' exceeds Int.MaxValue entries ($until)")
    Array(KvFeedPartition(table,
      start.asInstanceOf[KvOffset].n, until, prunedIdx))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvFeedReaderFactory
}

/** One change-log slice [from, until) — replayed in put order. */
case class KvFeedPartition(table: String, from: Long, until: Long,
    prunedIdx: Array[Int]) extends InputPartition

class KvFeedReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvFeedPartition]
    val data = KvStore.data(part.table)
    val converters = part.prunedIdx.map(i => KvConvert.toCatalyst(data.schema(i).dataType))
    new PartitionReader[InternalRow] {
      private var pos = part.from
      private var current: InternalRow = _
      override def next(): Boolean = pos < part.until && {
        val r = data.changes.get(Math.toIntExact(pos))
        pos += 1
        current = InternalRow.fromSeq(part.prunedIdx.indices.map(j =>
          converters(j)(r(part.prunedIdx(j)))))
        KvStore.readUnits(r)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Serializable slice descriptor: segment `idx` of `n` by stable key hash
  * (murmur3 — NOT String.hashCode, which is JVM-implementation-defined). */
case class KvPartition(table: String, idx: Int, n: Int,
    prunedIdx: Array[Int], keyLookup: Option[String],
    limit: Option[Int] = None) extends InputPartition

class KvReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvPartition]
    val data = KvStore.data(part.table)
    val unlimited: Iterator[Seq[Any]] = part.keyLookup match {
      case Some(k) => data.items.get(k).iterator
      case None => data.items.iterator.collect {
        case (k, v) if math.floorMod(
          scala.util.hashing.MurmurHash3.stringHash(k), part.n) == part.idx => v
      }
    }
    val rows = part.limit.map(unlimited.take).getOrElse(unlimited)
    val converters = part.prunedIdx.map(i => KvConvert.toCatalyst(data.schema(i).dataType))
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = rows.hasNext && {
        val r = rows.next()
        // materialize ONLY the pruned attributes (the pushdown payoff)
        current = InternalRow.fromSeq(part.prunedIdx.indices.map(j =>
          converters(j)(r(part.prunedIdx(j)))))
        KvStore.readUnits(r)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[graft] object KvConvert {
  /** External JVM value → catalyst value for the atomic types a KV item
    * carries (strings, numbers, booleans, timestamps). */
  def toCatalyst(dt: DataType): Any => Any = dt match {
    case StringType => v => if (v == null) null else UTF8String.fromString(v.toString)
    case TimestampType => {
      case null => null
      case t: java.sql.Timestamp =>
        java.util.concurrent.TimeUnit.MILLISECONDS.toMicros(t.getTime) +
          (t.getNanos % 1000000) / 1000
      case v => v
    }
    case _ => identity
  }

  /** Catalyst value → plain JVM value (for the write path's store rows). */
  def fromCatalyst(dt: DataType): Any => Any = dt match {
    case StringType => v => if (v == null) null else v.toString
    case _ => identity
  }
}

class KvWriteBuilder(table: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new KvWriterFactory(schema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        // last-write-wins puts, applied atomically at commit (the driver
        // is the single committer, like the reference's final DynamoDB
        // batch_writer flush)
        if (doTruncate) KvStore.truncate(table)
        messages.foreach { case KvCommit(rows) => KvStore.put(table, rows) }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class KvCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage

class KvWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      private val converters = schema.fields.map(f => KvConvert.fromCatalyst(f.dataType))
      override def write(row: InternalRow): Unit =
        buf += schema.indices.map(i =>
          converters(i)(if (row.isNullAt(i)) null
          else row.get(i, schema(i).dataType)))
      override def commit(): WriterCommitMessage = KvCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
