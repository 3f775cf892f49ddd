package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, IsNotNull, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import graft.sources.kv.{KvStore, KvTable}

/** Index nested-loop join against the KV store — the (c)-tier custom
  * operator route of the build plan (custom Strategy + physical node via
  * `SparkSessionExtensions`), used where built-ins genuinely can't
  * express the plan we want: an inner equi-join whose build side is a
  * `graft-kv` table keyed on the join column. The built-in planner can
  * only SCAN the store and shuffle/broadcast it; the store is an index
  * on exactly that key, so the right plan is a per-probe-row point
  * lookup (DynamoDB BatchGetItem semantics) — no store scan, no
  * exchange, probe-side cost only. This is how a 100-row probe joins a
  * billion-item table without touching a billionth of it.
  *
  * The strategy fires only on the exact safe pattern — INNER join, one
  * `EqualTo` between a probe column and the store's key column, KV scan
  * relation unfiltered — and declines everything else back to the
  * built-in planner, scan path included. Lookups run through the same
  * metering as every other store read (A21 cost model).
  */
object KvLookupJoinStrategy extends SparkStrategy {

  /** Only IsNotNull guards (the optimizer's inner-join null filter) may
    * sit between the join and the scan — a point lookup of a null key
    * finds nothing, so dropping the guard is semantics-preserving. Any
    * OTHER pushed predicate would need post-lookup evaluation → decline. */
  private def nullGuardOnly(e: Expression): Boolean = e match {
    case IsNotNull(_: AttributeReference) => true
    case And(l, r) => nullGuardOnly(l) && nullGuardOnly(r)
    case _ => false
  }

  /** Unwrap attribute-only Project / IsNotNull Filter down to the KV scan
    * relation; returns the store table name. Fires ONLY on a PRISTINE
    * KvScan: a scan that already carries a pushed key lookup (or limit)
    * consumed a user predicate during pushdown — no residual Filter node
    * remains in the plan, so replacing that scan with per-probe-row point
    * lookups would silently DROP the pushed predicate. (Today the
    * optimizer usually mirrors the predicate onto the probe side via
    * constraint propagation, but that rule is configurable — correctness
    * must not depend on it.) Aggregate-pushdown scans are a different
    * Scan class and decline via the type match. */
  private def unwrapKv(p: LogicalPlan): Option[String] = p match {
    case DataSourceV2ScanRelation(rel, scan: graft.sources.kv.KvScan, _, _, _)
        if scan.keyLookup.isEmpty && scan.limit.isEmpty =>
      rel.table match {
        case t: KvTable => Some(t.tableName)
        case _ => None
      }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      unwrapKv(child)
    case Filter(cond, child) if nullGuardOnly(cond) => unwrapKv(child)
    case _ => None
  }

  /** Key types whose Catalyst-internal `String.valueOf` matches the
    * external `String.valueOf` the store indexes by. Timestamp (micros
    * Long vs java.sql.Timestamp.toString) and Date (epoch-day Int vs
    * yyyy-MM-dd) would stringify DIFFERENTLY internal-vs-external — every
    * lookup would miss — so those decline to the scan route. */
  private def lookupSafe(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: Join if j.joinType == Inner && j.condition.isDefined =>
      (j.condition.get, unwrapKv(j.right)) match {
        case (EqualTo(a: AttributeReference, b: AttributeReference), Some(table)) =>
          val keyCol = KvStore.data(table).keyCol
          val leftIds = j.left.outputSet
          val rightIds = j.right.outputSet
          // accept (probe = key) in either written order
          val matched = Seq((a, b), (b, a)).collectFirst {
            case (p, k) if leftIds.contains(p) &&
              rightIds.contains(k) && k.name == keyCol &&
              lookupSafe(p.dataType) => p
          }
          matched match {
            case Some(probeAttr) =>
              KvLookupJoinExec(planLater(j.left), table,
                j.left.output.indexWhere(_.exprId == probeAttr.exprId),
                j.right.output) :: Nil
            case None => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Physical point-lookup join: for each probe partition, resolve each
  * row's key directly against the store and emit probe ++ item columns.
  * Output partitioning IS the probe's — no exchange enters the plan. */
case class KvLookupJoinExec(probe: SparkPlan, table: String,
    keyOrdinal: Int, rightOutput: Seq[Attribute]) extends UnaryExecNode {

  override def child: SparkPlan = probe
  override def output: Seq[Attribute] = probe.output ++ rightOutput
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(probe = c)
  override def nodeName: String = s"KvLookupJoin(table=$table)"

  override protected def doExecute(): RDD[InternalRow] = {
    val keyDt = probe.output(keyOrdinal).dataType
    val tbl = table
    val ko = keyOrdinal
    val rightNames = rightOutput.map(_.name)
    val out = output
    probe.execute().mapPartitions { rows =>
      val data = KvStore.data(tbl)
      val idx = rightNames.map(data.schema.fieldIndex).toArray
      val conv = idx.map(i =>
        graft.sources.kv.KvConvert.toCatalyst(data.schema(i).dataType))
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      rows.flatMap { row =>
        // A null probe key matches nothing in an inner equi-join; don't
        // let it stringify to "null" and spuriously hit a "null"-keyed
        // item when the optimizer's IsNotNull guard is absent.
        if (row.isNullAt(ko)) Iterator.empty
        else {
        val k = String.valueOf(row.get(ko, keyDt))
        data.items.get(k) match {
          case Some(item) =>
            KvStore.readUnits(item)
            val right = InternalRow.fromSeq(
              idx.indices.map(j => conv(j)(item(idx(j)))))
            Iterator.single(proj(joined(row, right)).copy())
          case None => Iterator.empty
        }
        }
      }
    }
  }
}
