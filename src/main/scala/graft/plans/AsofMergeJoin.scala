package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native ASOF JOIN as a first-class operator: custom LogicalPlan →
  * Strategy → physical merge exec, injected via SparkSessionExtensions
  * — the whole-operator extension point (SURVEY §2 "custom operators"
  * option (c); the expression/Aggregator/rule points are QuantizedDot,
  * TopKAgg and TopKRewrite).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN` on `l.ts >= r.ts`): every left
  * row pairs with the LATEST right row of the same key whose timestamp
  * is ≤ its own; unmatched left rows keep a null-extended right side.
  * Ties among right rows at one (key, ts) are the caller's to dedupe
  * (same contract as operators/AsofJoin, the composed form).
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * within partitions by (key, ts) — ONE exchange per side, then a
  * single-pass zipped merge that carries O(1) state (the most recent
  * right row per key). Unlike the composed union-merge (one window
  * over the unioned stream) there is no window operator, no side
  * column, no null-slot padding of the union schema — and unlike a
  * range join there is never a per-key quadratic candidate set. This
  * is the shape a 100 TB as-of backfill wants: cost = 2 shuffles +
  * 2 sorts + 1 streaming pass.
  */
object AsofMergeJoin {

  /** DataFrame-level entry: as-of join `left` to `right` on equal
    * `keys` with `leftTs >= rightTs`, right columns null-extended on
    * no match. Key and ts columns are resolved by name on each side;
    * right-side output columns keep their names (callers alias before
    * the join if they collide with left names).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightKeys: Seq[String] = Nil): DataFrame = {
    val lp = PlanBridge.analyzed(left)
    val rp = PlanBridge.analyzed(right)
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val rk = if (rightKeys.nonEmpty) rightKeys else keys
    PlanBridge.ofRows(left.sparkSession,
      AsofJoinNode(lp, rp,
        keys.map(resolve(lp, _)), rk.map(resolve(rp, _)),
        resolve(lp, leftTs), resolve(rp, rightTs)))
  }
}

/** Logical node: pure structure, no execution knowledge. */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: the only physical choice for the node. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts) =>
      AsofMergeJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one exchange per side, co-partitioned on the key (EnsureRequirements
  // aligns partition counts exactly as it does for sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition merge order: (key, ts) ascending on both sides
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  // the merge is row-preserving on the left side, so the left child's
  // hash partitioning survives — a downstream groupBy on the key reuses
  // it instead of re-exchanging (proven in the spec)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expressions/schemas; codegen'd
    // projections are built PER PARTITION on the executor
    val lk = leftKeys; val rk = rightKeys; val lts = leftTs; val rts = rightTs
    val lOut = left.output; val rOut = right.output
    val outAttrs = output
    val keySchema = DataTypeUtils.fromAttributes(
      leftKeys.map(_.asInstanceOf[Attribute]))
    val rightWidth = right.output.size
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      // downstream consumers (and SparkPlan's byte-array collector)
      // expect UnsafeRow, so the JoinedRow is flattened on emit.
      // Bound to the NULL-WIDENED output attrs, not the children's —
      // a projection built from the right child's non-nullable attrs
      // would skip null checks and serialize the null-extension as 0.
      // (BindReferences takes nullability from the INPUT schema, so the
      // widened attrs must appear on both sides of the binding)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      // CODEGEN'D orderings (the same generator sort-merge join probes
      // with) instead of interpreted per-row compare() calls; the ts
      // ordering compares the projected 1-column rows directly, so no
      // value is ever extracted from a reused projection buffer (a
      // string/decimal ts extracted by get() would alias the buffer
      // and corrupt on the next advanceRight)
      val keyOrd = GenerateOrdering.create(keySchema)
      val tsSchema = DataTypeUtils.fromAttributes(
        Seq(AttributeReference("ts", tsType)()))
      val tsOrd = GenerateOrdering.create(tsSchema)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTs: InternalRow = _
        private var held: InternalRow = _ // last right row ≤ current probe
        private var heldKey: InternalRow = _
        // SQL null semantics (equi-join discipline, unlike a raw
        // ordering where NULL == NULL): right rows with a null key or
        // null ts can never match — skip them on ingest
        private def advanceRight(): Unit = {
          rRow = null; rKey = null; rTs = null
          var scan = rIter.hasNext
          while (scan) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTsProj(r)
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = r.copy()
              rKey = rKeyProj(rRow).copy()
              rTs = rTsProj(rRow).copy()
              scan = false
            } else scan = rIter.hasNext
          }
        }
        advanceRight()
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          // a null-keyed or null-ts left row matches nothing (it also
          // sorts before all non-null rows, so no drain is needed)
          if (lKey.anyNull || lTsRow.isNullAt(0))
            return resultProj(joined(l, nullRight))
          // drain right rows at-or-before (lKey, lTs); remember the
          // latest per key — O(1) state, single pass over both sides
          var continue = rRow != null
          while (continue) {
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && tsOrd.compare(rTs, lTsRow) <= 0)) {
              if (kc == 0) { held = rRow; heldKey = rKey }
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
          val matched = held != null && keyOrd.compare(heldKey, lKey) == 0
          resultProj(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

