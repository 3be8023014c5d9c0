package graft.store.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters

/** The planner-side pushdown hook for [[GraftScanBuilder]].
  *
  * Spark's file sources receive their filters through the
  * catalyst-expression hook (`SupportsPushDownCatalystFilters`) rather
  * than the public translated-`Filter` one — implementing the same hook
  * here means (a) the graft stats pruning sees the filters BEFORE
  * translation lossiness, and (b) the expressions can be forwarded
  * verbatim into the wrapped parquet builder so its own pushdown and
  * `PushedFilters` display work unchanged. This class is the single
  * touchpoint with that interface; everything else in the SQL tier is
  * public connector API. */
private[sql] abstract class Dsv2Bridge
    extends SupportsPushDownCatalystFilters {

  /** Receives the planner's catalyst filters; returns the residuals
    * Spark must keep in a Filter node. */
  protected def pushGraft(filters: Seq[Expression]): Seq[Expression]

  /** The wrapped Spark builder, once filters decided the file list. */
  protected def pushedDelegate: Option[FileScanBuilder]

  final override def pushFilters(filters: Seq[Expression])
      : Seq[Expression] = pushGraft(filters)

  final override def pushedFilters(): Array[Predicate] =
    pushedDelegate.map(b => b.pushedFilters)
      .getOrElse(Array.empty[Predicate])

  /** Forward the catalyst filters into a wrapped file-source builder. */
  protected final def forwardFilters(b: FileScanBuilder,
      fs: Seq[Expression]): Seq[Expression] = b.pushFilters(fs)
}
