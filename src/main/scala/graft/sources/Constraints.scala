package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative constraint validation. Spark enforces no PK/UK/FK/NOT
  * NULL (the reference declares all four, aggregation_example.sql:1-14,
  * :211-218); the engine's stance is SURVEY §1.3: schemas are
  * StructType contracts and constraints are cheap distributed
  * validation jobs run at load/build time.
  *
  * Each check returns a violation COUNT (0 = constraint holds) so a
  * whole constraint suite is one small aggregate per table — no
  * collects, broadcast-sized output.
  */
object Constraints {

  /** PRIMARY KEY / UNIQUE: number of key values appearing more than once. */
  def primaryKeyViolations(df: DataFrame, keyCols: String*): Long =
    df.groupBy(keyCols.map(col): _*).count()
      .filter(col("count") > 1).count()

  /** NOT NULL: rows with a null in any of the given columns. */
  def notNullViolations(df: DataFrame, cols: String*): Long =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _)).count()

  /** FOREIGN KEY: child rows whose non-null key has no parent (anti-join). */
  def foreignKeyOrphans(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): Long =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .count()
}
