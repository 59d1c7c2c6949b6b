package graft

import org.apache.spark.sql.ColumnName

/** `$"col"` string-interpolator syntax without needing a SparkSession's
  * implicits in scope (mirrors SQLImplicits.StringToColumn). */
object ColSyntax {
  implicit class StringToColumn(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
