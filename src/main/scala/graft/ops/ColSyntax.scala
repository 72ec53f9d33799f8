package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** `$"name"` column syntax without a SparkSession in scope. */
object ColSyntax {
  implicit class ColInterpolator(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
