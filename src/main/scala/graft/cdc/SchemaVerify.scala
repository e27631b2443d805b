package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Column-by-column schema diff between a source relation and a target
  * table — the engine's re-expression of the reference's `VerifyRelation`
  * (target/snowflake/snowflake_target.go:219-273), which unions the two
  * column sets and reports every (column, type) pair present on only one
  * side. */
object SchemaVerify {

  final case class ColumnDiff(columnName: String, dataType: String, status: String)

  /** Status values mirror the reference's report: "both" when the (name,
    * type) pair exists on both sides, else "only in: source" /
    * "only in: target". */
  def diff(source: StructType, target: StructType): Seq[ColumnDiff] = {
    def pairs(st: StructType) = st.fields.map(f => (f.name.toLowerCase, f.dataType.simpleString))
    val s = pairs(source).toSet
    val t = pairs(target).toSet
    (s ++ t).toSeq.sorted.map { case (name, tpe) =>
      val status =
        if (s.contains((name, tpe)) && t.contains((name, tpe))) "both"
        else if (s.contains((name, tpe))) "only in: source"
        else "only in: target"
      ColumnDiff(name, tpe, status)
    }
  }

  def matches(source: StructType, target: StructType): Boolean =
    diff(source, target).forall(_.status == "both")

  def diffDf(spark: SparkSession, source: StructType, target: StructType): DataFrame = {
    import spark.implicits._
    diff(source, target).toDF("column_name", "data_type", "status")
  }
}
