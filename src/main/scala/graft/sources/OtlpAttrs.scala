package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The OTLP/JSON attribute shape and its column helpers, shared by
  * all three signal parsers ([[OtlpLogs]], [[OtlpTraces]],
  * [[OtlpMetrics]]) — one definition, so a fix to value coalescing
  * (e.g. adding arrayValue support) lands on every signal at once.
  */
private[sources] object OtlpAttrs {

  val attrType: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("stringValue", StringType),
      StructField("intValue", StringType), // OTLP/JSON encodes int64 as string
      StructField("doubleValue", DoubleType),
      StructField("boolValue", BooleanType)))))))

  def attrValue(v: Column): Column =
    coalesce(v.getField("stringValue"), v.getField("intValue"),
      v.getField("doubleValue").cast("string"), v.getField("boolValue").cast("string"))

  /** attribute list → canonical JSON object string (the reference
    * stores resource/scope/record attributes as JSON strings).
    */
  def attrsJson(attrs: Column): Column =
    when(attrs.isNotNull,
      to_json(map_from_entries(transform(attrs,
        a => struct(a.getField("key").as("key"), attrValue(a.getField("value")).as("value"))))))

  /** Value of one attribute key, NULL when absent (try_element_at: an
    * ANSI element_at would throw on the empty filtered array).
    */
  def resourceAttr(attrs: Column, key: String): Column =
    try_element_at(transform(filter(attrs, a => a.getField("key") === key),
      a => attrValue(a.getField("value"))), lit(1))
}
