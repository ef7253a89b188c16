package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A deterministic, EXTERNALLY-SHAPED Iceberg v1 FileSystem table
  * built from the `nation` test table — the certification fixture for
  * [[IcebergExport.readExternal]] (the reference's sync-logs.sh
  * registration flow produces tables graft must consume, not just
  * emit; scripts/sync-logs.sh:1-86).
  *
  * Deliberately NOT the shape [[IcebergExport.export]] writes, so the
  * read path is proven against an independent writer, not a
  * round-trip of our own conventions:
  *  - format-version 1 with a bare `schema` and flat `partition-spec`
  *    (our export writes v2 `schemas`/`partition-specs`);
  *  - Avro manifests with the v1 field set — no sequence numbers, no
  *    `content` columns, no field-id props;
  *  - identity partition values TYPED (int) and present ONLY in the
  *    manifests — the data files do not contain the partition column
  *    (the hive-writer convention), so a reader that ignores manifest
  *    partition values returns the wrong schema;
  *  - no `version-hint.text` (the reader's highest-`v<N>` fallback);
  *  - TWO snapshots with the STALE one listed first in
  *    `metadata.json`, so a reader that grabs the first
  *    `manifest-list` string instead of anchoring on
  *    `current-snapshot-id` reads one file instead of five.
  *
  * Built once per sf-dir under /tmp (marker-file idempotent), like
  * [[graft.operators.LakeAnalytics]]'s lake fixtures.
  */
object IcebergFixture {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def externalNationTable(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val loc = s"/tmp/graft_ice_ext_v1_${Integer.toHexString(dir.hashCode & 0x7fffffff)}"
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new Path(loc).getFileSystem(conf)
      val marker = new Path(s"$loc/_built")
      if (!fs.exists(marker)) {
        fs.delete(new Path(loc), true)
        fs.mkdirs(new Path(s"$loc/data"))
        fs.mkdirs(new Path(s"$loc/metadata"))
        val nation = Tables.nation(spark, dir)
        val counts = nation.groupBy(col("n_regionkey")).count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val keys = counts.keys.toSeq.sorted
        require(keys.size >= 2, "fixture needs at least two regions for two snapshots")
        // one data file per region, WITHOUT the partition column
        val dataFiles: Seq[(String, Int)] = keys.map { k =>
          val stage = s"$loc/_stage_r$k"
          nation.filter(col("n_regionkey") === k)
            .select(col("n_nationkey"), col("n_name"))
            .coalesce(1).write.mode("overwrite").parquet(stage)
          val part = fs.listStatus(new Path(stage)).map(_.getPath)
            .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"no parquet part file under $stage"))
          val target = new Path(s"$loc/data/r$k.parquet")
          require(fs.rename(part, target), s"rename of $part failed")
          fs.delete(new Path(stage), true)
          (s"file://${target.toUri.getPath}", k)
        }
        // v1-shaped Avro schemas (see Scaladoc: independent writer)
        val entrySchema = new Schema.Parser().parse(
          """{"type":"record","name":"manifest_entry","fields":[
            |{"name":"status","type":"int"},
            |{"name":"snapshot_id","type":["null","long"],"default":null},
            |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
            |{"name":"file_path","type":"string"},
            |{"name":"file_format","type":"string"},
            |{"name":"partition","type":{"type":"record","name":"r102","fields":[
            |{"name":"n_regionkey","type":["null","int"],"default":null}]}},
            |{"name":"record_count","type":"long"},
            |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)
        val listSchema = new Schema.Parser().parse(
          """{"type":"record","name":"manifest_file","fields":[
            |{"name":"manifest_path","type":"string"},
            |{"name":"manifest_length","type":"long"},
            |{"name":"partition_spec_id","type":"int"},
            |{"name":"added_snapshot_id","type":["null","long"],"default":null}]}"""
            .stripMargin)
        val dfSchema = entrySchema.getField("data_file").schema()
        val partSchema = dfSchema.getField("partition").schema()
        def entry(uri: String, k: Int, snap: Long): GenericRecord = {
          val part = new GenericData.Record(partSchema)
          part.put("n_regionkey", k)
          val d = new GenericData.Record(dfSchema)
          d.put("file_path", uri)
          d.put("file_format", "PARQUET")
          d.put("partition", part)
          d.put("record_count", counts(k))
          d.put("file_size_in_bytes",
            fs.getFileStatus(new Path(s"$loc/data/r$k.parquet")).getLen)
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1)
          e.put("snapshot_id", snap)
          e.put("data_file", d)
          e
        }
        def listRec(p: Path, len: Long, snap: Long): GenericRecord = {
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", s"file://${p.toUri.getPath}")
          r.put("manifest_length", len)
          r.put("partition_spec_id", 0)
          r.put("added_snapshot_id", snap)
          r
        }
        val snapA = 1111L // stale: first region only
        val snapB = 2222L // current: every region, two manifests
        val mA = new Path(s"$loc/metadata/00000-mA.avro")
        val lenA = IcebergExport.writeAvro(spark, mA, entrySchema, Map.empty,
          dataFiles.take(1).iterator.map { case (u, k) => entry(u, k, snapA) })
        val mB = new Path(s"$loc/metadata/00001-mB.avro")
        val lenB = IcebergExport.writeAvro(spark, mB, entrySchema, Map.empty,
          dataFiles.drop(1).iterator.map { case (u, k) => entry(u, k, snapB) })
        val listA = new Path(s"$loc/metadata/snap-A.avro")
        IcebergExport.writeAvro(spark, listA, listSchema, Map.empty,
          Iterator.single(listRec(mA, lenA, snapA)))
        val listB = new Path(s"$loc/metadata/snap-B.avro")
        IcebergExport.writeAvro(spark, listB, listSchema, Map.empty,
          Iterator(listRec(mA, lenA, snapA), listRec(mB, lenB, snapB)))
        val metadata =
          s"""{"format-version":1,
             |"table-uuid":"10000000-2000-3000-4000-500000000000",
             |"location":"file://$loc",
             |"last-updated-ms":1,
             |"last-column-id":3,
             |"schema":{"type":"struct","fields":[
             |{"id":1,"name":"n_nationkey","required":false,"type":"int"},
             |{"id":2,"name":"n_name","required":false,"type":"string"},
             |{"id":3,"name":"n_regionkey","required":false,"type":"int"}]},
             |"partition-spec":[{"name":"n_regionkey","transform":"identity",
             |"source-id":3,"field-id":1000}],
             |"properties":{},
             |"current-snapshot-id":$snapB,
             |"snapshots":[
             |{"snapshot-id":$snapA,"timestamp-ms":1,
             |"manifest-list":"file://${listA.toUri.getPath}"},
             |{"snapshot-id":$snapB,"timestamp-ms":2,
             |"manifest-list":"file://${listB.toUri.getPath}"}]}""".stripMargin
        val out = fs.create(new Path(s"$loc/metadata/v1.metadata.json"), true)
        out.write(metadata.getBytes("UTF-8"))
        out.close()
        // deliberately NO version-hint.text — exercises the fallback
        fs.create(marker).close()
      }
      loc
    })
}
