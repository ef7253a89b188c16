package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DEBEZIUM ENVELOPE INTAKE — the standard changelog JSON shape
  * (debezium.io: `before`/`after`/`op`/`source`/`ts_ms`, optionally
  * under a `payload` wrapper when the connector ships inline schemas)
  * parsed into [[CdcApply]]'s (rows, opCol, seqCol) contract, so a
  * real CDC topic can drive the lake sink without a custom mapper:
  *
  * {{{
  * val changes = CdcDebezium.parse(raw, col("value"), tableSchema)
  * CdcApply.start(changes, root, keys, checkpoint,
  *   opCol = "op", seqCol = Some("lsn"))
  * }}}
  *
  * MAPPING (one rule per Debezium op code):
  *  - `c` (create), `r` (snapshot read) → [[CdcApply.OpInsert]], row
  *    from `after`;
  *  - `u` (update) → [[CdcApply.OpUpdate]], row from `after` (the new
  *    values; `before` is not needed — the equality delete retracts
  *    by key);
  *  - `d` (delete) → [[CdcApply.OpDelete]], row from `before` (only
  *    the key columns matter downstream);
  *  - Kafka TOMBSTONES (null value) and unparseable/op-less payloads
  *    drop — compaction markers, not changes.
  *
  * ORDERING: Postgres publishes a monotone `source.lsn` — used
  * directly. MySQL publishes (`source.file`, `source.pos`), and POS
  * ALONE IS NOT MONOTONE — it resets at every binlog rotation, so a
  * bare-pos order could prefer an older change (or refuse a spurious
  * tie) across a rotation boundary. When `file` is present its
  * numeric suffix (the binlog ordinal, e.g. `mysql-bin.000007` → 7)
  * composes with pos into one orderable long
  * (`ordinal · 2⁴⁰ + pos` — pos is bounded by max_binlog_size ≪ 2⁴⁰,
  * ordinals by the 6-digit naming ≪ 2²³, so the composition neither
  * collides nor overflows; an OVERSIZED ordinal, e.g. an epoch-named
  * log, REFUSES loudly — any fallback scale would inter-order wrongly
  * against composed values, and a CDC sink must never silently keep a
  * stale row). Bare `pos` (no file field at all) and `ts_ms` remain
  * last-resort fallbacks with exactly the rotation caveat above —
  * documented, not hidden. Passing the result as
  * [[CdcApply.start]]'s `seqCol` gives latest-wins batch resolution
  * with the tie refusal documented there (two DIFFERENT changes for
  * one key at one lsn refuse rather than pick nondeterministically).
  *
  * `tableSchema` is the LAKE's column schema; `before`/`after` parse
  * under it by name. Connectors encoding temporal columns numerically
  * (io.debezium.time.MicroTimestamp → long) should declare those
  * columns as LongType here and cast after parsing — from_json cannot
  * guess the wire encoding.
  *
  * 100 TB: a pure projection over the stream — no shuffle, no state;
  * the whole cost model stays [[CdcApply]]'s O(batch) per commit.
  */
object CdcDebezium {

  /** Envelope schema for `tableSchema`, payload-wrapped or bare. */
  private def envelopeSchema(tableSchema: StructType): StructType = {
    val inner = StructType(Seq(
      StructField("before", tableSchema, nullable = true),
      StructField("after", tableSchema, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("ts_ms", LongType, nullable = true),
      StructField("source", StructType(Seq(
        StructField("lsn", LongType, nullable = true),
        StructField("file", StringType, nullable = true),
        StructField("pos", LongType, nullable = true))), nullable = true)))
    StructType(inner.fields :+ StructField("payload", inner, nullable = true))
  }

  /** Parse raw Debezium JSON envelopes (`jsonCol`) into CdcApply's
    * input shape: the table columns + `op` (I/U/D) + `lsn`. Works on
    * batch and streaming frames alike (pure projection).
    */
  def parse(envelopes: DataFrame, jsonCol: Column,
            tableSchema: StructType): DataFrame = {
    val parsed = envelopes
      .select(from_json(jsonCol, envelopeSchema(tableSchema)).as("__dbz"))
      // payload-wrapped envelopes win when present; bare otherwise
      .select(
        coalesce(col("__dbz.payload.op"), col("__dbz.op")).as("__op"),
        coalesce(col("__dbz.payload.after"), col("__dbz.after")).as("__after"),
        coalesce(col("__dbz.payload.before"), col("__dbz.before")).as("__before"),
        {
          // MySQL (file, pos) → one monotone long; see ORDERING above.
          // Ordinals >= 2²³ would overflow the 2⁴⁰ shift into a WRAPPED
          // (even negative) sequence, and ANY fallback scale (ts_ms,
          // bare pos) inter-orders wrongly against already-composed
          // values from conventional log names — so an oversized
          // ordinal (an epoch-suffixed log name, not the 6-digit
          // binlog convention) REFUSES loudly: silent stale-row wins
          // are the one outcome a CDC sink must never produce; such
          // deployments map their own seqCol.
          val tsMs = coalesce(col("__dbz.payload.ts_ms"), col("__dbz.ts_ms"))
          def filePos(src: String) = {
            val ord = regexp_extract(col(s"$src.file"), "([0-9]+)$", 1)
              .cast(LongType)
            when(ord.isNotNull && col(s"$src.pos").isNotNull,
              when(ord < lit(1L << 23), shiftleft(ord, 40) + col(s"$src.pos"))
                .otherwise(raise_error(concat(
                  lit("binlog ordinal too large to compose a monotone lsn " +
                    "(file '"), col(s"$src.file"),
                  lit("'); supply a custom ordering column"))).cast(LongType)))
          }
          coalesce(col("__dbz.payload.source.lsn"), col("__dbz.source.lsn"),
            filePos("__dbz.payload.source"), filePos("__dbz.source"),
            col("__dbz.payload.source.pos"), col("__dbz.source.pos"),
            tsMs).as("lsn")
        })
      // tombstones / unparseable payloads carry no op — drop, they are
      // compaction markers, not changes
      .filter(col("__op").isin("c", "r", "u", "d"))
    val row = when(col("__op") === "d", col("__before")).otherwise(col("__after"))
    val op = when(col("__op") === "d", lit(CdcApply.OpDelete))
      .when(col("__op") === "u", lit(CdcApply.OpUpdate))
      .otherwise(lit(CdcApply.OpInsert))
    parsed.select(
      tableSchema.fieldNames.toSeq.map(n => row.getField(n).as(n)) ++
        Seq(op.as("op"), col("lsn")): _*)
  }
}
