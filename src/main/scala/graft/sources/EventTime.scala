package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-probed event-time decode.
  *
  * The events parquet's `ts` column resolves differently across Spark
  * builds and parquet writers: TIMESTAMP(µs/ns, isAdjustedToUTC=true)
  * reads as TIMESTAMP, isAdjustedToUTC=false as TIMESTAMP_NTZ (Spark 4
  * infers NTZ natively), and legacy raw-int64 reads surface LongType
  * nanoseconds. Depending on a legacy read conf
  * (`spark.sql.legacy.parquet.nanosAsLong`) is brittle — it silently
  * stopped taking effect on Spark 4.1.2 — so probe the *resolved* schema
  * and decode to epoch microseconds explicitly. Microseconds are the
  * cross-engine precision floor (DuckDB TIMESTAMP is µs), so every
  * event-time operator (windows, sessionize, as-of, range joins) works on
  * the decoded `tus` BIGINT and is bit-exact across engines.
  */
object EventTime {

  /** Epoch-microsecond BIGINT column decoded from `tsCol`, probed from
    * `df`'s resolved schema. TIMESTAMP → `unix_micros`; TIMESTAMP_NTZ →
    * `timestampdiff(MICROSECOND, ntz-epoch, ts)` (deterministic — no
    * session-timezone cast); BIGINT → `DIV 1000` (legacy raw-nanos). */
  def epochMicros(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case TimestampNTZType =>
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `$tsCol`)")
      case LongType => expr(s"`$tsCol` DIV 1000")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time type for `$tsCol`: $other " +
            "(expected TIMESTAMP, TIMESTAMP_NTZ, or BIGINT nanos)")
    }

  /** `df` plus column `out` = epoch-µs BIGINT decoded from `tsCol`. */
  def withEpochMicros(
      df: DataFrame,
      out: String = "tus",
      tsCol: String = "ts"): DataFrame =
    df.withColumn(out, epochMicros(df, tsCol))
}
