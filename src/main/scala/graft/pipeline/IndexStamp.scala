package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Scheme-stamp plumbing for STORED index tables (band/simhash/phash
  * indexes, shingle-set sidecars): signatures from different schemes never
  * collide, so a probe against a mismatched index silently finds zero
  * candidates — every stored index therefore carries its scheme, and every
  * probe fails loudly on a mismatch.
  *
  * Stamps live in TWO places:
  *  - a constant data column (`hash_family`, `ph_bits`, ...) — readable by
  *    any engine that scans the table;
  *  - the SAME value as schema-level column METADATA — Spark persists
  *    field metadata through parquet round-trips, so the scheme stays
  *    verifiable even when the index has ZERO rows (a first-row probe on
  *    an empty index would skip the check entirely and a misconfigured
  *    ingest would silently yield only batch-internal pairs).
  */
private[graft] object IndexStamp {

  def string(key: String, value: String): Metadata =
    new MetadataBuilder().putString(key, value).build()

  def long(key: String, value: Long): Metadata =
    new MetadataBuilder().putLong(key, value).build()

  /** The stamp for `colName` rendered as a string: schema metadata under
    * the column's own name when present (works on an empty index), else
    * the first row's value, else None — empty AND unstamped, which
    * callers must treat as unverifiable, not as a pass. */
  def read(index: DataFrame, colName: String): Option[String] = {
    val field = index.schema(index.schema.fieldIndex(colName))
    val md = field.metadata
    if (md.contains(colName)) {
      // metadata values keep their original JSON type; render uniformly
      val v =
        try md.getString(colName)
        catch { case _: Exception => md.getLong(colName).toString }
      Some(v)
    } else index.select(colName).head(1).headOption.map(r => String.valueOf(r.get(0)))
  }

  /** Require `colName`'s stamp to equal `expected` (string-rendered),
    * failing loudly on a mismatch OR when the index is empty and carries
    * no metadata stamp (unverifiable). `what` names the index kind in the
    * error. */
  def require(
      index: DataFrame, colName: String, expected: String, what: String): Unit = {
    Predef.require(index.columns.contains(colName),
      s"stored $what has no $colName column — built by a pre-versioning " +
        s"build; rebuild it (schemes are not cross-compatible)")
    read(index, colName) match {
      case Some(got) =>
        Predef.require(got == expected,
          s"stored $what was built with $colName '$got', which does not match " +
            s"this operation's '$expected' — values never collide across " +
            "schemes; rebuild the index or pass the matching parameters")
      case None =>
        throw new IllegalArgumentException(
          s"stored $what is EMPTY and carries no $colName schema metadata — " +
            "the scheme cannot be verified, and probing an unverifiable index " +
            "would silently yield batch-internal results only; rebuild it " +
            "with the current builder (stamps persist even through empty " +
            "parquet writes)")
    }
  }
}
