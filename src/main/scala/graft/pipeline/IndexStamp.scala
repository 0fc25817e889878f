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
    * the rows' (required-uniform) value, else None — empty AND unstamped,
    * which callers must treat as unverifiable, not as a pass. */
  def read(index: DataFrame, colName: String): Option[String] = {
    val field = index.schema(index.schema.fieldIndex(colName))
    val md = field.metadata
    if (md.contains(colName)) {
      // metadata values keep their original JSON type; stamps are written
      // as strings or longs — anything else is a FUTURE writer this
      // reader does not understand, which must surface as its own error,
      // not as an opaque cast failure from the wrong typed getter
      val v =
        try md.getString(colName)
        catch {
          case _: Exception =>
            try md.getLong(colName).toString
            catch {
              case _: Exception =>
                throw new IllegalArgumentException(
                  s"stamp metadata '$colName' carries a type this reader " +
                    s"does not understand (not a string or long): " +
                    s"${md.json} — written by a newer builder; upgrade " +
                    "the reader before probing this index")
            }
        }
      Some(v)
    } else {
      // data-row fallback for metadata-less tables (externally written —
      // every index THIS library writes carries metadata and never takes
      // this path): a raw append that bypassed the validated delta
      // builders could leave MIXED stamps, and blessing whichever row
      // head() returns would validate a poisoned index — demand
      // uniformity. This is a column-pruned distinct AGGREGATION over
      // the stamp column (a real scan, unlike the old first-row fetch) —
      // the deliberate price of admitting foreign-written state at all;
      // only the RESULT is bounded at two rows
      val vals = index.select(colName).distinct().limit(2).collect()
      if (vals.length > 1)
        throw new IllegalArgumentException(
          s"stored index carries MIXED '$colName' stamps (e.g. " +
            s"'${vals(0).get(0)}' and '${vals(1).get(0)}') — rows from " +
            "different schemes were appended without validation; the " +
            "index is poisoned and must be rebuilt")
      vals.headOption.map(r => String.valueOf(r.get(0)))
    }
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
