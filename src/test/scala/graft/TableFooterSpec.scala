package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Footer-level driver-data contract guard for EVERY table (r10 verdict
  * item 2). The r9 incident proved that driver regenerations can change
  * the PHYSICAL parquet encoding without touching row counts or value
  * ranges — `events.ts` flipped from INT64 TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS) and every time-sensitive query silently read
  * ÷1000-compressed history. `ts` was just the first casualty: the same
  * class of drift on any column (an INT32 widened to INT64, a DOUBLE
  * re-emitted as FLOAT, a timestamp unit change on o_orderdate) would
  * either fail the declared-schema read with a confusing vectorized-reader
  * error or, worse, misread silently.
  *
  * This spec reads the parquet FOOTER of the first data file of every
  * table at /root/testdata/sf0.001 and asserts, per declared column in
  * [[Schemas.all]]:
  *  - the column exists in the file (a silently null-filled column is the
  *    most dangerous drift — declared-schema reads don't error on it);
  *  - the physical primitive type + logical-type annotation is one the
  *    declared Spark type actually decodes (not merely "reads without
  *    crashing");
  *  - no scalar column is REPEATED (repetition drift);
  * and that the file declares no EXTRA top-level columns (an added column
  * is non-breaking for declared reads but is still contract drift the
  * next round must consciously adopt, not silently ignore).
  *
  * `events.ts` is the one column with TWO sanctioned encodings
  * (TIMESTAMP(MICROS/MILLIS) native, or TIMESTAMP(NANOS)/unannotated
  * INT64 via the Tables.events footer detector) — both accepted here,
  * anything else rejected, mirroring Tables.tsEncoding exactly.
  */
class TableFooterSpec extends AnyFunSuite {
  import TestBase.sf0001

  private val conf = TestBase.spark.sparkContext.hadoopConfiguration

  /** First non-hidden, non-empty data file under a table directory. */
  private def firstDataFile(dir: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) p
    else {
      val fl = fs.listStatus(p).toSeq
        .filter(x => x.isFile && x.getLen > 0 && {
          val n = x.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .sortBy(_.getPath.getName)
      assert(fl.nonEmpty, s"no parquet data files under $dir")
      fl.head.getPath
    }
  }

  private def footerSchema(dir: String): MessageType = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(firstDataFile(dir), conf))
    try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
  }

  /** Is (physical, annotation) a sanctioned encoding of the declared
    * Spark type? Table/field threaded through for the events.ts special
    * case and for error messages. */
  private def primitiveOk(dt: DataType, prim: PrimitiveType,
                          table: String, field: String): Boolean = {
    val ann = prim.getLogicalTypeAnnotation
    def intAnnOk(bits: Int): Boolean = ann match {
      case null => true
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
        i.getBitWidth == bits && i.isSigned
      case _ => false
    }
    (dt, prim.getPrimitiveTypeName) match {
      case (IntegerType, INT32) => intAnnOk(32)
      case (LongType, INT64) => intAnnOk(64)
      case (DoubleType, DOUBLE) => ann == null
      case (FloatType, FLOAT) => ann == null
      case (StringType, BINARY) =>
        ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case (TimestampType, INT64) => ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          import LogicalTypeAnnotation.TimeUnit._
          t.getUnit match {
            case MICROS | MILLIS => true
            // ns is only decodable through the Tables.events detector path
            case NANOS => table == "events" && field == "ts"
          }
        // unannotated INT64 ns: the legacy driver events shape
        case null => table == "events" && field == "ts"
        case _ => false
      }
      case _ => false
    }
  }

  /** Descend a parquet LIST group to its element type (3-level standard
    * `list.element`, or legacy 2-level repeated element). */
  private def listElement(g: GroupType): Type = {
    assert(g.getLogicalTypeAnnotation
      .isInstanceOf[LogicalTypeAnnotation.ListLogicalTypeAnnotation],
      s"array column group lacks LIST annotation: $g")
    val mid = g.getType(0)
    if (mid.isPrimitive) mid // legacy 2-level: repeated primitive
    else {
      val mg = mid.asGroupType() // 3-level standard: repeated group list { element }
      assert(mg.getFieldCount == 1, s"unexpected list structure: $g")
      mg.getType(0)
    }
  }

  private def checkField(table: String, sf: StructField, pq: Type): Unit = {
    assert(pq.getRepetition != Type.Repetition.REPEATED || sf.dataType.isInstanceOf[ArrayType],
      s"$table.${sf.name}: scalar column has REPEATED repetition")
    sf.dataType match {
      case ArrayType(elem, _) =>
        assert(!pq.isPrimitive, s"$table.${sf.name}: declared array but physical primitive $pq")
        val el = listElement(pq.asGroupType())
        assert(el.isPrimitive, s"$table.${sf.name}: list element is not primitive: $el")
        assert(primitiveOk(elem, el.asPrimitiveType(), table, sf.name),
          s"$table.${sf.name}: element encoding drifted: ${el.asPrimitiveType()} " +
            s"does not decode as $elem")
      case dt =>
        assert(pq.isPrimitive, s"$table.${sf.name}: declared $dt but physical group $pq")
        assert(primitiveOk(dt, pq.asPrimitiveType(), table, sf.name),
          s"$table.${sf.name}: physical encoding drifted: " +
            s"${pq.asPrimitiveType().getPrimitiveTypeName}/" +
            s"${pq.asPrimitiveType().getLogicalTypeAnnotation} does not decode as $dt")
    }
  }

  for ((table, schema) <- Schemas.all.toSeq.sortBy(_._1)) {
    test(s"driver $table.parquet footer matches the declared schema") {
      assume(new java.io.File(s"$sf0001/$table.parquet").exists(),
        s"$sf0001/$table.parquet not present")
      val msg = footerSchema(s"$sf0001/$table.parquet")
      val physNames = (0 until msg.getFieldCount).map(msg.getType(_).getName)
      // every declared column must exist physically — a missing column
      // null-fills silently under a declared-schema read
      for (sf <- schema.fields) {
        assert(physNames.contains(sf.name),
          s"$table.${sf.name}: declared column MISSING from parquet footer " +
            s"(file has: ${physNames.mkString(", ")})")
        checkField(table, sf, msg.getType(msg.getFieldIndex(sf.name)))
      }
      // and no extra columns: additions are contract drift to adopt loudly
      val extra = physNames.toSet -- schema.fieldNames.toSet
      assert(extra.isEmpty,
        s"$table: parquet has undeclared columns ${extra.mkString(", ")} — " +
          "driver data contract drifted; update Schemas and re-audit queries")
    }
  }
}
