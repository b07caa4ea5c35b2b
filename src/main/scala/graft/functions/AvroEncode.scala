package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.io.{BinaryEncoder, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Encode a struct column as Avro binary under the given writer schema —
  * the inverse of [[AvroDecode]], used by the produce/ingest path (the
  * reference's test harness role, `KafkaLoader.java:89-148`, which fed
  * engine rows back into Kafka) and by Kafka sinks. Nullable fields encode
  * as `union[null, T]` with branch index 0=null, 1=value (Rakam's layout,
  * reference `PageDatumReader.java:127-129` reads the same).
  */
case class AvroEncode(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val structType =
    child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  @transient private var encoder: BinaryEncoder = _

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val out = new ByteArrayOutputStream()
    encoder = EncoderFactory.get().binaryEncoder(out, encoder)
    val fields = schema.getFields
    var i = 0
    while (i < fields.size()) {
      val f = fields.get(i)
      val dt = structType(i).dataType
      write(f.schema(), dt, row, i)
      i += 1
    }
    encoder.flush()
    out.toByteArray
  }

  private def write(s: Schema, dt: DataType, row: InternalRow, ord: Int): Unit =
    s.getType match {
      case Schema.Type.UNION =>
        // Rakam writes union[null, T] (reference `PageDatumReader.java:127-129`)
        // but a legal Avro schema may declare union[T, null] — locate both
        // branch indices dynamically instead of assuming [null, T].
        val types = s.getTypes
        val nullIdx = (0 until types.size()).find(types.get(_).getType == Schema.Type.NULL)
        val valueIdx = (0 until types.size()).find(types.get(_).getType != Schema.Type.NULL)
        if (row.isNullAt(ord)) {
          val i = nullIdx.getOrElse(throw new UnsupportedOperationException(
            s"null value but union $s has no null branch"))
          encoder.writeIndex(i); encoder.writeNull()
        } else {
          val i = valueIdx.getOrElse(throw new UnsupportedOperationException(
            s"non-null value but union $s has no value branch"))
          encoder.writeIndex(i)
          writeValue(types.get(i), dt, row, ord)
        }
      case _ => writeValue(s, dt, row, ord)
    }

  private def writeValue(s: Schema, dt: DataType, row: InternalRow, ord: Int): Unit =
    (s.getType, dt) match {
      case (Schema.Type.STRING, StringType) => encoder.writeString(row.getUTF8String(ord).toString)
      case (Schema.Type.LONG, LongType) => encoder.writeLong(row.getLong(ord))
      case (Schema.Type.INT, IntegerType) => encoder.writeInt(row.getInt(ord))
      case (Schema.Type.FLOAT, FloatType) => encoder.writeFloat(row.getFloat(ord))
      case (Schema.Type.DOUBLE, DoubleType) => encoder.writeDouble(row.getDouble(ord))
      case (Schema.Type.BOOLEAN, BooleanType) => encoder.writeBoolean(row.getBoolean(ord))
      case (Schema.Type.BYTES, BinaryType) =>
        encoder.writeBytes(row.getBinary(ord))
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val arr = row.getArray(ord)
        encoder.writeArrayStart()
        encoder.setItemCount(arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          encoder.startItem()
          writeArrayElem(s.getElementType, et, arr, i)
          i += 1
        }
        encoder.writeArrayEnd()
      case (Schema.Type.RECORD, st: StructType) =>
        // nested record: recurse field-by-field over the nested InternalRow
        // (beyond reference — its decoder threw on RECORD, so its producer
        // never wrote one)
        val nested = row.getStruct(ord, st.size)
        val fields = s.getFields
        var i = 0
        while (i < fields.size()) {
          write(fields.get(i).schema(), st(i).dataType, nested, i)
          i += 1
        }
      case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
        val m = row.getMap(ord)
        val keys = m.keyArray()
        val vals = m.valueArray()
        encoder.writeMapStart()
        encoder.setItemCount(m.numElements())
        var i = 0
        while (i < m.numElements()) {
          encoder.startItem()
          encoder.writeString(keys.getUTF8String(i).toString)
          // scalar map values only (writeArrayElem's lattice); fail loudly
          // on a null value rather than silently encoding a zero
          if (vals.isNullAt(i)) {
            throw new UnsupportedOperationException(
              s"null map value cannot encode as non-union avro ${s.getValueType}")
          }
          writeArrayElem(s.getValueType, vt, vals, i)
          i += 1
        }
        encoder.writeMapEnd()
      case (st, other) =>
        throw new UnsupportedOperationException(s"cannot encode ${other.sql} as avro $st")
    }

  private def writeArrayElem(s: Schema, dt: DataType, arr: ArrayData, i: Int): Unit =
    (s.getType, dt) match {
      case (Schema.Type.STRING, StringType) => encoder.writeString(arr.getUTF8String(i).toString)
      case (Schema.Type.LONG, LongType) => encoder.writeLong(arr.getLong(i))
      case (Schema.Type.INT, IntegerType) => encoder.writeInt(arr.getInt(i))
      case (Schema.Type.FLOAT, FloatType) => encoder.writeFloat(arr.getFloat(i))
      case (Schema.Type.DOUBLE, DoubleType) => encoder.writeDouble(arr.getDouble(i))
      case (Schema.Type.BOOLEAN, BooleanType) => encoder.writeBoolean(arr.getBoolean(i))
      case (st, other) =>
        throw new UnsupportedOperationException(s"cannot encode array<${other.sql}> as avro $st")
    }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}
