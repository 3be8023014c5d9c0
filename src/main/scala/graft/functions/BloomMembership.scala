package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + membership as native expressions — the runtime
  * semi-join-reduction primitive (Bloom, CACM 1970; the plan pattern is
  * Spark's own `InjectRuntimeFilter`, which materializes a
  * `BloomFilterAggregate` over the creation side and pre-filters the
  * application side with `BloomFilterMightContain` before the join's
  * exchange).
  *
  * The build is a [[TypedImperativeAggregate]] over `spark-sketch`'s
  * [[BloomFilter]]: each partition inserts its keys into a local filter
  * and partials combine by `mergeInPlace` (bitwise OR of the bit arrays)
  * — commutative, associative, and insertion-order-free, so the final
  * bitset is a pure function of the key SET however the data is
  * partitioned. Murmur3 key hashing is JVM-independent. The finished
  * filter is a fixed-size byte payload (the analogue of a broadcast
  * variable, NOT a data collect): at 1% fpp it costs ~1.2 bytes per
  * distinct key regardless of row width, which is why shipping it to
  * every fact-scan task is cheap even when the dim side itself is too
  * large to broadcast as rows.
  *
  * Membership is a codegen'd [[UnaryExpression]] holding the serialized
  * filter; the deserialized bitset is cached per task JVM in a transient
  * lazy val, so the hot path is two Murmur3 probes per row inside
  * whole-stage codegen.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key column, got ${child.dataType}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** `bloom_check(key)`: true iff `key` MIGHT be in the filter — no false
  * negatives, so `filter(bloom_check(k))` before an exact join never
  * changes the join's result; false positives only cost shuffle bytes. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_check"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key column, got ${child.dataType}")

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Called from both interpreted eval and generated code. */
  def test(v: Long): Boolean = bf.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression instance so the generated code reuses its
    // lazily-deserialized filter (one bitset per task JVM, not per row)
    val ref = ctx.addReferenceObj("bloomCheck", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMembership {

  /** Default false-positive rate: 3% keeps the filter ~1 byte/key while
    * pruning 97% of non-matching fact rows before the join exchange. */
  val DefaultFpp = 0.03

  def bloom_build(spark: SparkSession, c: Column, expectedItems: Long,
      fpp: Double = DefaultFpp): Column = {
    val name = s"bloom_build_${expectedItems}_${(fpp * 1e6).toLong}"
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        name, exprs => BloomBuildAgg(exprs.head, expectedItems, fpp),
        "built-in")
    call_function(name, c)
  }

  def bloom_check(spark: SparkSession, c: Column,
      filterBytes: Array[Byte]): Column = {
    // name keyed by filter content: re-registration for a different
    // filter must not rebind an already-analyzed plan's function
    val md = java.security.MessageDigest.getInstance("MD5")
    val name = "bloom_check_" +
      md.digest(filterBytes).take(6).map("%02x".format(_)).mkString
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        name, exprs => BloomMightContain(exprs.head, filterBytes), "built-in")
    call_function(name, c)
  }
}
