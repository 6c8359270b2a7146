package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.{ArrayOps, DotProduct}

/** Codegen/interpreted parity for the one kernel with a real
  * `doGenCode`: [[DotProduct]] evaluated through a DataFrame plan
  * (whole-stage codegen) and through `Expression.eval` on literals
  * (interpreted) must both equal the plain-Scala left-fold — including
  * the null contract (null result on length mismatch or any null
  * element). A divergence between the two engine paths is exactly the
  * class of bug a fixed-fixture spec never catches.
  */
object FunctionsProps extends Properties("graft.functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(PropDraws(30))

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val arrGen: Gen[List[Option[Float]]] = for {
    n <- Gen.choose(0, 12)
    vs <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.choose(-8.0f, 8.0f).map(Some(_)),
      1 -> Gen.const(None)))
  } yield vs

  property("DotProduct: codegen plan, interpreted eval, and plain Scala agree bit-exactly") =
    forAll(arrGen, arrGen) { (a, b) =>
      val truth: Option[Double] =
        if (a.length != b.length || a.exists(_.isEmpty) || b.exists(_.isEmpty))
          None
        else Some(a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
          s + x.get.toDouble * y.get.toDouble
        })

      val at = ArrayType(FloatType, containsNull = true)
      val la = Literal.create(a.map(_.map(Float.box).orNull), at)
      val lb = Literal.create(b.map(_.map(Float.box).orNull), at)
      val interpreted = Option(DotProduct(la, lb).eval(InternalRow.empty))
        .map(_.asInstanceOf[Double])

      val row = Seq((a, b)).toDF("a", "b")
        .select(ArrayOps.dot($"a", $"b").as("d")).head()
      val codegen =
        if (row.isNullAt(0)) None else Some(row.getDouble(0))

      Prop(interpreted == truth) :|
        s"interpreted=$interpreted truth=$truth a=$a b=$b" &&
        Prop(codegen == truth) :|
        s"codegen=$codegen truth=$truth a=$a b=$b"
    }
}
