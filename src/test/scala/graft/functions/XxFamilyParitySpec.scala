package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the JVM-side reproduction of Spark's `xxhash64` composition —
  * the parity a fused xx-family minhash kernel (the
  * [[MinhashBands]]-style restructure of `Dedup.minhashNearDups`) will
  * depend on. Spark's `XxHash64` expression folds its children left to
  * right with the running hash as the seed, starting from 42:
  * `xxhash64(a, b, ...) = H(b, H(a, 42))`, where H dispatches on type —
  * `XXH64.hashUTF8String` for strings, `hashLong` for longs,
  * `hashInt` for ints. If any of this shifts under a Spark upgrade,
  * this spec flags it BEFORE a kernel silently diverges from the
  * composed form the existing gates and specs certify. */
class XxFamilyParitySpec extends SparkSpec {

  private val Seed = 42L

  private def sparkXx(cols: org.apache.spark.sql.Column*): Long = {
    import spark.implicits._
    Seq(1).toDF("i").select(xxhash64(cols: _*)).collect()(0).getLong(0)
  }

  test("xxhash64 over a string + int seed column == hashUTF8String fold") {
    // the minhash signature form: xxhash64(w, lit(i))
    val words = Seq("alpha", "", "ü語", "the quick brown fox")
    for (w <- words; i <- Seq(0, 1, 17, 63)) {
      val composed = sparkXx(lit(w), lit(i))
      val jvm = XXH64.hashInt(i,
        XXH64.hashUTF8String(UTF8String.fromString(w), Seed))
      assert(composed === jvm, s"divergence on ('$w', $i)")
    }
  }

  test("xxhash64 over long slices + int band id == hashLong/hashInt fold") {
    // the band-hash form: xxhash64(sig_0, ..., sig_r-1, lit(b))
    val sig = Seq(123456789L, -42L, 0L, Long.MaxValue)
    val composed = sparkXx(sig.map(lit(_)) :+ lit(7): _*)
    val jvm = XXH64.hashInt(7,
      sig.foldLeft(Seed)((seed, v) => XXH64.hashLong(v, seed)))
    assert(composed === jvm)
  }

  test("single-arg xxhash64 of a long == hashLong at seed 42") {
    assert(sparkXx(lit(99L)) === XXH64.hashLong(99L, Seed))
  }
}
