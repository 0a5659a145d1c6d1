package graft

import java.nio.file.{Files, Paths}

import org.scalacheck.Gen

import graft.compat.Offset2

/** Property tests for offset2 byte-level round-tripping (ScalaCheck
  * generators, sampled manually — no scalatestplus bridge in the
  * offline cache): for arbitrary entry mixes (empty payloads, binary
  * payloads with embedded zeros/newlines, nulled entries, empty
  * logs), export → journal check → full-scan fsck → connector
  * read-back is the identity, under arbitrary partition targets. */
class Offset2PropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  private val entryGen: Gen[(Array[Byte], Boolean)] = for {
    nulled <- Gen.prob(0.2)
    len <- Gen.chooseNum(0, 64)
    bytes <- Gen.containerOfN[Array, Byte](len, Gen.chooseNum(-128, 127)
      .map(_.toByte))
  } yield (bytes, nulled)

  private val logGen: Gen[List[(Array[Byte], Boolean)]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, entryGen))

  test("export -> fsck -> partitioned read-back is the identity") {
    samples(logGen, 25).zipWithIndex.foreach { case (entries, i) =>
      val dir = tmpDir(s"o2prop$i")
      Offset2.write(dir, entries.iterator)
      assert(Offset2.checkConsistency(dir).isEmpty,
        s"case $i: fsck found problems")
      // a hostile partition target: forces many tiny ranges
      val target = 1 + (i % 3) * 40
      val back = spark.read.format("graft-offset2")
        .option("maxPartitionBytes", target.toString).load(dir)
        .collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_ => r.getAs[Array[Byte]](1).toSeq),
          r.getBoolean(2)))
        .sortBy(_._1)
        .toSeq
      val expect = entries.zipWithIndex.map { case ((bytes, nulled), seq) =>
        (seq.toLong, if (nulled) None else Some(bytes.toSeq), nulled)
      }
      assert(back == expect, s"case $i mismatch (target $target)")
      // point gets agree with the scan at three probes
      if (entries.nonEmpty) {
        Seq(0, entries.length / 2, entries.length - 1).distinct.foreach { s =>
          val (bytes, nulled) = entries(s)
          val got = Offset2.get(dir, s.toLong)
          assert(got.map(_.toSeq) ==
            (if (nulled) None else Some(bytes.toSeq)), s"case $i get($s)")
        }
      }
    }
  }
}
