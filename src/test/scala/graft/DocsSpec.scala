package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the documented counts to reality so the docs can't drift
  * (README's test/oracle-query totals went stale three rounds
  * running). The suite total is computed the way ScalaTest itself
  * counts: every compiled `Suite` on the test classpath is
  * instantiated (registration only — nothing runs; the shared
  * SparkSession is a lazy val no constructor touches) and
  * `expectedTestCount` summed. */
class DocsSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("README oracle-query count matches SparkEntry.queries") {
    val claimed = """\((\d+) oracle queries""".r
      .findFirstMatchIn(read("README.md"))
      .map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"README claims $claimed oracle queries; " +
        s"SparkEntry.queries has ${SparkEntry.queries.size}")
  }

  test("every oracle query's id appears in COVERAGE.md") {
    val coverage = read("COVERAGE.md")
    // ranges like "q12–q15" (en dash) cover every id in between
    val ranged = """q(\d+)[–-]q(\d+)""".r
      .findAllMatchIn(coverage)
      .flatMap(m => m.group(1).toInt to m.group(2).toInt)
      .toSet
    val missing = SparkEntry.queries.keySet
      .map(_.takeWhile(_ != '_')) // q101_curate_neardup -> q101
      .filterNot(id =>
        coverage.contains(id) || ranged.contains(id.drop(1).toInt))
    assert(missing.isEmpty, s"COVERAGE.md has no row mentioning: $missing")
  }

  test("README test count matches the registered suite total") {
    val classesDir = Paths.get("target/scala-2.13/test-classes")
    assume(Files.isDirectory(classesDir), "compiled test classes not found")
    val names = Files.walk(classesDir).iterator().asScala
      .filter(p => p.toString.endsWith(".class") && !p.toString.contains("$"))
      .map { p: Path =>
        classesDir.relativize(p).toString
          .stripSuffix(".class").replace(java.io.File.separatorChar, '.')
      }
      .toList
    val suiteCls = classOf[org.scalatest.Suite]
    val total = names.flatMap { n =>
      val cls = Class.forName(n, false, getClass.getClassLoader)
      if (suiteCls.isAssignableFrom(cls) &&
        !java.lang.reflect.Modifier.isAbstract(cls.getModifiers))
        Some(cls.getDeclaredConstructor().newInstance()
          .asInstanceOf[org.scalatest.Suite]
          .expectedTestCount(org.scalatest.Filter.default))
      else None
    }.sum
    assert(total > 0, "found no suites — classpath scan broken")
    val claimed = """\((\d+) tests""".r
      .findFirstMatchIn(read("README.md"))
      .map(_.group(1).toInt)
    assert(claimed.contains(total),
      s"README claims $claimed tests; registered total is $total")
  }
}
