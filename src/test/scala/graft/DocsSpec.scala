package graft

import org.scalatest.funsuite.AnyFunSuite

/** The README registry appendix is generated, not hand-maintained: this
  * spec fails the build whenever the committed block differs from a
  * fresh render of [[Docs.appendixMarkdown]] (fix: `sbt "runMain
  * graft.Docs"`). The r7 hand-list drift cannot recur. */
class DocsSpec extends AnyFunSuite {
  test("README generated registry block matches the code") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val bi = readme.indexOf(Docs.BeginMarker)
    val ei = readme.indexOf(Docs.EndMarker)
    assert(bi >= 0 && ei > bi, "README is missing the registry markers")
    val committed = readme.substring(bi + Docs.BeginMarker.length, ei)
    assert(committed.trim == Docs.appendixMarkdown.trim,
      "README registry block is stale — run `sbt \"runMain graft.Docs\"`")
  }

  test("every query name is unique and SparkEntry surfaces all of them") {
    val names = SparkEntry.registryModules.flatMap(_._2).map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }
}
