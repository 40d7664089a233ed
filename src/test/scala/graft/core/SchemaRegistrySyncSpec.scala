package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SchemaRegistry.names is hand-maintained; keep it in sync with the
  * resources directory in both directions.
  */
class SchemaRegistrySyncSpec extends AnyFunSuite {

  test("every registered name loads from the classpath") {
    SchemaRegistry.names.foreach { n =>
      assert(SchemaRegistry(n).fields.nonEmpty, s"schema $n is empty")
    }
  }

  test("every schema resource file is registered") {
    val dir = new java.io.File("src/main/resources/schemas")
    assert(dir.isDirectory, s"expected ${dir.getAbsolutePath}")
    val onDisk = dir.listFiles().map(_.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json")).toSet
    assert(onDisk === SchemaRegistry.names.toSet)
  }
}
