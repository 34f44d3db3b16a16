package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** No-control-bytes fence (r12 ask #6): every `.scala` source under
  * `src/` must be plain reviewable text — no byte below 0x20 except
  * \t \n \r. A raw control byte in a string literal makes git treat
  * the file as BINARY and every later diff unreviewable: PgWire.scala
  * shipped a literal 0x00 inside a SCRAM mechanism-list string until
  * commit 0394771, whose own diff rendered as "Bin 15890 -> 15998
  * bytes". Control characters belong in escape form (a
  * backslash-u code point, a `'\n'`, …),
  * which this fence permits by construction — it reads raw BYTES, and
  * an escape is ASCII text. Revert-verified against the pre-0394771
  * blob: its 0x00 trips the fence.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toSeq

  private def controlBytes(p: Path): Seq[(Int, Int)] = {
    val bytes = Files.readAllBytes(p)
    bytes.zipWithIndex.collect {
      case (b, i) if (b & 0xff) < 0x20 &&
        b != '\t'.toByte && b != '\n'.toByte && b != '\r'.toByte =>
        (b & 0xff, i)
    }.toSeq
  }

  test("no raw control bytes in any src/**/*.scala") {
    val root = Paths.get("src")
    assert(Files.isDirectory(root), s"run from the repo root: $root missing")
    val srcs = scalaSources(root)
    assert(srcs.size > 100, s"suspiciously few sources found: ${srcs.size}")
    val hits = srcs.flatMap { p =>
      controlBytes(p).take(3).map { case (b, off) =>
        f"$p: byte 0x$b%02x at offset $off"
      }
    }
    assert(hits.isEmpty,
      "raw control bytes (git will diff these files as BINARY):\n  " +
        hits.mkString("\n  "))
  }

  test("the detector itself trips on the pre-0394771 failure shape") {
    // the exact byte that made PgWire.scala binary: a raw NUL inside
    // a string literal
    val tmp = Files.createTempFile("hygiene", ".scala")
    try {
      Files.write(tmp, "val sep = \"SCRAM".getBytes ++ Array[Byte](0) ++
        "more\"\n".getBytes)
      val hits = controlBytes(tmp)
      assert(hits == Seq((0, 16)), s"detector missed the NUL: $hits")
      // and the permitted whitespace bytes do NOT trip it
      Files.write(tmp, "a\tb\r\nc\n".getBytes)
      assert(controlBytes(tmp).isEmpty)
    } finally Files.delete(tmp)
  }
}
