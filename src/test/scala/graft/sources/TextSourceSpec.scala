package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class TextSourceSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-textsource", ".txt")
    Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("strict parse reads one double per line (reference Main.scala:40-41)") {
    val path = writeLines(Seq("1.5", "-2.25", "1e3", "0"))
    val got = TextSource.doubles(spark, path).collect().map(_.doubleValue).sorted
    got shouldBe Array(-2.25, 0.0, 1.5, 1000.0)
  }

  test("lenient parse drops malformed lines instead of failing the job") {
    val path = writeLines(Seq("1.5", "oops", "2.5", ""))
    val got = TextSource.doublesLenient(spark, path)
      .collect().map(_.getDouble(0)).sorted
    got shouldBe Array(1.5, 2.5)
  }
}
