package graft.tools

import java.io.{FileOutputStream, OutputStreamWriter, PrintWriter}
import org.apache.spark.unsafe.types.UTF8String

/** Dump Spark's actual lower() mapping (CollationSupport.Lower
  * execBinaryICU — the default UTF8_BINARY+ICU path) per codepoint,
  * planes 0-2, for the exhaustive DuckDB-divergence diff that pins
  * the tokenizer's oracle contract. No SparkSession needed.
  */
object LowerDump {
  def main(args: Array[String]): Unit = {
    val w = new PrintWriter(new OutputStreamWriter(
      new FileOutputStream("/tmp/lower_spark.txt"), "UTF-8"))
    var cp = 0x20
    while (cp <= 0x2FFFF) {
      if (cp < 0xD800 || cp > 0xDFFF) {
        val s = new String(Character.toChars(cp))
        val lo = org.apache.spark.sql.catalyst.util.CollationSupport.Lower
          .execBinaryICU(UTF8String.fromString(s)).toString
        val enc = lo.codePoints().toArray.map(c => f"$c%05x").mkString(" ")
        w.println(f"$cp%05x -> $enc")
      }
      cp += 1
    }
    w.close()
  }
}
