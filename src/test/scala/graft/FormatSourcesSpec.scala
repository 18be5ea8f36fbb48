package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FormatSources

/** Round-trip and metadata goldens for the non-parquet source
  * formats (binaryFile / text / ORC). */
class FormatSourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("binaryFile: content and length metadata round-trip; glob filters") {
    val d = tmpDir("binsrc")
    val payload = Array.tabulate[Byte](257)(i => (i % 251).toByte)
    Files.write(d.resolve("a.img"), payload)
    Files.write(d.resolve("b.img"), Array[Byte](1, 2, 3))
    Files.write(d.resolve("skip.txt"), Array[Byte](9))

    val df = FormatSources.readBinaryFiles(spark, d.toString, "*.img")
    val rows = df.select("path", "length", "content")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    assert(rows.length === 2) // glob excluded skip.txt
    assert(rows.head._1.endsWith("a.img"))
    assert(rows.head._2 === 257L)
    assert(rows.head._3.toSeq === payload.toSeq)
  }

  test("binaryFile feeds Multimodal digests (ingest-to-operator path)") {
    val d = tmpDir("binmm")
    Files.write(d.resolve("x.bin"), "hello multimodal".getBytes("UTF-8"))
    val digest = FormatSources.readBinaryFiles(spark, d.toString)
      .select(sha2(col("content"), 256).as("sha"))
      .as[String].head()
    // sha256("hello multimodal")
    assert(digest.length === 64)
    assert(digest === org.apache.commons.codec.digest.DigestUtils
      .sha256Hex("hello multimodal"))
  }

  test("text: per-line rows, wholetext one-row-per-file, provenance column") {
    val d = tmpDir("txtsrc")
    Files.writeString(d.resolve("doc1.txt"), "line one\nline two\n")
    Files.writeString(d.resolve("doc2.txt"), "solo\n")

    assert(FormatSources.readText(spark, d.toString).count() === 3)
    assert(FormatSources
      .readText(spark, d.toString, wholeFile = true).count() === 2)
    val prov = FormatSources.readTextWithProvenance(spark, d.toString)
      .where(col("line") === "solo")
      .select("source_file").as[String].head()
    assert(prov.endsWith("doc2.txt"))
  }

  test("ORC: schema + values round-trip from the parquet tables") {
    val d = tmpDir("orcsink")
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    FormatSources.writeOrc(docs, d.toString + "/docs")
    val back = FormatSources.readOrc(spark, d.toString + "/docs")
    assert(back.schema === docs.schema)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val d = tmpDir("orcpush")
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    FormatSources.writeOrc(docs, d.toString + "/docs")
    val p = FormatSources.readOrc(spark, d.toString + "/docs")
      .where(col("doc_id") === 7L)
      .select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"ORC scan must push the predicate:\n$p")
    assert(!p.contains("text"), "unused wide column must not reach the ORC scan")
  }
}
