package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IndexStore
import java.io.File
import java.nio.file.Files

/** IndexStore: atomic build-once commit + content fingerprinting (plain
  * file ops, no Spark session). These pin the two round-6 advisor
  * findings: a crash between build steps must never leave a
  * marker-complete but data-incomplete index, and a regenerated dataset
  * must never be served a stale index.
  */
class IndexStoreSpec extends AnyFunSuite {

  private def tmpDir(): File =
    Files.createTempDirectory("graft-idxstore").toFile

  test("ensure commits atomically: a failing build leaves nothing behind") {
    val root = tmpDir()
    val path = new File(root, "idx").getPath
    val boom = intercept[RuntimeException] {
      IndexStore.ensure(path) { staging =>
        new File(staging, "bands").mkdirs()
        sys.error("crash between build and append")
      }
    }
    assert(boom.getMessage.contains("crash"))
    assert(!new File(path).exists(), "no committed index may appear")
    assert(root.listFiles().forall(!_.getName.contains(".staging")),
      "failed staging tree must be cleaned up")
  }

  test("ensure refuses a build that produced no commit marker") {
    val root = tmpDir()
    val path = new File(root, "idx").getPath
    intercept[IllegalArgumentException] {
      IndexStore.ensure(path) { staging => new File(staging, "bands").mkdirs(): Unit }
    }
    assert(!new File(path).exists())
  }

  test("ensure builds once, then reuses; a damaged tree without marker is rebuilt") {
    val root = tmpDir()
    val path = new File(root, "idx").getPath
    var builds = 0
    def build(staging: String): Unit = { builds += 1; new File(staging, "params").mkdirs(): Unit }
    IndexStore.ensure(path)(build)
    IndexStore.ensure(path)(build)
    assert(builds == 1, "second ensure must reuse the committed index")
    // simulate a pre-staging writer's partial artifact: marker removed
    new File(path, "params").delete()
    IndexStore.ensure(path)(build)
    assert(builds == 2, "marker-less tree is damaged and must be rebuilt")
    assert(new File(path, "params").exists())
  }

  test("removeDamaged preserves a concurrently committed valid tree; removes a marker-less one") {
    // the round-7 TOCTOU arm: between ensure()'s marker check and the
    // removal, a concurrent run may commit a valid tree — removeDamaged
    // must capture it whole (atomic rename) and reinstate it, never
    // recursively delete it. Exercised directly since a real race window
    // is not deterministically schedulable.
    val root = tmpDir()
    val dest = new File(root, "idx")
    new File(dest, "params").mkdirs()
    val payload = new File(dest, "params/data.bin")
    Files.write(payload.toPath, Array[Byte](1, 2, 3))
    assert(IndexStore.removeDamaged(dest, "params"),
      "a valid tree captured mid-removal must be reported as present")
    assert(new File(dest, "params/data.bin").exists(),
      "the reinstated tree must be byte-complete at the original path")
    assert(root.listFiles().forall(!_.getName.contains(".trash")),
      "no trash residue after reinstatement")
    // and the actually-damaged shape is removed and reported absent
    val dmg = new File(root, "idx2")
    new File(dmg, "bands").mkdirs()
    assert(!IndexStore.removeDamaged(dmg, "params"))
    assert(!dmg.exists(), "marker-less tree must be gone")
  }

  test("fingerprint changes when a data file's size or mtime changes") {
    val data = tmpDir()
    val f = new File(data, "part-00000.parquet")
    Files.write(f.toPath, "aaaa".getBytes)
    val fp1 = IndexStore.fingerprint(data.getPath)
    assert(fp1.matches("[0-9a-f]{16}"))
    // same content, bumped mtime — conservative invalidation
    assert(f.setLastModified(f.lastModified() + 5000))
    val fp2 = IndexStore.fingerprint(data.getPath)
    assert(fp1 != fp2, "mtime change must change the fingerprint")
    // size change too
    Files.write(f.toPath, "aaaaaa".getBytes)
    val fp3 = IndexStore.fingerprint(data.getPath)
    assert(fp3 != fp2)
    // hidden/underscore commit markers are ignored
    Files.write(new File(data, "_SUCCESS").toPath, Array.emptyByteArray)
    Files.write(new File(data, ".crc").toPath, Array.emptyByteArray)
    assert(IndexStore.fingerprint(data.getPath) == fp3)
  }

  test("fingerprint of a single parquet FILE (the sf layout) works") {
    val data = tmpDir()
    val f = new File(data, "documents.parquet")
    Files.write(f.toPath, "pq".getBytes)
    assert(IndexStore.fingerprint(f.getPath).matches("[0-9a-f]{16}"))
  }

  test("fingerprint recurses into partitioned layouts and refuses empty inputs") {
    val data = tmpDir()
    val part = new File(data, "date=2024-01")
    part.mkdirs()
    val f = new File(part, "part-00000.parquet")
    Files.write(f.toPath, "x".getBytes)
    val fp1 = IndexStore.fingerprint(data.getPath)
    // a change INSIDE the partition subdir must change the fingerprint
    Files.write(f.toPath, "xy".getBytes)
    assert(IndexStore.fingerprint(data.getPath) != fp1,
      "partitioned data files must contribute to the fingerprint")
    // no data files at all → loud failure, never a constant cache key
    val empty = tmpDir()
    new File(empty, "_SUCCESS").createNewFile()
    intercept[IllegalArgumentException] { IndexStore.fingerprint(empty.getPath) }
    intercept[IllegalArgumentException] { IndexStore.fingerprint("/does/not/exist") }
  }
}
