package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class IndexStampSpec extends AnyFunSuite {

  test("distinct identities get distinct dirs — incl. hashCode-colliding ones") {
    // the exact failure mode of the replaced 32-bit scheme: these collide
    // under String.hashCode, so the old keys would have silently shared a
    // cache dir (stale index served for the wrong corpus)
    assert("Aa".hashCode === "BB".hashCode)
    assert("AaAaAa".hashCode === "BBBBBB".hashCode)
    assert(IndexStamp.dirKey("Aa") !== IndexStamp.dirKey("BB"))
    assert(IndexStamp.dirKey("AaAaAa") !== IndexStamp.dirKey("BBBBBB"))
    // realistic near-identities: same dir, stamp differing by one mtime ms
    assert(IndexStamp.dirKey("/data|4096-1700000000000|v3") !==
      IndexStamp.dirKey("/data|4096-1700000000001|v3"))
    // version bumps re-key (stale layouts never picked up)
    assert(IndexStamp.dirKey("/data|4096-1|v1") !==
      IndexStamp.dirKey("/data|4096-1|v2"))
  }

  test("keys are deterministic, filesystem-safe, 64-bit") {
    assert(IndexStamp.dirKey("x") === IndexStamp.dirKey("x"))
    assert(IndexStamp.dirKey("x").matches("[0-9a-f]{16}"))
    assert(IndexStamp.dirKey("päth/ünïcode").matches("[0-9a-f]{16}"))
  }

  test("identity folds dir, driving-parquet stamp, and version") {
    val a = IndexStamp.identity("/nonexistent-dir-a", "documents.parquet", "v1")
    val b = IndexStamp.identity("/nonexistent-dir-b", "documents.parquet", "v1")
    assert(a.contains("missing")) // absent parquet stamps as such
    assert(a !== b)
    assert(a.endsWith("|v1"))
  }
}
