package graft.multimodal

import graft.SparkTestBase

/** Multimodal plumbing specs: asset schema, batched decode execution,
  * determinism. The metadata arithmetic itself is oracle-verified via
  * queries.MultimodalMeta (q_asset_meta). */
class MultimodalSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("asset table exposes opaque binary payloads with mime metadata") {
    val df = Multimodal.assets(spark, sfDir)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      "asset_id" -> "long", "mime" -> "string", "payload" -> "binary"))
    assert(df.count() > 0)
  }

  test("batched decode preserves cardinality and is deterministic") {
    val meta1 = Multimodal.extractMeta(Multimodal.assets(spark, sfDir)).collect()
    val meta2 = Multimodal.extractMeta(Multimodal.assets(spark, sfDir)).collect()
    assert(meta1.length == Multimodal.assets(spark, sfDir).count())
    assert(meta1.map(m => m.asset_id -> ((m.width, m.height))).toMap ==
      meta2.map(m => m.asset_id -> ((m.width, m.height))).toMap)
    meta1.foreach { m =>
      assert(m.width >= 64 && m.width < 64 + 897)
      assert(m.height >= 64 && m.height < 64 + 457)
      assert(m.n_bytes > 0)
    }
  }

  test("batched resize shrinks payload and dims, binary in binary out") {
    val resized = Multimodal.resizeAssets(Multimodal.assets(spark, sfDir)).collect()
    val orig = Multimodal.extractMeta(Multimodal.assets(spark, sfDir))
      .collect().map(m => m.asset_id -> m).toMap
    assert(resized.length == orig.size)
    resized.foreach { r =>
      val o = orig(r.asset_id)
      assert(r.payload.length == math.max(1, o.n_bytes.toInt / 4))
      assert(r.width == math.max(1, o.width / 2))
      assert(r.height == math.max(1, o.height / 2))
    }
  }

  test("decode batches are bounded by BatchSize") {
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    (1 to 150).grouped(Multimodal.DecodeStub.BatchSize).foreach(g => sizes += g.size)
    assert(sizes.forall(_ <= Multimodal.DecodeStub.BatchSize))
    // decodeBatch output aligns 1:1 with its input batch
    val out = Multimodal.DecodeStub.decodeBatch(Seq(Array[Byte](1, 2), Array[Byte](3)))
    assert(out.length == 2)
  }
}
