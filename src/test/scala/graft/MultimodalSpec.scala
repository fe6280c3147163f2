package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table has binary payload + typed metadata schema") {
    val m = Multimodal.mediaTable(spark, sf)
    val s = m.schema
    assert(s("payload").dataType == BinaryType)
    assert(s("meta_lang").dataType == StringType)
    assert(m.count() > 0)
  }

  test("decode stage is deterministic, partition-parallel, schema-stable") {
    val m = Multimodal.mediaTable(spark, sf)
    val f1 = Multimodal.decodeFeatures(m).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(m.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.length == f2.length)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.width == b.width && a.height == b.height &&
        a.feature.sameElements(b.feature))
    }
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(r => r.byte_len > 0 && r.width >= 64))
  }

  test("a custom MediaDecoder plugs in without touching plumbing (identical schema)") {
    // a codec-bearing deployment implements the one-method trait; schema,
    // partitioning and downstream handoff are untouched
    object TestCodec extends Multimodal.MediaDecoder {
      def decode(r: Multimodal.MediaRow): Multimodal.MediaFeatures =
        Multimodal.MediaFeatures(r.doc_id, r.kind, r.payload.length,
          width = 1920, height = 1080,
          n_frames = if (r.kind == "video") 24 else 1,
          feature = Array.fill(8)(0.5f))
    }
    val m = Multimodal.mediaTable(spark, sf)
    val stub = Multimodal.decodeFeatures(m)
    val real = Multimodal.decodeFeatures(m, TestCodec)
    assert(real.schema == stub.schema, "decoders must not change the plumbing schema")
    assert(real.count() == stub.count())
    val r = real.collect()
    assert(r.forall(_.width == 1920))
    assert(r.filter(_.kind == "video").forall(_.n_frames == 24))
  }

  test("frame sampling explodes only videos, every k-th window") {
    val m = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.sampleFrames(m, every = 2, window = 32)
    val kinds = Multimodal.decodeFeatures(m).collect()
    val nVideos = kinds.count(_.kind == "video")
    assert(frames.select("doc_id").distinct().count() == nVideos)
    assert(frames.groupBy("doc_id").count().collect().forall(_.getLong(1) >= 1))
  }

  test("decoded features feed the similarity operators (end-to-end handoff)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // plant a byte-identical duplicate media object under a new id, then run
    // decode → feature embedding → hyperplane-LSH near-dup over the features
    val m = Multimodal.mediaTable(spark, sf).limit(50)
    val dup = m.toDF().withColumn("doc_id", $"doc_id" + 100000L)
      .as[Multimodal.MediaRow]
    val emb = Multimodal.decodeFeatures(m.union(dup))
      .select($"doc_id".as("vec_id"), $"feature".as("embedding"))
    val pairs = operators.Similarity.cosineNearDups(emb.toDF(), planes = 4,
      threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val ids = m.collect().map(_.doc_id)
    assert(ids.forall(i => pairs.contains((i, i + 100000L))),
      s"every planted duplicate must be found; got ${pairs.size} pairs")
  }
}
