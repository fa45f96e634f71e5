"""Multimodal plumbing: decode / feature-extract / resize / frame-sample
(operators/multimodal.py). Kernels are deterministic fakes (media libs are
not in this container); the Spark-side schemas, Arrow batching, and row
multiplicity are real and pinned here."""

from pyspark.sql import functions as F

from faust_spark.catalog import load_table
from faust_spark.operators.multimodal import (
    attach_payload,
    decode_metadata,
    extract_features,
    resize_media,
    sample_frames,
)


def _media(spark, sf_dir, n=40):
    docs = load_table(spark, sf_dir, "documents").limit(n)
    return attach_payload(docs)


def test_extract_features_shape_and_determinism(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = extract_features(m, dim=8)
    rows = out.collect()
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r.features)
    again = {r.doc_id: r.features for r in extract_features(m, dim=8).collect()}
    assert all(again[r.doc_id] == r.features for r in rows)


def test_resize_clamps_to_bounding_box(spark, sf_dir):
    m = _media(spark, sf_dir)
    orig = {r.doc_id: r for r in decode_metadata(m).collect()}
    out = {r.doc_id: r for r in resize_media(m, max_w=100, max_h=100).collect()}
    for did, r in out.items():
        assert 1 <= r.width <= 100 and 1 <= r.height <= 100
        o = orig[did]
        # aspect preserved within integer truncation
        if o.width >= o.height:
            assert r.width >= r.height - 1
        else:
            assert r.height >= r.width - 1
        assert len(r.payload) <= o.payload_bytes  # fake kernel shrinks


def test_sample_frames_multiplicity(spark, sf_dir):
    m = _media(spark, sf_dir)
    nb = {r.doc_id: r.payload_bytes for r in decode_metadata(m).collect()}
    out = sample_frames(m, max_frames=4)
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc == {d: b % 4 + 1 for d, b in nb.items()}
    idx = out.filter("doc_id = %d" % min(per_doc)).select("frame_idx").collect()
    assert sorted(r.frame_idx for r in idx) == list(range(len(idx)))
