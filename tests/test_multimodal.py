"""Multimodal plumbing: deterministic fake decode through real Arrow
batching; byte-slicing frame sampler; stub gate for real codecs."""

import hashlib

import pytest


def test_media_features_deterministic_and_correct(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_fake_media(docs, copies=4)
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(feats) == 50
    for doc_id, row in feats.items():
        blob = hashlib.md5(texts[doc_id].encode()).digest() * 4
        assert row.byte_len == 64
        assert row.first_byte == blob[0]
        assert row.mean_byte == pytest.approx(sum(blob) / 64)
        assert row.frame_count == 4
        assert row.media_format == "fake/rgb16"


def test_frame_sample_keeps_every_other_frame(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_fake_media,
        frame_sample,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = frame_sample(attach_fake_media(docs, copies=4), every_k=2).collect()
    for r in out:
        assert r.n_sampled_frames == 2  # frames 0 and 2 of 4
        assert all(len(f) == 16 for f in r.frames)


def test_real_decode_is_explicitly_stubbed():
    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 16)
    assert decode_media(b"\x02\x04", fake=True)["mean_byte"] == 3.0
