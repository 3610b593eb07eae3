"""Multimodal binary-column plumbing: blob synthesis shape, metadata
decode, frame sampling boundaries (values are oracle-gated in
test_entry_contract; this checks the structural invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.synthesize_blobs(docs).cache()


def test_blob_shape(media):
    rows = media.select(
        "doc_id", F.length("content").alias("n"), "meta.n_chunks"
    ).collect()
    assert rows
    for r in rows:
        assert r["n"] == 16 * r["n_chunks"]  # 16 md5 bytes per chunk
        assert 1 <= r["n_chunks"] <= 4


def test_meta_bounds(media):
    m = multimodal.extract_meta(media)
    bad = m.where(
        (F.col("width") < 1) | (F.col("width") > 64)
        | (F.col("height") < 1) | (F.col("height") > 64)
        | (F.length("checksum") != 32)
    )
    assert bad.count() == 0


def test_features_histogram_sums_to_nibbles(media):
    f = multimodal.decode_features(media)
    hist_sum = sum(F.col(c) for c in f.columns if c.startswith("hist_"))
    # every byte contributes exactly two nibbles
    assert f.where(hist_sum != 2 * F.col("n_bytes")).count() == 0


def test_frame_sampling_boundaries(media):
    fr = multimodal.sample_frames(media)
    got = fr.groupBy("doc_id").agg(
        F.max("frame_no").alias("max_fno"),
        F.min("frame_bytes").alias("min_fb"),
        F.max("frame_bytes").alias("max_fb"),
    )
    vids = media.where(F.col("modality") == "video").select(
        "doc_id", F.length("content").alias("n")
    )
    joined = got.join(vids, "doc_id")
    assert joined.count() == vids.count()  # every video produced frames
    # frames are 8 bytes; content is a multiple of 16 so no partial frames,
    # and only even frame_nos survive the every-2nd sampler
    assert joined.where((F.col("min_fb") != 8) | (F.col("max_fb") != 8)).count() == 0
    assert fr.where(F.col("frame_no") % 2 != 0).count() == 0


def test_decode_stub_is_deterministic_fake():
    import numpy as np

    buf = multimodal._decode(b"\x01\x02\xff", "mp4")
    assert isinstance(buf, np.ndarray) and buf.dtype == np.uint8
    assert buf.tolist() == [1, 2, 255]
