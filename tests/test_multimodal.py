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


def test_resize_images_nearest_neighbor(spark):
    """Kernel correctness against a hand-computed numpy reference, plus
    dims/determinism over the synthesized corpus."""
    import hashlib

    import numpy as np

    from credit_abs_oltp_to_mart_spark.operators.multimodal import (
        resize_images,
        synthesize_blobs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synthesize_blobs(docs)
    out = resize_images(media, out_w=8, out_h=8)
    rows = out.collect()
    imgs = media.where("modality = 'image'").count()
    assert len(rows) == imgs > 0
    assert all(len(bytes(r.pixels)) == 64 for r in rows)
    # independent reference for one row
    src = {r.doc_id: bytes(r.content) for r in
           media.where("modality = 'image'").select("doc_id", "content").collect()}
    r0 = rows[0]
    raw = src[r0.doc_id]
    w, h = 1 + raw[0] % 64, 1 + raw[1] % 64
    assert (r0.src_w, r0.src_h) == (w, h)
    plane = np.zeros(h * w, dtype=np.uint8)
    buf = np.frombuffer(raw, dtype=np.uint8)[: h * w]
    plane[: len(buf)] = buf
    plane = plane.reshape(h, w)
    want = plane[np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)]
    assert bytes(r0.pixels) == want.tobytes()
    assert r0.pixels_md5 == hashlib.md5(
        want.tobytes().hex().upper().encode()
    ).hexdigest()
    # deterministic across runs
    again = {r.doc_id: r.pixels_md5 for r in resize_images(media, 8, 8).collect()}
    assert again == {r.doc_id: r.pixels_md5 for r in rows}


def _ref_phash(raw: bytes) -> int:
    """NumPy reference for image_phash: fake decode, nearest-neighbor 8x8
    resize with CYCLIC tiling for short buffers, strictly-above-mean bits."""
    import numpy as np

    w = 1 + (raw[0] if len(raw) > 0 else 0) % 64
    h = 1 + (raw[1] if len(raw) > 1 else 0) % 64
    buf = np.frombuffer(raw, dtype=np.uint8)
    rs = (np.arange(8) * h) // 8
    cs = (np.arange(8) * w) // 8
    idx = (rs[:, None] * w + cs[None, :]).ravel() % len(buf)
    px = buf[idx].astype(int)
    tot = int(px.sum())
    val = 0
    for i, p in enumerate(px):
        if p * 64 > tot:
            val += -(1 << 63) if i == 63 else (1 << i)
    return val


def test_image_phash_matches_reference(spark, media):
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.image_phash(media).collect()
    }
    raws = {
        r["doc_id"]: bytes(r["content"])
        for r in media.where(F.col("modality") == "image").collect()
    }
    assert set(got) == set(raws) and got
    for doc_id, raw in raws.items():
        assert got[doc_id] == _ref_phash(raw), doc_id


def test_image_near_dups_planted_and_flipped(spark):
    # w=h=8 -> the 8x8 plane IS the first 64 bytes; craft a base image,
    # an exact copy, and a one-pixel flip (0 -> 255 keeps every other
    # above-mean bit stable: 255*64 > total still holds for the 255s)
    base = bytes([7, 7] + [255] * 31 + [0] * 31)
    near = bytes([7, 7] + [255] * 31 + [255] + [0] * 30)
    rows = [
        (1, bytearray(base), "image"),
        (2, bytearray(near), "image"),
        (3, bytearray(base), "image"),
        (4, bytearray(base), "audio"),  # filtered out by modality
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary, modality string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal.image_near_dups(media).collect()
    }
    assert pairs[(1, 3)] == 0  # exact copy
    assert pairs[(1, 2)] == 1 and pairs[(2, 3)] == 1  # one-pixel flip
    assert not any(4 in p for p in pairs)


def test_banded_hamming_pigeonhole(spark):
    """The kernel's recall contract: hamming <= 3 pairs ALWAYS surface
    (some band must agree exactly); a hamming-4 pair spread one bit per
    band never collides and is correctly outside the contract."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123456789ABCDEF
    flip3 = signed64(base ^ 0b111)  # 3 bits, all in band 0
    # one flipped bit in EACH 16-bit band -> no band agrees
    flip4 = signed64(base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 63)))
    fp = spark.createDataFrame(
        [(1, base), (2, flip3), (3, flip4)], "doc_id long, phash long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in banded_hamming_pairs(fp, "phash").collect()
    }
    assert got == {(1, 2): 3}


def test_video_near_dups_re_encoded_copy(spark):
    """A re-encoded copy — every frame perturbed by one flipped pixel, so
    NO byte (and no frame md5) is identical — must still surface with
    match_share 1.0: each perturbed frame sits at hamming 1 from the
    original's aHash. An unrelated video must not pair with either."""
    # frames are 8 bytes; build 4-frame videos (every-2nd sampling keeps
    # frames 0 and 2). Frame layout: [w=7, h=7, 6 pixels] -> the 8x8
    # plane tiles the 8 bytes cyclically, so a single byte flip moves a
    # bounded number of above-mean bits.
    def frame(hot: int) -> list[int]:
        return [7, 7] + [255 if i == hot else 0 for i in range(6)]

    base = bytes(frame(1) + frame(2) + frame(1) + frame(3))
    # "re-encode": flip one zero byte to a small value in every frame —
    # bytes differ everywhere it matters, perceptual hash barely moves
    def perturb(raw: bytes) -> bytes:
        out = bytearray(raw)
        for f0 in range(0, len(out), 8):
            for i in range(f0 + 2, f0 + 8):
                if out[i] == 0:
                    out[i] = 1
                    break
        return bytes(out)

    other = bytes(frame(4) + frame(5) + frame(0) + frame(2))
    rows = [
        (1, bytearray(base), "video"),
        (2, bytearray(perturb(base)), "video"),
        (3, bytearray(other), "video"),
        (4, bytearray(base), "image"),  # filtered out by modality
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary, modality string"
    )
    assert bytes(rows[1][1]) != base  # genuinely no byte-identical copy
    got = {
        (r["video_a"], r["video_b"]): r
        for r in multimodal.video_near_dups(media).collect()
    }
    assert (1, 2) in got, got
    r = got[(1, 2)]
    assert r["match_share"] == 1.0
    assert r["n_frames_a"] == 2 and r["n_frames_b"] == 2  # every-2nd of 4
    assert not any(3 in p or 4 in p for p in got)


def test_video_frame_images_matches_sample_frames(spark, media):
    """The column-expression frame grid must agree with the pandas
    sample_frames kernel on ids, sampling, and bytes (via the md5
    fingerprint both sides can compute)."""
    frames = multimodal.video_frame_images(media)
    via_expr = frames.select(
        F.expr(f"doc_id div {multimodal.VIDEO_FRAME_ID_STRIDE}").alias(
            "doc_id"
        ),
        F.expr(f"doc_id % {multimodal.VIDEO_FRAME_ID_STRIDE}").cast(
            "int"
        ).alias("frame_no"),
        F.md5(F.hex("content")).alias("frame_md5"),
    )
    via_kernel = multimodal.sample_frames(media).select(
        "doc_id", "frame_no", "frame_md5"
    )
    assert via_expr.exceptAll(via_kernel).count() == 0
    assert via_kernel.exceptAll(via_expr).count() == 0


def test_audio_fingerprint_gain_invariance(spark):
    """The sign-of-first-difference fingerprint must be IDENTICAL under
    a strictly order-preserving sample remap (DC offset + gain — the
    transforms a lossy re-encode applies), and must differ when the
    sample ORDER changes."""
    rng = list(range(0, 130, 2))  # 65 strictly increasing samples
    up = bytes(rng)
    shifted = bytes(s + 1 for s in rng)          # DC offset
    import random

    r = random.Random(7)
    perm = rng[:]
    r.shuffle(perm)
    scrambled = bytes(perm)
    rows = [
        (1, bytearray(up), "audio"),
        (2, bytearray(shifted), "audio"),
        (3, bytearray(scrambled), "audio"),
        (4, bytearray(up), "video"),  # filtered out by modality
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary, modality string"
    )
    fp = {
        r["doc_id"]: r["fp"]
        for r in multimodal.audio_window_fingerprints(media).collect()
    }
    stride = multimodal.AUDIO_WINDOW_ID_STRIDE
    # 65 bytes -> ceil(65/32) = 3 windows per stream
    assert set(fp) == {a * stride + w for a in (1, 2, 3) for w in range(3)}
    for w in range(3):
        assert fp[1 * stride + w] == fp[2 * stride + w]
    assert any(fp[1 * stride + w] != fp[3 * stride + w] for w in range(3))


def test_audio_near_dups_re_encoded_copy(spark):
    """A re-encoded copy (every sample +1 — no byte identical) must
    surface at match_share 1.0; an unrelated stream must not pair."""
    rng = [((i * 37) % 200) for i in range(64)]
    base = bytes(rng)
    shifted = bytes(s + 1 for s in rng)
    other = bytes(((i * 53) % 199) for i in range(64))
    rows = [
        (1, bytearray(base), "audio"),
        (2, bytearray(shifted), "audio"),
        (3, bytearray(other), "audio"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary, modality string"
    )
    assert shifted != base
    got = {
        (r["audio_a"], r["audio_b"]): r
        for r in multimodal.audio_near_dups(media).collect()
    }
    assert (1, 2) in got, got
    r12 = got[(1, 2)]
    assert r12["match_share"] == 1.0
    assert r12["n_windows_a"] == 2 and r12["n_windows_b"] == 2
    assert not any(3 in p for p in got)
