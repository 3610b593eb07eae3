"""Multimodal (binary-column) operators for the training-data pipeline.

Images / audio / video are opaque ``binary`` columns with typed metadata —
the lakehouse-native layout for multimodal training data. The reference has
no binary data at all (SURVEY.md §1.2), so this is pure extension surface:

- ``synthesize_blobs``: deterministic fake media derived from the
  ``documents`` table (md5-chain bytes + modality tag) — reproducible in
  any engine, so the downstream operators stay oracle-checkable.
- ``extract_meta``: JVM-side header/metadata extraction (size, checksum,
  fake width/height decoded from leading bytes).
- ``decode_features``: Arrow-batched ``mapInPandas`` decode + featurize.
  The REAL codec step (PIL / torchaudio / pyav) is stubbed behind an
  import-try — those libs aren't in this container — with a clearly-marked
  deterministic fake (bytes == decoded buffer). The Spark-side plumbing
  (schema, batching, numpy feature math) is real and tested.
- ``sample_frames``: per-"video" frame splitter + every-kth sampler in
  ``mapInPandas`` — the batch shape of a frame-extraction pipeline.

Scale posture: all three operators are map-only (no shuffle); blobs never
leave the executor that read them, and feature/meta outputs are narrow
projections. At 100 TB the same plans run per-file with predicate pushdown
on the metadata columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MODALITIES = ["image", "audio", "video"]
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}
MAX_EXTRA_CHUNKS = 3  # content = md5(text) + up to 3 salted md5 chunks
FRAME_BYTES = 8
FRAME_SAMPLE_EVERY = 2
HEX_DIGITS = "0123456789ABCDEF"


def synthesize_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media blobs from a documents table.

    content = unhex(md5(text) ‖ md5(text||'c1') ‖ … ), 16 bytes per chunk,
    1 + (doc_id mod 4) chunks; modality cycles image/audio/video by doc_id.
    Pure column expressions — an identical SQL CTE rebuilds the same bytes
    in DuckDB, which is what keeps the downstream operators oracle-gated.
    """
    k = F.pmod(F.col("doc_id"), F.lit(MAX_EXTRA_CHUNKS + 1))
    hex_chunks = [F.md5(F.col(text_col))]
    for i in range(1, MAX_EXTRA_CHUNKS + 1):
        hex_chunks.append(
            F.when(k >= i, F.md5(F.concat(F.col(text_col), F.lit(f"c{i}"))))
            .otherwise(F.lit(""))
        )
    modality = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, MODALITIES[0])
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )
    declared = (
        F.when(modality == "image", FORMATS["image"])
        .when(modality == "audio", FORMATS["audio"])
        .otherwise(FORMATS["video"])
    )
    return docs.select(
        "doc_id",
        F.unhex(F.concat(*hex_chunks)).alias("content"),
        modality.alias("modality"),
        F.struct(
            (k + 1).cast("int").alias("n_chunks"),
            declared.alias("declared_format"),
        ).alias("meta"),
    )


def _hex_byte(content: Column, pos: int) -> Column:
    """Byte value at 1-based position ``pos`` via the hex representation."""
    return F.conv(F.substring(F.hex(content), 2 * pos - 1, 2), 16, 10).cast("int")


def extract_meta(media: DataFrame) -> DataFrame:
    """Header/metadata extraction, JVM-side (no UDF): byte size, portable
    checksum (md5 of the uppercase hex — DuckDB md5 takes VARCHAR only),
    and fake width/height decoded from the two leading content bytes."""
    return media.select(
        "doc_id",
        "modality",
        F.col("meta.n_chunks").alias("n_chunks"),
        F.col("meta.declared_format").alias("declared_format"),
        F.length("content").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("checksum"),
        (1 + F.pmod(_hex_byte(F.col("content"), 1), F.lit(64))).alias("width"),
        (1 + F.pmod(_hex_byte(F.col("content"), 2), F.lit(64))).alias("height"),
    )


def _decode_fake(content: bytes, declared_format: str) -> np.ndarray:
    """Deterministic fake decode: raw bytes ARE the decoded buffer. Keeps
    every downstream feature reproducible in the DuckDB oracle."""
    return np.frombuffer(content, dtype=np.uint8)


# Per-format decoder registry — the drop-in point for real codecs. A deploy
# with PIL/torchaudio/pyav installed registers e.g.
#     register_decoder("png", lambda b, f: np.asarray(
#         Image.open(io.BytesIO(b)), dtype=np.uint8).ravel())
# and every operator below (decode_features, resize kernel, frame sampler)
# picks it up unchanged: the contract is (blob bytes, declared_format) ->
# flat uint8 buffer, and nothing else in the Spark plumbing (schema,
# Arrow batching, partitioning) depends on which decoder produced the
# buffer. This container ships no codec libraries (see README), so the
# registry is empty by default and everything runs on the deterministic
# fake.
_DECODERS: dict[str, object] = {}


def register_decoder(declared_format: str, fn) -> None:
    """Install a real ``(bytes, declared_format) -> np.ndarray[uint8]``
    decoder for one declared format (e.g. 'png'). Unregistered formats
    fall back to the deterministic fake."""
    _DECODERS[declared_format] = fn


def _decode(content: bytes, declared_format: str) -> np.ndarray:
    """Decode a media blob to a flat uint8 buffer via the registry."""
    fn = _DECODERS.get(declared_format, _decode_fake)
    return fn(content, declared_format)


def decode_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every blob: nibble histogram (16 bins == hex-digit
    counts of the content) over the decoded buffer, Arrow-batched."""
    out_schema = "doc_id long, modality string, n_bytes int, " + ", ".join(
        f"hist_{d.lower()} int" for d in HEX_DIGITS
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, modality, content, meta in zip(
                pdf["doc_id"], pdf["modality"], pdf["content"], pdf["meta"]
            ):
                buf = _decode(bytes(content), meta["declared_format"])
                counts = (
                    np.bincount(buf >> 4, minlength=16)
                    + np.bincount(buf & 0xF, minlength=16)
                )
                rows.append((int(doc_id), modality, len(buf), *counts.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "modality", "n_bytes"]
                + [f"hist_{d.lower()}" for d in HEX_DIGITS],
            )

    return media.mapInPandas(_featurize, out_schema)


def sample_frames(media: DataFrame) -> DataFrame:
    """Split each "video" blob into FRAME_BYTES-byte frames, keep every
    FRAME_SAMPLE_EVERY-th, fingerprint each frame (md5 of its uppercase hex
    — the engine-portable blob hash)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                n_frames = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
                for fno in range(0, n_frames, FRAME_SAMPLE_EVERY):
                    frame = raw[fno * FRAME_BYTES : (fno + 1) * FRAME_BYTES]
                    fp = hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    rows.append((int(doc_id), fno, len(frame), fp))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes", "frame_md5"]
            )

    videos = media.where(F.col("modality") == "video").select("doc_id", "content")
    return videos.mapInPandas(
        _frames, "doc_id long, frame_no int, frame_bytes int, frame_md5 string"
    )


def image_phash(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """64-bit perceptual average-hash (aHash) per image, JVM-side.

    The classic aHash recipe: resize to ``out_h`` x ``out_w`` (the same
    nearest-neighbor floor index maps as ``resize_images``), then bit i is
    set iff pixel_i is strictly above the plane mean. The mean test runs in
    integer arithmetic (``pixel_i * n_px > sum(pixels)``) so any engine
    reproduces the hash bit-for-bit — no float mean, no rounding seam.

    Decode is the registry fake (bytes == buffer, dims from the two leading
    bytes exactly as ``extract_meta`` reports them); with a real codec the
    same hash math runs on the true plane. Everything is pure column
    expressions over ONE hex() of the blob — map-only, whole-stage
    codegen'd, no UDF and no shuffle; the 2 + out_h*out_w byte lookups are
    substr+conv over that hex string."""
    n_px = out_w * out_h
    assert n_px <= 64, "aHash packs into one 64-bit fingerprint"
    imgs = media.where(F.col("modality") == "image").select(
        "doc_id",
        F.hex(F.col("content")).alias("hx"),
        F.length("content").alias("nb"),
    )
    dims = imgs.select(
        "doc_id",
        "hx",
        "nb",
        (1 + F.pmod(F.conv(F.substring("hx", 1, 2), 16, 10).cast("int"), F.lit(64))
         ).alias("w"),
        (1 + F.pmod(F.conv(F.substring("hx", 3, 2), 16, 10).cast("int"), F.lit(64))
         ).alias("h"),
    )
    # resized pixel i = (r, c) reads plane index floor(r*h/out_h)*w +
    # floor(c*w/out_w). A WELL-FORMED image has len(buf) == h*w and the
    # index hits the buffer directly; a short buffer (the registry fake's
    # md5-chain blobs, or a corrupt blob) tiles CYCLICALLY (idx % nb)
    # rather than zero-padding — zero-pad would collapse most short-blob
    # hashes toward all-zero bits and degenerate the band join toward
    # all-pairs, while for full-length buffers idx % nb == idx exactly.
    # The whole hash is THREE higher-order-function expressions (pixel
    # array -> total -> bit fold) rather than 64 unrolled pixel columns:
    # the unrolled form blew past the codegen method limit and fell back
    # to interpreted eval of a ~130-expression tree. NOTE for composers:
    # Catalyst's projection collapse inlines __px/__tot into downstream
    # consumers, so a plan that references the phash column MANY times
    # (e.g. a band explode feeding a self-join) re-evaluates the fold per
    # reference — materialize (persist) the fingerprint frame first, as
    # image_near_dups does.
    px = (
        f"transform(sequence(0, {n_px - 1}), i -> cast(conv(substr(hx,"
        f" pmod(cast(floor((i div {out_w}) * h / {out_h}) as int) * w"
        f" + cast(floor((i % {out_w}) * w / {out_w}) as int), nb)"
        f" * 2 + 1, 2), 16, 10) as int))"
    )
    # bit i contributes 2^i (two's complement at i = 63, exactly as
    # simhash_fingerprints assembles its hash) iff pixel_i * n_px > total
    hash_fold = (
        f"aggregate(sequence(0, {n_px - 1}), 0L, (acc, i) ->"
        f" acc + (case when __px[i] * {n_px} > __tot then"
        f" (case when i = 63 then {-(1 << 63)}L else shiftleft(1L, i) end)"
        f" else 0L end))"
    )
    return (
        dims.withColumn("__px", F.expr(px))
        .withColumn(
            "__tot",
            F.expr("aggregate(__px, 0L, (acc, x) -> acc + cast(x as bigint))"),
        )
        .select("doc_id", F.expr(hash_fold).cast("long").alias("phash"))
    )


def image_near_dups(
    media: DataFrame, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-duplicate image pairs: perceptual hash + the SAME banded
    hamming kernel SimHash text dedup uses (``dedup.banded_hamming_pairs``
    — 4 bands of 16 bits, exact bit_count(xor) verify, full recall for
    hamming <= 3 by pigeonhole). Returns (doc_a, doc_b, hamming).

    The fingerprint frame is persisted before the kernel: unlike SimHash
    (whose vote aggregation gives the self-join a ReusedExchange), the
    hash here is a pure projection — without a materialization the band
    join's two sides would each re-derive it, and projection collapse
    would additionally re-evaluate the inlined pixel fold per band
    reference. One cached (doc_id, phash) row per image is tiny at any
    scale; callers may unpersist after consuming the pairs."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import banded_hamming_pairs

    fp = image_phash(media).persist()
    return banded_hamming_pairs(
        fp, "phash", max_hamming=max_hamming, n_bands=n_bands, n_bits=64
    )


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """Nearest-neighbor image resize, Arrow-batched — the preprocessing
    step a vision-training pipeline runs per image.

    The resample kernel is the real algorithm (row/col index maps
    ``floor(i * src / out)`` over a (h, w) uint8 plane); only the decode
    that produces the plane is the deterministic fake (`_decode`, bytes ==
    buffer, dims from the two leading bytes exactly as ``extract_meta``
    reports them — buffer truncated/zero-padded to h*w). With real codecs
    the same kernel runs on the true decoded array. Emits the resized
    plane as a binary column plus its md5 (of the uppercase hex — the
    repo's engine-portable blob hash)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, meta in zip(
                pdf["doc_id"], pdf["content"], pdf["meta"]
            ):
                raw = bytes(content)
                # corrupt/short blobs (< 2 bytes) degrade to a 1x1 plane
                # instead of an IndexError that fails the whole task
                w = 1 + (raw[0] if len(raw) > 0 else 0) % 64
                h = 1 + (raw[1] if len(raw) > 1 else 0) % 64
                buf = _decode(raw, meta["declared_format"])
                plane = np.zeros(h * w, dtype=np.uint8)
                plane[: min(len(buf), h * w)] = buf[: h * w]
                plane = plane.reshape(h, w)
                rs = (np.arange(out_h) * h) // out_h
                cs = (np.arange(out_w) * w) // out_w
                resized = plane[np.ix_(rs, cs)]
                out_bytes = resized.tobytes()
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        out_w,
                        out_h,
                        bytearray(out_bytes),
                        hashlib.md5(out_bytes.hex().upper().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "pixels", "pixels_md5",
                ],
            )

    images = media.where(F.col("modality") == "image").select(
        "doc_id", "content", "meta"
    )
    return images.mapInPandas(
        _resize,
        "doc_id long, src_w int, src_h int, out_w int, out_h int, "
        "pixels binary, pixels_md5 string",
    )


VIDEO_FRAME_ID_STRIDE = 1_000_000


def video_frame_images(
    media: DataFrame,
    *,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_SAMPLE_EVERY,
    id_stride: int = VIDEO_FRAME_ID_STRIDE,
) -> DataFrame:
    """Each sampled video frame re-presented as an "image" media row, so
    the whole image fingerprint stack (``image_phash`` -> banded hamming)
    runs on frames unchanged: frame id = video_id * ``id_stride`` +
    frame_no (recoverable by integer division), content = the frame's
    byte slice, modality = 'image'. Same frame grid and every-kth
    sampling as ``sample_frames``, but built from pure column
    expressions (one hex() + substr slices) instead of the pandas
    kernel — map-only, no shuffle, no UDF."""
    fb2 = frame_bytes * 2
    videos = media.where(F.col("modality") == "video").select(
        "doc_id",
        F.hex(F.col("content")).alias("hx"),
        F.length("content").alias("nb"),
    )
    n_frames = (
        (F.col("nb") + F.lit(frame_bytes - 1)) / F.lit(frame_bytes)
    ).cast("int")
    return (
        videos.where(F.col("nb") > 0)
        .select(
            "doc_id",
            "hx",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every))
            ).alias("frame_no"),
        )
        .select(
            (F.col("doc_id") * id_stride + F.col("frame_no")).alias("doc_id"),
            F.unhex(
                F.col("hx").substr(F.col("frame_no") * fb2 + 1, F.lit(fb2))
            ).alias("content"),
            F.lit("image").alias("modality"),
        )
    )


def video_near_dups(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_SAMPLE_EVERY,
    id_stride: int = VIDEO_FRAME_ID_STRIDE,
    min_share: float = 0.0,
) -> DataFrame:
    """Video near-duplicate pairs by FRAME-SET overlap — the composition
    the image stack was built for: sampled frames (``video_frame_images``)
    -> per-frame 64-bit perceptual hash (``image_phash``, integer-exact)
    -> the shared banded-hamming kernel (``dedup.banded_hamming_pairs``,
    candidate pairs only where a 16-bit band collides) -> per-video-pair
    matched-frame share. A re-encoded copy keeps most frames within
    ``max_hamming`` of the original's, so the pair surfaces with a high
    share even when no byte is identical.

    Returns (video_a, video_b, n_frames_a, n_frames_b, n_matched_a,
    n_matched_b, match_share): matched = the video's distinct frames with
    >= 1 near-dup frame in the other video; match_share = the SMALLER of
    the two matched fractions (conservative — both videos must agree),
    rounded 6dp; pairs below ``min_share`` drop.

    Scale: frame explosion and hashing are map-only; candidates come from
    the band equi-join (never all-pairs across frames); the per-pair
    aggregation and the two frame-count joins shuffle only matched pairs
    and per-video counts. Frame ids order like (video, frame), so the
    kernel's doc_a < doc_b guarantees video_a < video_b on cross-video
    pairs — each pair aggregates exactly once."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    frames = video_frame_images(
        media, frame_bytes=frame_bytes, every=every, id_stride=id_stride
    )
    # persist: same projection-collapse hazard as image_near_dups — the
    # band self-join would re-evaluate the inlined pixel fold per side
    fp = image_phash(frames).persist()
    pairs = banded_hamming_pairs(
        fp, "phash", max_hamming=max_hamming, n_bands=n_bands, n_bits=64
    )
    cross = pairs.select(
        F.expr(f"doc_a div {id_stride}").alias("video_a"),
        F.expr(f"doc_b div {id_stride}").alias("video_b"),
        "doc_a",
        "doc_b",
    ).where(F.col("video_a") != F.col("video_b"))
    matched = cross.groupBy("video_a", "video_b").agg(
        F.countDistinct("doc_a").cast("int").alias("n_matched_a"),
        F.countDistinct("doc_b").cast("int").alias("n_matched_b"),
    )
    counts = (
        fp.select(F.expr(f"doc_id div {id_stride}").alias("video"))
        .groupBy("video")
        .agg(F.count(F.lit(1)).cast("int").alias("nf"))
    )
    ca = counts.select(
        F.col("video").alias("video_a"), F.col("nf").alias("n_frames_a")
    )
    cb = counts.select(
        F.col("video").alias("video_b"), F.col("nf").alias("n_frames_b")
    )
    share = F.round(
        F.least(
            F.col("n_matched_a").cast("double") / F.col("n_frames_a"),
            F.col("n_matched_b").cast("double") / F.col("n_frames_b"),
        ),
        6,
    )
    return (
        matched.join(ca, "video_a")
        .join(cb, "video_b")
        .select(
            "video_a",
            "video_b",
            "n_frames_a",
            "n_frames_b",
            "n_matched_a",
            "n_matched_b",
            share.alias("match_share"),
        )
        .where(F.col("match_share") >= min_share)
    )


AUDIO_WINDOW_SAMPLES = 65     # 65 samples -> 64 first-difference bits
AUDIO_WINDOW_HOP = 32
AUDIO_WINDOW_ID_STRIDE = 1_000_000


def audio_window_fingerprints(
    media: DataFrame,
    *,
    hop: int = AUDIO_WINDOW_HOP,
    id_stride: int = AUDIO_WINDOW_ID_STRIDE,
) -> DataFrame:
    """64-bit spectral-style fingerprint per overlapping audio WINDOW —
    the third modality on the shared fingerprint discipline: treat each
    content byte as one fake PCM sample (the registry-fake decode; a real
    codec would hand the same window math a true sample buffer), slice
    the stream into 65-sample windows every ``hop`` samples, and set bit
    i iff sample i+1 > sample i — the sign-of-first-difference coding at
    the core of Chromaprint-class audio fingerprints, invariant to DC
    offset and to any gain remap that preserves sample order (the
    transforms a re-encode applies). Short/corrupt streams tile
    cyclically (pmod nb), exactly the ``image_phash`` convention.

    Pure column expressions over ONE hex() of the blob — map-only, no
    UDF, no shuffle; the hash is two HOF expressions (sample array ->
    bit fold), never 64 unrolled columns (codegen method limit). Window
    id = audio_id * ``id_stride`` + window_no. Returns (doc_id, fp)."""
    w = AUDIO_WINDOW_SAMPLES
    audio = media.where(F.col("modality") == "audio").select(
        "doc_id",
        F.hex(F.col("content")).alias("hx"),
        F.length("content").alias("nb"),
    )
    n_windows = ((F.col("nb") + F.lit(hop - 1)) / F.lit(hop)).cast("int")
    wins = (
        audio.where(F.col("nb") > 0)
        .select(
            "doc_id",
            "hx",
            "nb",
            F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("win_no"),
        )
        .select(
            (F.col("doc_id") * id_stride + F.col("win_no")).alias("doc_id"),
            "hx",
            "nb",
            (F.col("win_no") * hop).alias("start"),
        )
    )
    px = (
        f"transform(sequence(0, {w - 1}), i -> cast(conv(substr(hx,"
        f" pmod(start + i, nb) * 2 + 1, 2), 16, 10) as int))"
    )
    fold = (
        f"aggregate(sequence(0, {w - 2}), 0L, (acc, i) ->"
        f" acc + (case when __px[i + 1] > __px[i] then"
        f" (case when i = 63 then {-(1 << 63)}L else shiftleft(1L, i) end)"
        f" else 0L end))"
    )
    return (
        wins.withColumn("__px", F.expr(px))
        .select("doc_id", F.expr(fold).cast("long").alias("fp"))
    )


def audio_near_dups(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    hop: int = AUDIO_WINDOW_HOP,
    id_stride: int = AUDIO_WINDOW_ID_STRIDE,
    min_share: float = 0.0,
) -> DataFrame:
    """Audio near-duplicate pairs by matched-WINDOW share — completing
    the image/video/audio modality family on the one shared kernel:
    overlapping window fingerprints (``audio_window_fingerprints``) ->
    the banded-hamming candidate join (``dedup.banded_hamming_pairs``,
    never all-pairs across windows) -> per-audio-pair matched-window
    share, the exact aggregation shape of ``video_near_dups``. A
    re-encoded copy keeps most windows within ``max_hamming`` of the
    original's, so the pair surfaces with a high share with no byte
    identical.

    Returns (audio_a, audio_b, n_windows_a, n_windows_b, n_matched_a,
    n_matched_b, match_share); share = the smaller matched fraction,
    rounded 6dp; pairs below ``min_share`` drop."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    # persist: the band self-join would re-evaluate the inlined sample
    # fold per side (the image/video projection-collapse hazard)
    fp = audio_window_fingerprints(
        media, hop=hop, id_stride=id_stride
    ).persist()
    pairs = banded_hamming_pairs(
        fp, "fp", max_hamming=max_hamming, n_bands=n_bands, n_bits=64
    )
    cross = pairs.select(
        F.expr(f"doc_a div {id_stride}").alias("audio_a"),
        F.expr(f"doc_b div {id_stride}").alias("audio_b"),
        "doc_a",
        "doc_b",
    ).where(F.col("audio_a") != F.col("audio_b"))
    matched = cross.groupBy("audio_a", "audio_b").agg(
        F.countDistinct("doc_a").cast("int").alias("n_matched_a"),
        F.countDistinct("doc_b").cast("int").alias("n_matched_b"),
    )
    counts = (
        fp.select(F.expr(f"doc_id div {id_stride}").alias("audio"))
        .groupBy("audio")
        .agg(F.count(F.lit(1)).cast("int").alias("nw"))
    )
    ca = counts.select(
        F.col("audio").alias("audio_a"), F.col("nw").alias("n_windows_a")
    )
    cb = counts.select(
        F.col("audio").alias("audio_b"), F.col("nw").alias("n_windows_b")
    )
    share = F.round(
        F.least(
            F.col("n_matched_a").cast("double") / F.col("n_windows_a"),
            F.col("n_matched_b").cast("double") / F.col("n_windows_b"),
        ),
        6,
    )
    return (
        matched.join(ca, "audio_a")
        .join(cb, "audio_b")
        .select(
            "audio_a",
            "audio_b",
            "n_windows_a",
            "n_windows_b",
            "n_matched_a",
            "n_matched_b",
            share.alias("match_share"),
        )
        .where(F.col("match_share") >= min_share)
    )
