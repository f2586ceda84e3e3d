"""Multimodal plumbing: REAL PNG/JPEG header decode (JVM fold + Python
struct walk) against construction-time ground truth; byte-slicing frame
sampler; codec-only stub gate for pixel/audio/video."""

import pytest


def test_image_header_decode_jvm_python_and_ground_truth_agree(spark, sf_dir):
    """Three independent answers must coincide per doc: the construction-time
    media_meta, the JVM column-expression parse (decode_image_meta), and the
    Python struct parse through mapInPandas (extract_media_features)."""
    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_images,
        decode_image_meta,
        extract_media_features,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = attach_synthetic_images(docs)
    truth = {r.doc_id: r.media_meta for r in media.collect()}
    jvm = {r.doc_id: r for r in decode_image_meta(media.select("doc_id", "media_bytes")).collect()}
    py = {
        r.doc_id: r
        for r in extract_media_features(media.select("doc_id", "media_bytes")).collect()
    }
    assert set(jvm) == set(truth) == set(py) and len(truth) == 60
    for doc_id, meta in truth.items():
        for parsed in (jvm[doc_id], py[doc_id]):
            assert parsed.media_format == meta.media_format
            assert parsed.width == meta.width
            assert parsed.height == meta.height


def test_jpeg_sof0_offset_actually_varies(spark, sf_dir):
    """The COM segment length is md5-derived, so SOF0 must sit at multiple
    distinct offsets across the fixture — fixed-offset 'parsers' would fail."""
    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_images,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    blobs = attach_synthetic_images(docs).where("doc_id % 2 = 1").collect()
    offsets = {bytes(r.media_bytes).find(b"\xff\xc0") for r in blobs}
    assert len(offsets) >= 4, f"COM length not varying: SOF0 offsets {offsets}"


def test_decode_media_parses_real_png_and_jpeg_bytes():
    """Python decode against byte strings built with an independent encoder
    (hand-assembled here, not via the engine's construction path)."""
    import struct as s

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import decode_media

    png = b"\x89PNG\r\n\x1a\n" + s.pack(">I", 13) + b"IHDR" + s.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    assert decode_media(png) == {"media_format": "png", "width": 640, "height": 480}
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1" + s.pack(">H", 2 + 7) + b"exif---"  # APP1, skipped
        + b"\xff\xc2" + s.pack(">H", 17) + b"\x08" + s.pack(">HH", 99, 1024) + b"\x00" * 10  # progressive SOF2
        + b"\xff\xd9"
    )
    assert decode_media(jpeg) == {"media_format": "jpeg", "width": 1024, "height": 99}


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


def test_codec_boundary_is_explicitly_stubbed_for_non_images():
    """decode_media dispatches to the native decoders (PNG, baseline JPEG,
    WAV/PCM16, AVI/DIB); unrecognised formats and compressed profiles the
    per-codec decoders don't cover stay an explicit error, never a
    misread."""
    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_media,
        encode_avi_dib,
        encode_wav_pcm16,
    )

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00" * 16)  # unknown container
    with pytest.raises(ValueError):
        decode_media(b"RIFF....WAVE")  # truncated/invalid WAV body

    m = decode_media(encode_wav_pcm16(np.arange(10, dtype=np.int16), sample_rate=16000))
    assert m == {"media_format": "wav/pcm16", "sample_rate": 16000, "n_samples": 10}
    fr = np.zeros((2, 4, 6, 3), dtype=np.uint8)
    m = decode_media(encode_avi_dib(fr))
    assert m == {"media_format": "avi/dib24", "width": 6, "height": 4, "n_frames": 2}


def test_jpeg_standalone_markers_have_no_length_field(spark):
    """TEM (FF01) and RST0-7 (FFD0-D7) carry no 2-byte length; a walk that
    consumes a phantom length there mis-skips real-world JPEGs. EOI (FFD9)
    must end the walk cleanly. Exercised through BOTH parsers: the Python
    struct walk directly and the JVM F.aggregate fold via a one-row DF."""
    import struct as s

    from pyspark.sql import functions as F

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_image_meta,
        decode_media,
    )

    with_standalone = (
        b"\xff\xd8"
        + b"\xff\x01"  # TEM: standalone
        + b"\xff\xd0" + b"\xff\xd7"  # RST0, RST7: standalone
        + b"\xff\xe0" + s.pack(">H", 2 + 5) + b"JFIF\x00"  # APP0 with length
        + b"\xff\xc0" + s.pack(">H", 17) + b"\x08" + s.pack(">HH", 240, 320) + b"\x00" * 10
        + b"\xff\xd9"
    )
    ends_at_eoi = b"\xff\xd8" + b"\xff\xd9"  # EOI before any frame header

    assert decode_media(with_standalone) == {
        "media_format": "jpeg", "width": 320, "height": 240,
    }
    assert decode_media(ends_at_eoi) == {
        "media_format": "jpeg", "width": -1, "height": -1,
    }

    df = spark.createDataFrame(
        [(1, bytearray(with_standalone)), (2, bytearray(ends_at_eoi))],
        "doc_id long, media_bytes binary",
    )
    jvm = {r.doc_id: r for r in decode_image_meta(df).collect()}
    assert (jvm[1].media_format, jvm[1].width, jvm[1].height) == ("jpeg", 320, 240)
    assert (jvm[2].media_format, jvm[2].width, jvm[2].height) == ("jpeg", -1, -1)


def test_png_pixel_codec_round_trip_all_filters():
    """encode_png_rgba cycles scanline filters 0..4, so a bit-exact
    round-trip proves every unfilter path (None/Sub/Up/Average/Paeth),
    plus the zlib IDAT inflate and chunk-CRC construction."""
    import hashlib

    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_rgba,
    )

    blob = hashlib.md5(b"pixel-fixture").digest() * 512
    for h, w in [(1, 1), (5, 17), (19, 4), (16, 16)]:
        px = np.frombuffer(blob[: h * w * 4], dtype=np.uint8).reshape(h, w, 4)
        for cyc in (True, False):
            assert np.array_equal(decode_png_pixels(encode_png_rgba(px, cyc)), px)


def test_png_pixel_decoder_rejects_unsupported_profiles():
    """Non-RGBA8 profiles (palette, 16-bit, interlaced) are a REAL codec's
    territory — the decoder must refuse them loudly, not misdecode."""
    import struct as s

    import pytest as _pytest

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_png_pixels,
    )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = s.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # color type 3: palette
    chunk = s.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
    with _pytest.raises(NotImplementedError):
        decode_png_pixels(sig + chunk)
    with _pytest.raises(ValueError):
        decode_png_pixels(b"\x00" * 16)


def test_pixel_features_and_thumbnail_over_spark(spark, sf_dir):
    """End-to-end through the engine: build complete PNGs (mapInPandas),
    decode pixels (mapInPandas), check mean against the closed-form
    expectation, and thumbnail shape/value domain."""
    import hashlib

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_pixel_images,
        extract_pixel_features,
        synthetic_pixel_dims,
        thumbnail_gray,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    texts = {r.doc_id: r.text for r in docs.collect()}
    media = attach_synthetic_pixel_images(docs)
    feats = {r.doc_id: r for r in extract_pixel_features(media).collect()}
    assert set(feats) == set(texts)
    for doc_id, text in texts.items():
        digest = hashlib.md5(str(text).encode("utf-8")).digest()
        w, h = synthetic_pixel_dims(digest)
        total = w * h * 4
        expected = (sum(digest) * (total // 16) + sum(digest[: total % 16])) / total
        got = feats[doc_id]
        assert (got.width, got.height, got.n_pixels) == (w, h, w * h)
        assert got.mean_pixel == expected  # bit-exact: int sum / int total

    thumbs = {r.doc_id: r.thumb for r in thumbnail_gray(media, size=4).collect()}
    for doc_id, t in thumbs.items():
        assert len(t) == 16
        assert all(0.0 <= v <= 255.0 for v in t)


def test_wav_pcm_codec_round_trip_with_chunk_walk():
    """WAV writer/reader round-trip: the junk LIST chunk before `data`
    forces a genuine RIFF chunk walk (fixed-offset readers would
    misparse), and the PCM payload must survive little-endian
    reinterpretation bit-exactly."""
    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm16,
    )

    rng = np.arange(-300, 300, dtype=np.int16) * 100
    blob = encode_wav_pcm16(rng, sample_rate=16000, junk=b"metadata-of-odd-len")
    rate, out = decode_wav_pcm(blob)
    assert rate == 16000
    assert np.array_equal(out, rng)
    # without junk too (chunk walk must not REQUIRE the LIST chunk)
    rate2, out2 = decode_wav_pcm(encode_wav_pcm16(rng))
    assert rate2 == 8000 and np.array_equal(out2, rng)


def test_wav_decoder_rejects_non_pcm16_mono_profiles():
    """Compressed / multi-channel WAV profiles are a codec boundary like
    JPEG pixels: the decoder must refuse loudly, never misread."""
    import struct

    import numpy as np
    import pytest

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm16,
    )

    blob = bytearray(encode_wav_pcm16(np.zeros(8, dtype=np.int16)))
    fmt_off = blob.index(b"fmt ") + 8
    blob[fmt_off : fmt_off + 2] = struct.pack("<H", 2)  # ADPCM
    with pytest.raises(NotImplementedError):
        decode_wav_pcm(bytes(blob))
    with pytest.raises(ValueError):
        decode_wav_pcm(b"RIFFxxxxNOPE")


def test_audio_features_over_spark_match_waveform_math(spark, sf_dir):
    """Engine path end-to-end on a handful of docs: encode → decode →
    features must equal the closed-form square-wave math per doc."""
    import hashlib

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_audio,
        extract_audio_features,
        synthetic_audio_params,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(12).cache()
    feats = {
        r.doc_id: r
        for r in extract_audio_features(attach_synthetic_audio(docs)).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        d = hashlib.md5(str(row.text).encode("utf-8")).digest()
        n, amp, half = synthetic_audio_params(d)
        f = feats[row.doc_id]
        assert f.n_samples == n
        assert f.duration_ms == n // 8
        assert f.rms == float(amp)
        assert f.peak == amp
        assert f.zero_crossings == (n - 1) // half
    docs.unpersist()


def test_avi_dib_codec_round_trip_and_rejection():
    """AVI writer/reader round-trip over random frames: the reader must
    undo all three DIB storage conventions (4-byte row stride, bottom-up
    rows, BGR order) bit-exactly, and refuse compressed streams loudly."""
    import struct

    import numpy as np
    import pytest

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        decode_avi_dib,
        encode_avi_dib,
    )

    rng = np.random.default_rng(11)
    for w in (4, 5, 6, 7):  # every stride-padding residue of w*3 mod 4
        frames = rng.integers(0, 256, size=(3, 5, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_avi_dib(encode_avi_dib(frames)), frames)

    blob = bytearray(encode_avi_dib(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)))
    off = blob.index(b"strf") + 8 + 16
    blob[off : off + 4] = struct.pack("<I", 0x47504A4D)  # 'MJPG'
    with pytest.raises(NotImplementedError):
        decode_avi_dib(bytes(blob))
    with pytest.raises(ValueError):
        decode_avi_dib(b"RIFFxxxxWAVE")


def test_video_features_over_spark_are_position_sensitive(spark, sf_dir):
    """Engine path end-to-end on a handful of docs, plus the flip/swap
    probe: corrupting the decode by skipping the row flip must change
    top_left_r for at least one doc (means alone would forgive it)."""
    import hashlib

    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_video,
        decode_avi_dib,
        extract_video_features,
        synthetic_video_params,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(8).cache()
    media_rows = attach_synthetic_video(docs).collect()
    feats = {
        r.doc_id: r
        for r in extract_video_features(attach_synthetic_video(docs)).collect()
    }
    any_flip_sensitive = False
    for row in docs.select("doc_id", "text").collect():
        d = hashlib.md5(str(row.text).encode("utf-8")).digest()
        n, w, h = synthetic_video_params(d)
        f = feats[row.doc_id]
        assert (f.n_frames, f.width, f.height) == (n, w, h)
        assert f.top_left_r == hashlib.md5(f"{row.text}|0".encode("utf-8")).digest()[0]
        blob = next(bytes(m.media_bytes) for m in media_rows if m.doc_id == row.doc_id)
        fr = decode_avi_dib(blob)
        # a decoder that forgot the bottom-up flip would report this instead:
        wrong_tlr = int(fr[0, -1, 0, 0])
        if wrong_tlr != f.top_left_r:
            any_flip_sensitive = True
        assert f.mean_brightness == float(np.mean(fr.astype(np.float64)))
    assert any_flip_sensitive, "fixture degenerate: flip probe has no power"
    docs.unpersist()


def test_jpeg_codec_round_trip_error_envelope():
    """Baseline JPEG round-trip at quant=1 over adversarial (noise)
    content: per-pixel error must stay within the analytic envelope of
    coefficient rounding through an orthonormal IDCT (measured max 1;
    gate 2). Constant blocks — DC-only — must round-trip EXACTLY."""
    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.jpegcodec import (
        decode_jpeg_baseline_gray,
        encode_jpeg_baseline_gray,
    )

    rng = np.random.default_rng(5)
    for _ in range(5):
        h, w = int(rng.integers(4, 48)), int(rng.integers(4, 48))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = decode_jpeg_baseline_gray(encode_jpeg_baseline_gray(img))
        assert dec.shape == img.shape
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 2

    const = np.full((16, 8), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_baseline_gray(encode_jpeg_baseline_gray(const)), const
    )


def test_jpeg_entropy_coder_matches_handcrafted_bitstream():
    """Independent anchor so an encoder/decoder bug pair cannot cancel:
    for a constant-128 8x8 image every DCT coefficient is 0, so the scan
    is exactly [DC category-0 code '00'] + [EOB '1010'] + '11' padding =
    0x2B — one byte, derivable by hand from the canonical Huffman code
    construction over the Annex-K luminance tables."""
    import numpy as np

    from svdmovie_lens_parallel_apache_spark_spark.operators.jpegcodec import (
        encode_jpeg_baseline_gray,
    )

    blob = encode_jpeg_baseline_gray(np.full((8, 8), 128, dtype=np.uint8))
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    sos_at = blob.index(b"\xff\xda")
    (sos_len,) = __import__("struct").unpack(">H", blob[sos_at + 2 : sos_at + 4])
    scan = blob[sos_at + 2 + sos_len : -2]
    assert scan == b"\x2b", scan.hex()


def test_jpeg_decoder_rejects_unsupported_profiles():
    import numpy as np
    import pytest

    from svdmovie_lens_parallel_apache_spark_spark.operators.jpegcodec import (
        decode_jpeg_baseline_gray,
        encode_jpeg_baseline_gray,
    )

    blob = bytearray(encode_jpeg_baseline_gray(np.zeros((8, 8), dtype=np.uint8)))
    sof_at = bytes(blob).index(b"\xff\xc0")
    blob[sof_at + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline_gray(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg_baseline_gray(b"\x00\x01not-a-jpeg")


def test_jpeg_roundtrip_features_over_spark(spark, sf_dir):
    """Engine path end-to-end: every doc's JFIF must decode back inside
    the error envelope and the reported dims/mean must match the md5
    parameterisation."""
    import hashlib

    from svdmovie_lens_parallel_apache_spark_spark.operators.multimodal import (
        attach_synthetic_jpeg,
        jpeg_roundtrip_features,
        synthetic_gray_dims,
    )
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10).cache()
    feats = {
        r.doc_id: r
        for r in jpeg_roundtrip_features(attach_synthetic_jpeg(docs)).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        d = hashlib.md5(str(row.text).encode("utf-8")).digest()
        w, h = synthetic_gray_dims(d)
        f = feats[row.doc_id]
        assert (f.width, f.height) == (w, h)
        assert f.roundtrip_ok, f"doc {row.doc_id} outside error envelope"
    docs.unpersist()
