"""Multimodal plumbing tests: schema, Arrow batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mldag_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_stats,
    synthesize_media,
)
from mldag_spark.queries.tables import load


@pytest.fixture()
def media(spark, sf_dir):
    return synthesize_media(
        load(spark, sf_dir, "documents").limit(50), "doc_id", "text"
    )


def test_media_schema_and_payload(spark, media):
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["mime"] == "image/png"
    assert row["width"] >= 32 and row["height"] >= 32


def test_extract_features_shape_and_determinism(spark, media):
    out = extract_features(media, dim=8)
    assert [f.name for f in out.schema.fields[:4]] == [
        f.name for f in FEATURE_SCHEMA.fields
    ]
    rows1 = {r["media_id"]: r["features"] for r in out.collect()}
    rows2 = {r["media_id"]: r["features"] for r in out.collect()}
    assert rows1 == rows2                       # deterministic kernel
    assert all(len(v) == 8 for v in rows1.values())
    # byte counts match the payload
    n = {r["media_id"]: r["n_bytes"] for r in out.collect()}
    src = {r["media_id"]: len(r["payload"]) for r in media.collect()}
    assert n == src


def test_extract_features_native_real_decode_all_codecs(spark):
    """The r12 seam closure for featurization: engine="native" REALLY
    decodes all three repo-native containers and computes genuine
    signal features — PNG intensity histogram, WAV spectral band
    power, Y4M temporal luma profile — each verified against an
    in-test numpy reference on the raw signal."""
    import io
    import struct
    import wave as wave_mod

    import numpy as np

    from mldag_spark.operators.multimodal import (
        png_encode_gray,
        y4m_encode,
    )

    dim = 8
    rng = np.random.RandomState(11)

    # PNG: known pixels -> histogram reference
    px = rng.randint(0, 256, (40, 50), dtype=np.uint8)
    png = png_encode_gray(px)
    hist, _ = np.histogram(px, bins=dim, range=(0, 256))
    want_png = (hist / hist.sum()).tolist()

    # WAV: 440 Hz sine @8k -> rfft band power reference
    sr, n = 8000, 2000
    t = np.arange(n) / sr
    s = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(s.tobytes())
    wav = buf.getvalue()
    spec = np.abs(np.fft.rfft(s.astype(np.float64))) ** 2
    edges = (np.arange(dim + 1, dtype=np.int64) * len(spec)) // dim
    bands = np.array([spec[edges[i]:edges[i + 1]].mean() for i in range(dim)])
    want_wav = (bands / bands.sum()).tolist()

    # Y4M: 12 frames of known mean luma -> NN-resampled profile
    frames = [
        np.full((16, 16), v, dtype=np.uint8)
        for v in rng.randint(0, 256, 12)
    ]
    y4m = y4m_encode(frames)
    means = np.array([f.mean() for f in frames]) / 255.0
    idx = (np.arange(dim, dtype=np.int64) * len(means)) // dim
    want_y4m = means[idx].tolist()

    rows = [
        (1, "image/png", png),
        (2, "audio/wav", wav),
        (3, "video/y4m", y4m),
        (4, "application/octet-stream", b"not a container"),
    ]
    media = spark.createDataFrame(
        [(i, m, p, None, None, None) for i, m, p in rows],
        "media_id long, mime string, payload binary, width int, "
        "height int, duration_ms long",
    )
    got = {
        r["media_id"]: r
        for r in extract_features(media, dim=dim, engine="native").collect()
    }
    # stereo WAV: interleaved channels through one rfft would be a
    # spectrally scrambled "feature" with ok=true — must be ok=false
    # (code-review r12 finding #3)
    buf2 = io.BytesIO()
    with wave_mod.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.repeat(s, 2).tobytes())
    stereo = spark.createDataFrame(
        [(9, "audio/wav", buf2.getvalue(), None, None, None)],
        "media_id long, mime string, payload binary, width int, "
        "height int, duration_ms long",
    )
    srow = extract_features(stereo, dim=dim, engine="native").collect()[0]
    assert srow["ok"] is False and srow["features"] is None

    assert got[1]["ok"] and got[2]["ok"] and got[3]["ok"]
    assert got[1]["features"] == pytest.approx(want_png)
    assert got[2]["features"] == pytest.approx(want_wav)
    assert got[3]["features"] == pytest.approx(want_y4m)
    # unrecognized container -> ok=false, null features, never a crash
    assert got[4]["ok"] is False and got[4]["features"] is None


def test_frame_sample_plan(spark, sf_dir):
    media = synthesize_media(
        load(spark, sf_dir, "documents").limit(10),
        "doc_id",
        "text",
        mime="video/mp4",
    )
    out = frame_sample_plan(media, every_ms=1000)
    per = (
        out.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_ts_ms").alias("last"))
        .join(media.select("media_id", "duration_ms"), "media_id")
        .collect()
    )
    for r in per:
        assert r["n"] == r["duration_ms"] // 1000 + 1
        assert r["last"] <= r["duration_ms"]


def test_media_stats_metadata_only(spark, media):
    stats = media_stats(media).collect()
    assert len(stats) == 1
    assert stats[0]["n_items"] == 50


def test_resize_media_dims_and_truncation(spark, media):
    from mldag_spark.operators.multimodal import resize_media

    out = resize_media(media, max_px=64, engine="fake")
    rows = {r["media_id"]: r for r in out.collect()}
    for r in media.collect():
        got = rows[r["media_id"]]
        longest = max(r["width"], r["height"])
        if longest > 64:
            assert got["width"] == r["width"] * 64 // longest
            assert got["height"] == r["height"] * 64 // longest
            assert len(got["payload"]) == (
                len(r["payload"]) * 4096 // (longest * longest)
            )
            # truncation, not mangling: output is a prefix of the input
            assert bytes(r["payload"]).startswith(bytes(got["payload"]))
        else:
            assert (got["width"], got["height"]) == (r["width"], r["height"])
            assert bytes(got["payload"]) == bytes(r["payload"])
        assert max(got["width"], got["height"]) <= max(longest, 64)


def test_resize_media_native_real_png_roundtrip(spark):
    """The r12 seam closure (VERDICT r11 #2): engine="native" REALLY
    decodes the PNG payload, nearest-neighbor downsamples it with the
    integer-exact index map, and re-encodes — verified by parsing the
    OUTPUT payload back and checking pixels against an in-test numpy
    reference on the original image."""
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
        resize_media,
    )

    rng = np.random.RandomState(7)
    imgs = {
        1: rng.randint(0, 256, (96, 200), dtype=np.uint8),   # wide
        2: rng.randint(0, 256, (150, 40), dtype=np.uint8),   # tall
        3: rng.randint(0, 256, (30, 50), dtype=np.uint8),    # small
    }
    rows = [
        (mid, "image/png", png_encode_gray(px), px.shape[1], px.shape[0],
         None)
        for mid, px in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, mime string, payload binary, width int, "
        "height int, duration_ms long",
    )
    out = {r["media_id"]: r for r in
           resize_media(media, max_px=64, engine="native").collect()}
    for mid, px in imgs.items():
        r = out[mid]
        assert r["ok"] is True
        h0, w0 = px.shape
        longest = max(w0, h0)
        if longest <= 64:
            assert (r["width"], r["height"]) == (w0, h0)
            assert bytes(r["payload"]) == bytes(rows[mid - 1][2])
            continue
        nw, nh = w0 * 64 // longest, h0 * 64 // longest
        assert (r["width"], r["height"]) == (nw, nh)
        got_w, got_h, got_px = _png_parse_gray(bytes(r["payload"]))
        assert (got_w, got_h) == (nw, nh)
        ri = (np.arange(nh, dtype=np.int64) * h0) // nh
        ci = (np.arange(nw, dtype=np.int64) * w0) // nw
        assert np.array_equal(got_px, px[ri][:, ci])


def test_resize_media_native_corrupt_rows_ok_false(spark, media):
    """Non-PNG payloads (the synthesize_media fake bytes) must come
    back ok=false pass-through under the real engine — a bad document
    never kills the pass (the decode_image_stats pattern)."""
    from mldag_spark.operators.multimodal import resize_media

    out = resize_media(media, max_px=64, engine="native").collect()
    assert len(out) == 50
    assert all(r["ok"] is False for r in out)
    orig = {r["media_id"]: r for r in media.collect()}
    for r in out:
        o = orig[r["media_id"]]
        assert bytes(r["payload"]) == bytes(o["payload"])
        assert (r["width"], r["height"]) == (o["width"], o["height"])


def test_resize_media_pil_parity_where_present(spark):
    """Guarded-import PIL engine: dims and decodability must match the
    native stdlib engine on gray PNGs (pixel policy may differ across
    resamplers, so parity here is container-level). Skipped where
    pillow is absent — the decode_image_stats precedent."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        pytest.skip("pillow not installed")
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
        resize_media,
    )

    px = np.arange(0, 96 * 200, dtype=np.int64).reshape(96, 200) % 256
    media = spark.createDataFrame(
        [(1, "image/png", png_encode_gray(px.astype(np.uint8)), 200, 96,
          None)],
        "media_id long, mime string, payload binary, width int, "
        "height int, duration_ms long",
    )
    nat = resize_media(media, max_px=64, engine="native").collect()[0]
    pil = resize_media(media, max_px=64, engine="pil").collect()[0]
    assert pil["ok"] is True
    assert (pil["width"], pil["height"]) == (nat["width"], nat["height"])
    w, h, _ = _png_parse_gray(bytes(pil["payload"]))
    assert (w, h) == (nat["width"], nat["height"])


def test_resize_media_pil_engine_raises_on_driver_when_absent(spark, media):
    """engine='pil' without pillow must fail at kernel BUILD time on
    the driver (ImportError), never mid-task on an executor."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("pillow installed — absence path not testable")
    from mldag_spark.operators.multimodal import resize_media

    with pytest.raises(ImportError, match="pillow"):
        resize_media(media, max_px=64, engine="pil")


def test_wav_decode_real_codec_roundtrip(spark):
    # the REAL codec path (r10): a hand-built 440 Hz sine WAV decoded
    # on the executors must yield exact container metadata and the
    # analytically known signal stats; a truncated payload must land
    # as ok=false, never a task failure
    import io
    import math
    import struct
    import wave

    from mldag_spark.operators.multimodal import decode_audio_stats

    rate, n, amp = 8000, 8000, 12000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(amp * math.sin(2 * math.pi * 440 * i / rate))
                )
                for i in range(n)
            )
        )
    good = buf.getvalue()
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30])),
         (3, bytearray(b"not a wav"))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in decode_audio_stats(rows).collect()}
    g = out[1]
    assert g["ok"] and g["channels"] == 1 and g["sample_rate"] == rate
    assert g["n_frames"] == n and abs(g["duration_sec"] - 1.0) < 1e-9
    # sine RMS = amp / sqrt(2) (within quantization of int samples)
    assert abs(g["rms"] - amp / math.sqrt(2)) < 20.0, g["rms"]
    assert amp - 2 <= g["peak"] <= amp
    assert out[2]["ok"] is False and out[2]["rms"] is None
    assert out[3]["ok"] is False


def test_synthesize_wav_parses_back_exactly(spark):
    # synthesize_wav writes genuine RIFF containers: wave.open on the
    # driver must parse each payload with the contract's frame count
    import io
    import wave

    from mldag_spark.operators.multimodal import synthesize_wav

    docs = spark.createDataFrame(
        [(10, "hello world"), (11, ""), (12, "x" * 1000)],
        "doc_id long, text string",
    )
    rows = synthesize_wav(docs, "doc_id", "text").collect()
    by_id = {r["media_id"]: bytes(r["payload"]) for r in rows}
    for did, text in ((10, "hello world"), (11, ""), (12, "x" * 1000)):
        with wave.open(io.BytesIO(by_id[did]), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getframerate() == 8000
            assert w.getnframes() == len(text.encode()) % 400 + 100


def test_audio_decode_length_convention_multibyte_and_null(spark):
    # ADVICE r10 #1: the kernel counts utf-8 BYTES with a null→''
    # fallback; the gate oracle must share that convention (strlen +
    # COALESCE — char-counting length(text) was green only because
    # documents.text is ASCII and non-null at every tested sf). Pin
    # both engines on multibyte and NULL text.
    import duckdb

    from mldag_spark.operators.multimodal import (
        decode_audio_stats,
        synthesize_wav,
    )
    from mldag_spark.queries import ORACLES

    data = [(1, "héllo wörld"), (2, "日本語のテキスト"), (3, None), (4, "plain")]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    out = {
        r["media_id"]: r["n_frames"]
        for r in decode_audio_stats(
            synthesize_wav(docs, "doc_id", "text")
        ).collect()
    }
    for did, text in data:
        assert out[did] == len((text or "").encode("utf-8")) % 400 + 100

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({d}, {'NULL' if t is None else repr(t)})" for d, t in data
        )
        + ") AS v(doc_id, text)"
    )
    oracle = {
        r[0]: r[4]
        for r in con.execute(ORACLES["multimodal_audio_decode"]).fetchall()
    }
    assert oracle == out


# ---------------------------------------------------------------------------
# REAL image codec (r11): stdlib PNG encode + spec-correct parse
# ---------------------------------------------------------------------------
def test_png_roundtrip_exact_pixels():
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(23, 37), dtype=np.uint8)
    w, h, out = _png_parse_gray(png_encode_gray(px))
    assert (w, h) == (37, 23)
    assert np.array_equal(out, px)


def test_png_parser_reverses_all_five_filter_types():
    # hand-build a PNG whose five scanlines each use a different filter
    # type, computing the filtered bytes per the PNG spec from known
    # pixels — the parser must reconstruct the original image exactly
    import struct
    import zlib

    import numpy as np

    from mldag_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        _png_parse_gray,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 16), dtype=np.uint8).astype(int)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else b if pb <= pc else c

    lines = b""
    for r, ftype in enumerate((0, 1, 2, 3, 4)):
        cur = px[r]
        prior = px[r - 1] if r > 0 else np.zeros(16, dtype=int)
        filt = []
        for i in range(16):
            left = int(cur[i - 1]) if i > 0 else 0
            up = int(prior[i])
            ul = int(prior[i - 1]) if i > 0 else 0
            pred = {
                0: 0, 1: left, 2: up, 3: (left + up) // 2,
                4: paeth(left, up, ul),
            }[ftype]
            filt.append((int(cur[i]) - pred) & 0xFF)
        lines += bytes([ftype]) + bytes(filt)
    ihdr = struct.pack(">IIBBBBB", 16, 5, 8, 0, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    w, h, out = _png_parse_gray(payload)
    assert (w, h) == (16, 5)
    assert np.array_equal(out, px.astype(np.uint8))


def test_png_parser_rejects_corruption():
    import numpy as np
    import pytest as _pytest

    from mldag_spark.operators.multimodal import (
        _png_parse_gray,
        png_encode_gray,
    )

    good = png_encode_gray(np.full((4, 4), 9, dtype=np.uint8))
    for bad in (
        b"",                        # empty
        b"not a png at all",        # wrong signature
        good[:20],                  # truncated mid-IHDR
        good[:-6],                  # truncated before IEND CRC
        good[:30] + bytes([good[30] ^ 0xFF]) + good[31:],  # CRC flip
    ):
        with _pytest.raises(ValueError):
            _png_parse_gray(bad)


def test_image_decode_stats_and_corrupt_rows(spark):
    import numpy as np

    from mldag_spark.operators.multimodal import (
        decode_image_stats,
        png_encode_gray,
        synthesize_png,
    )

    # constant-byte text → every pixel == that byte; multibyte + NULL
    # text pin the byte-length convention end to end
    data = [(1, "aaaa"), (2, "日本語"), (3, None)]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    out = {
        r["media_id"]: r
        for r in decode_image_stats(
            synthesize_png(docs, "doc_id", "text"), engine="stdlib"
        ).collect()
    }
    for did, text in data:
        n = len((text or "").encode("utf-8"))
        r = out[did]
        assert r["ok"] and (r["width"], r["height"]) == (
            n % 64 + 16, n % 48 + 16
        )
        assert r["n_pixels"] == r["width"] * r["height"]
    assert out[1]["px_mean"] == float(ord("a"))
    assert out[1]["px_min"] == out[1]["px_max"] == ord("a")
    # brute pixel stats for the multibyte doc: bytes tiled cyclically
    raw = "日本語".encode("utf-8")
    w, h = len(raw) % 64 + 16, len(raw) % 48 + 16
    tiled = np.frombuffer(raw, dtype=np.uint8)[
        np.arange(w * h) % len(raw)
    ]
    assert out[2]["px_mean"] == float(tiled.mean())
    assert out[2]["px_min"] == int(tiled.min())
    assert out[2]["px_max"] == int(tiled.max())

    # corrupt payloads surface as ok=false rows, never task failures
    good = png_encode_gray(np.full((3, 3), 5, dtype=np.uint8))
    media = spark.createDataFrame(
        [(10, bytearray(good)), (11, bytearray(good[:-8])),
         (12, bytearray(b"junk")), (13, None)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r["ok"]
        for r in decode_image_stats(media, engine="stdlib").collect()
    }
    assert rows == {10: True, 11: False, 12: False, 13: False}


def test_image_decode_pil_path_agrees_where_available(spark):
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("PIL") is None:
        with _pytest.raises(ImportError):
            from mldag_spark.operators.multimodal import decode_image_stats

            decode_image_stats(
                spark.createDataFrame(
                    [(1, bytearray(b""))], "media_id long, payload binary"
                ),
                engine="pil",
            )
        _pytest.skip("PIL not installed; guarded path verified to raise")
    import numpy as np

    from mldag_spark.operators.multimodal import (
        decode_image_stats,
        png_encode_gray,
    )

    rng = np.random.RandomState(5)
    media = spark.createDataFrame(
        [
            (i, bytearray(png_encode_gray(
                rng.randint(0, 256, size=(9, 11), dtype=np.uint8)
            )))
            for i in range(4)
        ],
        "media_id long, payload binary",
    )
    a = sorted(map(tuple, decode_image_stats(media, engine="stdlib").collect()))
    b = sorted(map(tuple, decode_image_stats(media, engine="pil").collect()))
    assert a == b


# ---------------------------------------------------------------------------
# REAL video codec (r11): YUV4MPEG2 encode + spec-correct parse — the
# last fake multimodal seam closed
# ---------------------------------------------------------------------------
def test_y4m_roundtrip_exact_luma_planes():
    import numpy as np

    from mldag_spark.operators.multimodal import _y4m_parse, y4m_encode

    rng = np.random.RandomState(11)
    fr = rng.randint(0, 256, size=(6, 18, 32), dtype=np.uint8)
    w, h, fps, frames = _y4m_parse(y4m_encode(fr, fps=(30, 1)))
    assert (w, h, fps, len(frames)) == (32, 18, (30, 1), 6)
    for i in range(6):
        assert np.array_equal(frames[i], fr[i])


def test_y4m_parser_is_spec_correct_on_foreign_streams():
    # a stream NOT written by our encoder: extra stream tags
    # (interlacing, aspect, X extension), a C420mpeg2 chroma variant,
    # and per-frame FRAME parameters — all legal YUV4MPEG2 the parser
    # must accept; plus the malformed shapes it must reject
    import pytest as _pytest

    from mldag_spark.operators.multimodal import _y4m_parse

    y = bytes(range(8))      # 4x2 luma
    c = bytes([3, 5])        # 2x1 chroma planes
    hdr = (
        b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420mpeg2 XCOLORRANGE=FULL\x0a"
    )
    w, h, fps, frames = _y4m_parse(
        hdr + b"FRAME Xmeta=1\x0a" + y + c + c + b"FRAME\x0a" + y + c + c
    )
    assert (w, h, fps, len(frames)) == (4, 2, (25, 1), 2)
    assert frames[0].tolist() == [[0, 1, 2, 3], [4, 5, 6, 7]]
    # C tag absent → spec default 420jpeg, still accepted
    assert _y4m_parse(
        b"YUV4MPEG2 W4 H2 F25:1\x0a" + b"FRAME\x0a" + y + c + c
    )[3][0].shape == (2, 4)
    for bad in (
        b"",                                        # empty
        b"JUNKMPEG2 W4 H2 F25:1\x0a",               # wrong magic
        b"YUV4MPEG2 W4 H2\x0a" + b"FRAME\x0a" + y + c + c,   # no F tag
        b"YUV4MPEG2 W5 H2 F25:1\x0a",               # odd width for 420
        b"YUV4MPEG2 W4 H2 F25:1 C444\x0a" + y * 3,  # unsupported chroma
        hdr + b"FRAME\x0a" + y + c,                 # truncated frame
        hdr + b"FRAME\x0a" + y + c + c + b"zz",     # trailing garbage
        hdr + b"FRAMX\x0a" + y + c + c,             # bad frame marker
        hdr,                                        # zero frames
    ):
        with _pytest.raises(ValueError):
            _y4m_parse(bad)


def test_y4m_chroma_is_real_2x2_subsample():
    # the encoder's U/V planes must be the true 2x2 integer block mean
    # of the luma, not filler — decode the raw plane bytes directly
    import numpy as np

    from mldag_spark.operators.multimodal import y4m_encode

    fr = np.arange(8 * 6, dtype=np.uint8).reshape(1, 6, 8)
    data = y4m_encode(fr)
    body = data.split(b"FRAME\x0a", 1)[1]
    yplane = np.frombuffer(body[:48], dtype=np.uint8).reshape(6, 8)
    u = np.frombuffer(body[48:60], dtype=np.uint8).reshape(3, 4)
    v = np.frombuffer(body[60:72], dtype=np.uint8).reshape(3, 4)
    expect = (
        yplane.reshape(3, 2, 4, 2).astype(int).sum(axis=(1, 3)) // 4
    ).astype(np.uint8)
    assert np.array_equal(u, expect) and np.array_equal(v, expect)


def test_video_decode_stats_sampling_and_corrupt_rows(spark):
    import numpy as np

    from mldag_spark.operators.multimodal import (
        decode_video_stats,
        synthesize_y4m,
        y4m_encode,
    )

    # constant-byte, multibyte, and NULL text pin the byte-length
    # convention; brute-force the sampled luma stats with numpy
    data = [(1, "aaaa"), (2, "日本語"), (3, None)]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    for k in (1, 2, 3):
        out = {
            r["media_id"]: r
            for r in decode_video_stats(
                synthesize_y4m(docs, "doc_id", "text"), sample_every=k
            ).collect()
        }
        for did, text in data:
            raw = (text or "").encode("utf-8")
            n = len(raw)
            w, h, nf = 2 * (n % 24) + 16, 2 * (n % 18) + 16, n % 6 + 2
            r = out[did]
            assert r["ok"] and (
                r["width"], r["height"], r["n_frames"], r["n_pixels"],
            ) == (w, h, nf, w * h * nf)
            assert r["sampled_frames"] == (nf + k - 1) // k
            src = np.frombuffer(raw or b"\x80", dtype=np.uint8)
            sampled = np.stack([
                src[(np.arange(w * h) + f) % len(src)]
                for f in range(0, nf, k)
            ]).astype(np.float64)
            assert r["y_mean"] == float(sampled.mean())
            assert r["y_min"] == int(sampled.min())
            assert r["y_max"] == int(sampled.max())

    # corrupt payloads surface as ok=false rows, never task failures
    good = y4m_encode(np.full((2, 4, 4), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        [(10, bytearray(good)), (11, bytearray(good[:-3])),
         (12, bytearray(b"junk")), (13, None)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r["ok"]
        for r in decode_video_stats(media).collect()
    }
    assert rows == {10: True, 11: False, 12: False, 13: False}


def test_resize_default_engine_is_native_deterministic(spark):
    """ADVICE r12 #2: the default engine must be the deterministic
    stdlib path — output bytes must not depend on whether pillow
    happens to be installed. PIL/auto are explicit opt-ins."""
    from mldag_spark.operators.multimodal import (
        resize_media,
        synthesize_png,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 150), (2, "y" * 90)], "doc_id long, text string"
    )
    media = synthesize_png(docs, "doc_id", "text").select(
        "media_id",
        F.lit("image/png").alias("mime"),
        "payload",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
    )
    default = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(media, max_px=32).collect()
    }
    native = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(media, max_px=32, engine="native").collect()
    }
    assert default == native


def test_fitted_featurizer_matches_numpy_and_partitioning(spark):
    """r13 (VERDICT r12 #4): engine='fitted' = native signal features
    projected through a corpus-fitted PCA. Pins: (a) row values equal
    the numpy replay (native features -> centered projection on the
    pca_fit model); (b) the output is identical under a different
    partitioning; (c) corrupt payloads stay ok=false with null
    features."""
    import numpy as np

    from mldag_spark.operators.multimodal import (
        _native_features,
        extract_features,
        synthesize_png,
    )
    from mldag_spark.operators.similarity import pca_fit

    docs = spark.createDataFrame(
        [(i, "word%d " % i * (i + 3)) for i in range(40)],
        "doc_id long, text string",
    )
    media = synthesize_png(docs, "doc_id", "text").select(
        "media_id", F.lit("image/png").alias("mime"), "payload"
    )
    # poison one payload: must surface as ok=false/null, not a crash
    media = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 7, F.lit(b"not a png")).otherwise(
            F.col("payload")
        ),
    )
    out = {
        r["media_id"]: r
        for r in extract_features(media, dim=4, engine="fitted").collect()
    }
    assert out[7]["ok"] is False and out[7]["features"] is None
    assert all(
        len(out[i]["features"]) == 4 for i in out if i != 7
    )

    # numpy replay: native features of each payload, centered
    # projection through the same fitted model
    native = extract_features(media, dim=16, engine="native")
    mean, V, _w = pca_fit(
        native.filter("ok"), vec_col="features", r=4
    )
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    for mid, p in payloads.items():
        if mid == 7:
            continue
        f = np.array(_native_features(p, 16), dtype=np.float64)
        ref = np.round((f - mean) @ V, 6)
        assert np.allclose(out[mid]["features"], ref, atol=1e-6), mid

    # partition invariance
    out2 = {
        r["media_id"]: r["features"]
        for r in extract_features(
            media.repartition(7), dim=4, engine="fitted"
        ).collect()
    }
    for mid in out:
        if mid == 7:
            assert out2[mid] is None
        else:
            assert out[mid]["features"] == out2[mid]


def test_fitted_featurizer_names_the_cause_when_nothing_decodes(spark):
    """code-review r13 #2: a corpus whose payloads all fail the native
    decoders must produce a clear fitted-engine error naming the
    cause, not pca_fit's opaque 'empty PCA fit input'."""
    import pytest

    from mldag_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(b"not a png")),
         (2, "image/png", bytearray(b"junk"))],
        "media_id long, mime string, payload binary",
    )
    with pytest.raises(ValueError, match="no decodable payloads"):
        extract_features(media, dim=4, engine="fitted")


def test_fitted_featurizer_artifact_roundtrip(tmp_path, spark):
    """The production path: write the native feature table once, pass
    it back as `native=` — identical output to the self-computed
    path, decode paid once (the PQ codes= / IVF assigned= artifact
    convention)."""
    from mldag_spark.operators.multimodal import (
        extract_features,
        extract_features_fitted,
        synthesize_png,
    )

    docs = spark.createDataFrame(
        [(i, "tok%d " % i * (i + 4)) for i in range(25)],
        "doc_id long, text string",
    )
    media = synthesize_png(docs, "doc_id", "text").select(
        "media_id", F.lit("image/png").alias("mime"), "payload"
    )
    inline = {
        r["media_id"]: r["features"]
        for r in extract_features(media, dim=4, engine="fitted").collect()
    }
    path = str(tmp_path / "native_feats")
    extract_features(media, dim=16, engine="native").write.parquet(path)
    art = {
        r["media_id"]: r["features"]
        for r in extract_features_fitted(
            media, dim=4, native=spark.read.parquet(path)
        ).collect()
    }
    assert inline == art


def test_fitted_featurizer_rejects_inconsistent_artifact(tmp_path, spark):
    """ADVICE r13 #5: an artifact with INCONSISTENT feature widths
    (e.g. a union of two runs at different native_dim) must be a
    clear ValueError at validation time, not an opaque numpy shape
    error inside pca_fit — the min/max aggregate checks every ok row,
    not just the first."""
    import pytest

    from mldag_spark.operators.multimodal import (
        extract_features,
        extract_features_fitted,
        synthesize_png,
    )

    docs = spark.createDataFrame(
        [(i, "tok%d " % i * (i + 4)) for i in range(12)],
        "doc_id long, text string",
    )
    media = synthesize_png(docs, "doc_id", "text").select(
        "media_id", F.lit("image/png").alias("mime"), "payload"
    )
    a = str(tmp_path / "nf16")
    b = str(tmp_path / "nf8")
    extract_features(media, dim=16, engine="native").write.parquet(a)
    extract_features(
        media.withColumn("media_id", F.col("media_id") + 1000),
        dim=8, engine="native",
    ).write.parquet(b)
    mixed = spark.read.parquet(a).unionByName(spark.read.parquet(b))
    # expect 16: the 8-wide half is the mismatch, named precisely
    with pytest.raises(ValueError, match="vectors of dim 8, expected 16"):
        extract_features_fitted(media, dim=4, native=mixed)
    # expect 32: BOTH halves are wrong -> the range reads inconsistent
    with pytest.raises(ValueError, match="dim 8..16 \\(inconsistent\\)"):
        extract_features_fitted(media, dim=8, native=mixed)
    # a uniformly WRONG width still names the mismatch
    with pytest.raises(ValueError, match="vectors of dim 8"):
        extract_features_fitted(
            media, dim=4, native=spark.read.parquet(b)
        )
