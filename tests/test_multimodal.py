"""Multimodal plumbing: binary columns through actor-pool decode stubs."""

from __future__ import annotations

import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_image_decode_stub_schema_and_determinism(ray_session):
    from pyreshaper_ray.stages.multimodal import decode_documents_as_images

    out = decode_documents_as_images(SF, batch_size=64).to_pandas()
    assert set(out.columns) == {"doc_id", "width", "height", "n_bytes", "features"}
    assert len(out) == 500
    assert (out["width"] == out["n_bytes"] % 640).all()
    assert (out["height"] == (out["n_bytes"] * 7) % 480).all()
    # features: fixed-dim list<float>, rows normalized (sum ≈ 1 for nonempty)
    f0 = out["features"].iloc[0]
    assert len(f0) == 8
    assert abs(sum(f0) - 1.0) < 1e-5
    # determinism across runs
    again = decode_documents_as_images(SF, batch_size=64).to_pandas()
    assert out.drop(columns=["features"]).equals(again.drop(columns=["features"]))


def test_audio_decode_stub(ray_session):
    from pyreshaper_ray.stages.multimodal import decode_documents_as_audio

    out = decode_documents_as_audio(SF, batch_size=64).to_pandas()
    assert set(out.columns) == {"doc_id", "n_samples", "duration_ms", "n_frames"}
    assert (out["duration_ms"] == out["n_samples"] * 1000 // 16000).all()
    nz = out[out["n_samples"] > 0]
    assert (nz["n_frames"] == (nz["n_samples"] - 1) // 512 + 1).all()


def test_binary_column_roundtrip(ray_session):
    """The binary payload column survives Arrow batch boundaries intact."""
    import ray.data

    from pyreshaper_ray.stages.multimodal import synthesize_binary_column

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    with_bin = ds.map_batches(
        synthesize_binary_column, batch_format="pyarrow", batch_size=32
    )
    from pyreshaper_ray.util import collect_table

    t = collect_table(with_bin)
    assert t.schema.field("payload").type == pa.binary()
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for i in range(0, t.num_rows, 97):
        did = t["doc_id"][i].as_py()
        assert t["payload"][i].as_py() == texts[did].encode("utf-8")


def test_image_backend_flag(ray_session):
    """backend='pil' must fail loudly when PIL is absent; 'auto' falls back
    to the REAL stdlib header parser; a full deployment flips one
    constructor arg."""
    import pytest
    from pyreshaper_ray.stages.multimodal import PIL_AVAILABLE, ImageDecodeStage

    auto = ImageDecodeStage(backend="auto")
    assert auto.backend == ("pil" if PIL_AVAILABLE else "headers")
    if not PIL_AVAILABLE:
        with pytest.raises(ImportError, match="pil"):
            ImageDecodeStage(backend="pil")


def test_audio_wave_backend_real_decode(ray_session):
    """The 'wave' backend does a REAL RIFF/WAV parse (stdlib): sample count
    and rate come from the container header, not the stub heuristic."""
    import io
    import wave

    import pyarrow as pa

    from pyreshaper_ray.stages.multimodal import AudioSegmentStage

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 4000)  # 4000 frames @ 8 kHz = 500 ms
    payload = buf.getvalue()

    stage = AudioSegmentStage(frame_hop=512, backend="wave")
    out = stage(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    assert out["n_samples"][0].as_py() == 4000
    assert out["duration_ms"][0].as_py() == 500
    assert out["n_frames"][0].as_py() == 8

    # stub backend on the same payload uses the heuristic instead
    stub = AudioSegmentStage(frame_hop=512, backend="stub")(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
            }
        )
    )
    assert stub["n_samples"][0].as_py() == len(payload) // 2


def _minimal_png(w: int, h: int) -> bytes:
    """A complete, valid PNG (8-bit grayscale, zlib IDAT, CRCs) built from
    stdlib only — genuine container bytes, not a mock."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _minimal_bmp(w: int, h: int, top_down: bool = False) -> bytes:
    import struct

    row = (w * 3 + 3) & ~3  # 24bpp rows padded to 4 bytes
    pixels = bytes(row * h)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def _minimal_jpeg(w, h):
    """Smallest JPEG prefix with APP0 + a baseline SOF0: enough for the
    marker-scan header parse (no entropy-coded data needed)."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x01\x01" + b"\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    sof = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x01"
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_image_headers_backend_real_bytes(ray_session):
    """The REAL image path runs in this container: genuine PNG/BMP/GIF bytes
    through the actor-pool stage with backend='headers' (and 'auto', which
    resolves to it while PIL is absent)."""
    import ray.data

    from pyreshaper_ray.stages.multimodal import (
        PIL_AVAILABLE,
        ImageDecodeStage,
        _decode_image_headers,
    )

    png = _minimal_png(31, 17)
    bmp = _minimal_bmp(12, 9)
    bmp_td = _minimal_bmp(5, 7, top_down=True)
    gif = b"GIF89a" + (44).to_bytes(2, "little") + (33).to_bytes(2, "little") + b"\x00" * 6
    jpg = _minimal_jpeg(63, 41)

    assert _decode_image_headers(png)[:2] == (31, 17)
    assert _decode_image_headers(bmp)[:2] == (12, 9)
    assert _decode_image_headers(bmp_td)[:2] == (5, 7)
    assert _decode_image_headers(gif)[:2] == (44, 33)
    assert _decode_image_headers(jpg)[:2] == (63, 41)
    # JPEG with no SOF before start-of-scan is rejected, not mis-parsed
    bad_jpg = b"\xff\xd8" + b"\xff\xda" + b"\x00\x04" + b"\x00" * 8
    try:
        _decode_image_headers(bad_jpg)
        raise AssertionError("expected ValueError on SOF-less JPEG")
    except ValueError:
        pass
    try:
        _decode_image_headers(b"plain text payload")
        raise AssertionError("expected ValueError on non-image bytes")
    except ValueError:
        pass

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "payload": pa.array([png, bmp, bmp_td, gif, jpg], pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(batch)
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"backend": "auto"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .take_all()
    )
    dims = {r["doc_id"]: (r["width"], r["height"], r["n_bytes"]) for r in out}
    assert dims[1] == (31, 17, len(png))
    assert dims[2] == (12, 9, len(bmp))
    assert dims[3] == (5, 7, len(bmp_td))
    assert dims[4] == (44, 33, len(gif))
    assert dims[5] == (63, 41, len(jpg))
    if not PIL_AVAILABLE:
        assert ImageDecodeStage(backend="auto").backend == "headers"


def _minimal_avi(us_per_frame: int, n_frames: int, w: int, h: int) -> bytes:
    import struct

    avih = struct.pack(
        "<10I", us_per_frame, 0, 0, 0, n_frames, 0, 1, 0, w, h
    ) + b"\x00" * 16
    body = b"AVI LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrlavih"
    body += struct.pack("<I", len(avih)) + avih
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_video_frame_sample_riff_real_bytes(ray_session):
    """The REAL video path runs in this container: a genuine RIFF-AVI main
    header through the actor-pool probe with backend='riff'."""
    import ray.data

    from pyreshaper_ray.stages.multimodal import VideoFrameSampleStage, _parse_avi_header

    avi = _minimal_avi(us_per_frame=40_000, n_frames=25, w=320, h=240)
    assert _parse_avi_header(avi) == (40_000, 25, 320, 240)
    try:
        _parse_avi_header(b"not a riff payload at all")
        raise AssertionError("expected ValueError on non-AVI bytes")
    except ValueError:
        pass

    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([avi], pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(batch)
        .map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"backend": "riff", "frame_hop": 8},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert out[0]["width"] == 320 and out[0]["height"] == 240
    assert out[0]["n_frames"] == 25
    assert out[0]["duration_ms"] == 25 * 40_000 // 1000
    assert out[0]["sampled_idx"] == [0, 8, 16, 24]
    assert out[0]["n_sampled"] == 4


def test_video_frame_sample_stub_pipeline(ray_session):
    """Stub probe over the documents table: deterministic metadata, hop
    sampling invariants (first index 0, stride = hop, count = ceil(nf/hop))."""
    from pyreshaper_ray.stages.multimodal import sample_documents_as_video

    rows = sample_documents_as_video(SF, batch_size=64).take_all()
    assert rows
    for r in rows[:50]:
        nf, hop = r["n_frames"], 8
        assert r["n_sampled"] == (nf + hop - 1) // hop
        assert r["sampled_idx"] == list(range(0, nf, hop))
        assert r["duration_ms"] == nf * 40


def test_audio_features_square_wave_wav(ray_session):
    """Genuine WAV bytes: a ±1000 square wave has RMS exactly 1000 and a
    known crossing count; silence has RMS 0."""
    import io
    import wave

    import numpy as np
    import ray.data

    from pyreshaper_ray.stages.multimodal import AudioFeatureStage

    def wav_bytes(samples: np.ndarray) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()

    # 8 samples alternating in PAIRS: ++--++-- -> 3 sign flips
    sq = np.array([1000, 1000, -1000, -1000, 1000, 1000, -1000, -1000])
    silence = np.zeros(16, dtype=np.int64)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([wav_bytes(sq), wav_bytes(silence)], pa.binary()),
    })
    stage = AudioFeatureStage(backend="wave")
    out = stage(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_samples"] == 8
    assert out.loc[1, "rms"] == 1000
    assert out.loc[1, "zero_crossings"] == 3
    assert out.loc[2, "rms"] == 0 and out.loc[2, "zero_crossings"] == 0


def test_audio_features_pcm_backend_distributed(ray_session):
    import ray.data

    from pyreshaper_ray.stages.multimodal import AudioFeatureStage

    import numpy as np

    raw = np.array([300, -300, 300, -300], dtype="<i2").tobytes()
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "payload": pa.array([raw + b"x"], pa.binary()),  # odd byte dropped
    })
    out = (
        ray.data.from_arrow(t)
        .map_batches(AudioFeatureStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out["n_samples"].tolist() == [4]
    assert out["rms"].tolist() == [300]
    assert out["zero_crossings"].tolist() == [3]


def test_synthesized_png_is_spec_valid_and_header_parsed(ray_session):
    """The planted PNGs behind image_header_census are COMPLETE valid files
    (chunk CRCs check out, IDAT inflates to exactly h·(w+1) filter+pixel
    bytes), and the real header backend reads back the planted dims."""
    import struct
    import zlib

    from pyreshaper_ray.stages.multimodal import (
        _decode_image_headers,
        synthesize_png_column,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "n_chars": pa.array([0, 157, 4095], pa.int64()),
        }
    )
    out = synthesize_png_column(t)
    for doc_id, n, payload in zip(
        out["doc_id"].to_pylist(),
        t["n_chars"].to_pylist(),
        out["payload"].to_pylist(),
    ):
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        i, chunks = 8, {}
        while i < len(payload):
            ln = struct.unpack(">I", payload[i : i + 4])[0]
            tag = payload[i + 4 : i + 8]
            body = payload[i + 8 : i + 8 + ln]
            crc = struct.unpack(">I", payload[i + 8 + ln : i + 12 + ln])[0]
            assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), tag
            chunks[tag] = body
            i += 12 + ln
        w, h = n % 64 + 1, n * 7 % 48 + 1
        assert struct.unpack(">II", chunks[b"IHDR"][:8]) == (w, h)
        assert len(zlib.decompress(chunks[b"IDAT"])) == h * (w + 1)
        assert b"IEND" in chunks
        assert _decode_image_headers(payload)[:2] == (w, h)


def test_synthesized_wav_roundtrips_through_stdlib_wave(ray_session):
    import io
    import wave

    from pyreshaper_ray.stages.multimodal import synthesize_wav_column

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "n_chars": pa.array([999, 1000], pa.int64()),
        }
    )
    out = synthesize_wav_column(t)
    for n, payload in zip(t["n_chars"].to_pylist(), out["payload"].to_pylist()):
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getnframes() == n % 1000 + 1
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
