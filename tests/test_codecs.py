"""Real in-sandbox media codecs (stages/multimodal.py): the stdlib PNG
decoder (all five filter types, gray/RGB/RGBA/gray+alpha) and the stdlib
WAV decode, plus the per-row backend degradation in the actor stages."""

from __future__ import annotations

import json

import numpy as np
import pytest

from pdf_parser_ray.stages import multimodal as mm


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_colors(filter_type, nch):
    rng = np.random.RandomState(filter_type * 10 + nch)
    arr = rng.randint(0, 256, (11, 7, nch), np.uint8)
    data = mm.png_encode(arr, filter_type=filter_type)
    assert data[:8] == mm.PNG_MAGIC
    out = mm.png_decode(data)
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_png_decode_rejects_non_png_and_truncation():
    with pytest.raises(ValueError, match="not a PNG"):
        mm.png_decode(b"\x89JPG garbage")
    good = mm.png_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        mm.png_decode(good[:20])  # header only, no IHDR/IDAT parsed


def test_png_gray_2d_input():
    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    out = mm.png_decode(mm.png_encode(arr))
    np.testing.assert_array_equal(out[:, :, 0], arr)


def test_wav_roundtrip_and_rms():
    sr = 800
    x = (np.sin(np.linspace(0, 40, sr * 2)) * 16000).astype(np.int16)
    data = mm.wav_encode(x, sr)
    y, sr_out = mm.wav_decode(data)
    assert sr_out == sr and len(y) == len(x)
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-9)
    feat = mm.audio_rms_feature(y, sr)
    assert len(feat) == mm.FEATURE_DIM
    assert feat[0] > 0 and feat[1] > 0 and feat[2] == 0.0  # 2 s of audio


def test_image_grid_feature_tiny_image_clamps():
    arr = np.full((2, 3, 3), 255, np.uint8)  # smaller than the 4x4 grid
    feat = mm.image_grid_feature(arr)
    assert len(feat) == mm.FEATURE_DIM
    np.testing.assert_allclose(feat, 1.0)


def test_image_actor_mixes_real_and_stub_rows():
    import pyarrow as pa

    arr = np.random.RandomState(3).randint(0, 256, (8, 8, 3), np.uint8)
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([mm.png_encode(arr, filter_type=4),
                             b"\xde\xad\xbe\xef opaque"], pa.binary()),
        "meta": pa.array([json.dumps({"width": 8, "height": 8})] * 2,
                         pa.string()),
    })
    out = mm.ImageFeatures()(batch)
    assert out.column("backend").to_pylist() == ["png", "stub"]
    info = json.loads(out.column("info")[0].as_py())
    assert info["src_w"] == 8 and info["src_h"] == 8 and info["channels"] == 3
    # the real feature is the luminance grid of the decoded pixels
    np.testing.assert_allclose(
        np.array(out.column("feature")[0].as_py()),
        mm.image_grid_feature(arr))


def test_audio_actor_wav_vs_opaque():
    import pyarrow as pa

    x = (np.random.RandomState(5).randn(1600) * 8000).astype(np.int16)
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["audio", "audio"], pa.string()),
        "payload": pa.array([mm.wav_encode(x, 800), b"not audio"],
                            pa.binary()),
        "meta": pa.array([json.dumps({"sample_rate": 800, "seconds": 2})] * 2,
                         pa.string()),
    })
    out = mm.AudioFeatures()(batch)
    assert out.column("backend").to_pylist() == ["wav", "stub"]
    assert json.loads(out.column("info")[0].as_py())["windows"] == 2


def test_avi_roundtrip_and_stride_padding():
    import numpy as np

    from pdf_parser_ray.stages.multimodal import avi_decode, avi_encode

    rng = np.random.RandomState(3)
    # width 8 -> aligned stride; width 7 -> 4-byte padding per row
    for shape in [(12, 6, 8, 3), (3, 5, 7, 3), (1, 2, 2, 3)]:
        frames = rng.randint(0, 256, shape, np.uint8)
        dec, fps = avi_decode(avi_encode(frames, fps=4))
        assert dec.shape == frames.shape
        assert (dec == frames).all()
        assert fps == 4.0


def test_avi_decode_rejects_non_avi_profiles():
    import struct

    import numpy as np
    import pytest as _pytest

    from pdf_parser_ray.stages.multimodal import avi_decode, avi_encode

    with _pytest.raises(ValueError):
        avi_decode(b"not an avi at all")
    with _pytest.raises(ValueError):
        avi_decode(b"RIFF\x00\x00\x00\x00WAVE")  # RIFF but not AVI
    # corrupt the BITMAPINFOHEADER compression field -> rejected profile
    frames = np.zeros((1, 2, 2, 3), np.uint8)
    good = bytearray(avi_encode(frames, fps=1))
    i = good.find(b"strf")
    struct.pack_into("<I", good, i + 8 + 16, 1)  # biCompression = BI_RLE8
    with _pytest.raises(ValueError):
        avi_decode(bytes(good))


def test_video_actor_real_decode_matches_direct_features():
    import json

    import numpy as np

    from pdf_parser_ray.stages.multimodal import (
        VideoFrameSample, avi_encode, image_grid_feature)

    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (9, 6, 8, 3), np.uint8)  # 3 s at 3 fps
    actor = VideoFrameSample()
    vec, info, backend = actor._process_row(avi_encode(frames, fps=3), {})
    assert backend == "avi"
    idx = info["sampled_frames"]
    assert idx == [0, 3, 6]
    expect = np.mean([image_grid_feature(frames[j]) for j in idx], axis=0)
    assert np.allclose(vec, expect)
    assert info["n_frames"] == 9 and info["src_w"] == 8
    json.dumps(info)  # info stays JSON-serializable


def test_avi_audio_stream_listed_first():
    """Review catch: strf must pair with the preceding vids strh, and
    frame chunks must match the VIDEO stream's 2-digit id — an AVI whose
    first stream is audio decodes the same frames."""
    import struct

    import numpy as np

    from pdf_parser_ray.stages.multimodal import avi_decode

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (4, 4, 6, 3), np.uint8)
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    fps = 2

    def chunk(cc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(four, body):
        return chunk(b"LIST", four + body)

    frame_chunks = []
    for i in range(n):
        rows = []
        for y in range(h - 1, -1, -1):
            row = frames[i, y][:, ::-1].tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        # VIDEO is stream 1 here (audio listed first)
        frame_chunks.append(chunk(b"01db", b"".join(rows)))

    avih = struct.pack("<14I", 500000, stride * h * fps, 0, 0x10, n, 0,
                       2, stride * h, w, h, 0, 0, 0, 0)
    auds_strh = (b"auds" + b"\x00" * 4
                 + struct.pack("<IHHIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 16,
                               0, 0)
                 + struct.pack("<I", 2) + struct.pack("<4h", 0, 0, 0, 0))
    wavefmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    vids_strh = (b"vids" + b"DIB "
                 + struct.pack("<IHHIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                               stride * h, 0xFFFFFFFF)
                 + struct.pack("<I", 0)
                 + struct.pack("<4h", 0, 0, w, h))
    vids_strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", auds_strh)
                     + chunk(b"strf", wavefmt))
               + lst(b"strl", chunk(b"strh", vids_strh)
                     + chunk(b"strf", vids_strf)))
    movi = lst(b"movi", chunk(b"00wb", b"\x01\x02\x03\x04")
               + b"".join(frame_chunks))
    blob = chunk(b"RIFF", b"AVI " + hdrl + movi)

    dec, got_fps = avi_decode(blob)
    assert dec.shape == frames.shape
    assert (dec == frames).all()
    assert got_fps == 2.0
