"""Baseline JPEG codec (pelinker_spark.jpeg) — written from the ITU-T
T.81 spec so image payloads decode natively without PIL (reference decodes
media via PIL/torchvision; here the codec itself is from-spec numpy).

The load-bearing property: the entropy layer (zigzag + DC-diff +
run-length + Huffman + byte stuffing) is LOSSLESS — decode(encode(img))
must be BIT-identical to the numpy-simulated quantization pipeline
(dct -> quant -> dequant -> idct -> clip). Quantization loss is bounded
separately.
"""

from __future__ import annotations

import numpy as np
import pytest

from pelinker_spark.jpeg import (
    _quantized_blocks,
    _reconstruct,
    _scale_qt,
    QT_CHR,
    QT_LUM,
    decode_jpeg,
    encode_jpeg,
)


def _simulate_quant_pipeline(img: np.ndarray, quality: int) -> np.ndarray:
    """The exact lossy part of the codec, in plain numpy: what decode
    must reproduce bit-for-bit if the entropy layer is lossless."""
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]
    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHR, quality)]
    h, w = img.shape[:2]
    sim = []
    for i, p in enumerate(planes):
        qt = qts[0 if i == 0 else 1]
        sim.append(
            _reconstruct(_quantized_blocks(p, qt), qt, h, w).astype(np.float64)
        )
    sy, scb, scr = sim
    sr = sy + 1.402 * (scr - 128.0)
    sg = sy - 0.344136 * (scb - 128.0) - 0.714136 * (scr - 128.0)
    sb = sy + 1.772 * (scb - 128.0)
    return np.clip(np.round(np.stack([sr, sg, sb], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _synth_img(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 9 + yy * 3) % 256, (xx * 2 + yy * 11) % 256, ((xx + yy) * 5) % 256],
        axis=-1,
    ).astype(np.int32)
    return np.clip(img + rng.integers(-6, 7, img.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [50, 75, 90, 95])
@pytest.mark.parametrize("hw", [(8, 8), (16, 24), (40, 16)])
def test_entropy_layer_lossless(quality, hw):
    img = _synth_img(*hw, seed=quality)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    assert np.array_equal(out, _simulate_quant_pipeline(img, quality))


def test_entropy_layer_lossless_pure_noise():
    """Uniform noise maximizes AC coefficient activity (every run-length
    and magnitude category path); entropy layer must stay bit-exact."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=97))
    assert np.array_equal(out, _simulate_quant_pipeline(img, 97))


def test_flat_image_near_exact():
    flat = np.full((8, 16, 3), 200, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=95))
    assert np.abs(out.astype(np.int32) - 200).max() <= 3


def test_quantization_loss_bounded():
    img = _synth_img(16, 16, seed=7)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(out.astype(np.int32) - img.astype(np.int32))
    assert err.mean() < 8.0 and err.max() < 48


def test_rejects_unsupported():
    img = _synth_img(8, 8, seed=1)
    with pytest.raises(ValueError):
        encode_jpeg(img[:7])  # not a multiple of 8
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # progressive (SOF2) stays gated
    payload = bytearray(encode_jpeg(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_decode_real_jpeg_grayscale_contract():
    """multimodal._decode_real routes image/jpeg through the codec and
    emits the (1, H, W) [0,1] grayscale frame contract every other image
    format follows."""
    from pelinker_spark.multimodal import _decode_real

    img = _synth_img(16, 8, seed=3)
    arr = _decode_real(encode_jpeg(img, quality=90), "image/jpeg")
    assert arr.shape == (1, 16, 8)
    assert arr.dtype == np.float32
    assert 0.0 <= arr.min() and arr.max() <= 1.0
    expected = (
        _simulate_quant_pipeline(img, 90).astype(np.float32) / 255.0
    ).mean(axis=2)
    assert np.allclose(arr[0], expected, atol=1e-6)


def test_synth_media_emits_real_jpeg(spark):
    """synth_media now cycles PPM/PNG/JPEG; JPEG rows carry genuinely
    encoded baseline JFIF bytes whose decoded dims match the metadata."""
    from pelinker_spark.multimodal import _decode_real, synth_media

    pdf = (
        synth_media(spark, 200, seed=42)
        .where("mime = 'image/jpeg'")
        .toPandas()
    )
    assert len(pdf) > 0
    for _, row in pdf.iterrows():
        payload = bytes(row["payload"])
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        arr = _decode_real(payload, row["mime"])
        assert arr.shape == (1, row["height"], row["width"])


def test_avi_mjpeg_roundtrip():
    """MJPEG-in-AVI: the container walk recovers every frame, each
    bit-identical to a standalone decode of its JPEG payload."""
    from pelinker_spark.multimodal import _decode_avi_mjpeg, encode_avi_mjpeg

    frames = [_synth_img(16, 8, seed=s) for s in range(4)]
    payload = encode_avi_mjpeg(frames, fps=10, quality=90)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    arr = _decode_avi_mjpeg(payload)
    assert arr.shape == (4, 16, 8)
    for i, f in enumerate(frames):
        expected = (
            _simulate_quant_pipeline(f, 90).astype(np.float32) / 255.0
        ).mean(axis=2)
        assert np.allclose(arr[i], expected, atol=1e-6), i


def test_avi_gates():
    from pelinker_spark.multimodal import (
        _decode_avi_mjpeg,
        _decode_real,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError):
        _decode_avi_mjpeg(b"RIFFxxxxWAVE")  # not an AVI
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])
    # a non-JPEG video chunk (inter-frame codec) stays gated
    payload = bytearray(encode_avi_mjpeg([_synth_img(8, 8, seed=0)]))
    pos = payload.find(b"00dc") + 8
    payload[pos : pos + 2] = b"\x00\x00"  # clobber the SOI marker
    with pytest.raises(NotImplementedError):
        _decode_avi_mjpeg(bytes(payload))
    # mime routing via _decode_real
    arr = _decode_real(
        encode_avi_mjpeg([_synth_img(8, 16, seed=1)] * 2), "video/x-msvideo"
    )
    assert arr.shape == (2, 8, 16)


def test_synth_media_emits_real_avi(spark):
    """Half the video rows now carry genuinely encoded MJPEG-AVI whose
    decoded frame count and dims match the row metadata."""
    from pelinker_spark.multimodal import _decode_real, synth_media

    pdf = (
        synth_media(spark, 300, seed=42)
        .where("mime = 'video/x-msvideo'")
        .toPandas()
    )
    assert len(pdf) > 0
    for _, row in pdf.iterrows():
        arr = _decode_real(bytes(row["payload"]), row["mime"])
        n, h, w = arr.shape
        assert (h, w) == (row["height"], row["width"])
        assert row["duration_ms"] == n * 100  # 10 fps
