"""Real-codec primitives: BMP/WAV encode-decode roundtrips, padding and
row-order handling, RIFF chunk walking, nearest-neighbor mapping. These
are the pytest halves of the closed-form SQL oracles in
multimodal_codec.py."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crest_spark.operators.multimodal_codec import (
    decode_bmp,
    encode_bmp,
    encode_wav,
    parse_wav,
    resize_nearest,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    # widths chosen to exercise every padding remainder (3w % 4)
    for w, h in ((1, 1), (2, 3), (3, 2), (4, 4), (17, 9), (30, 24)):
        raster = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(raster))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, raster)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_bmp_row_order_is_top_down():
    # top row red, bottom row blue: the decoder must undo BMP's
    # bottom-up storage, not just reshape
    raster = np.zeros((2, 2, 3), np.uint8)
    raster[0, :, 2] = 255  # top row: R channel
    raster[1, :, 0] = 255  # bottom row: B channel
    out = decode_bmp(encode_bmp(raster))
    assert out[0, 0, 2] == 255 and out[0, 0, 0] == 0
    assert out[1, 0, 0] == 255 and out[1, 0, 2] == 0


def test_wav_roundtrip_and_chunk_walk():
    samples = (np.arange(100, dtype=np.int64) * 331 % 65536 - 32768).astype(
        np.int16
    )
    payload = encode_wav(samples, sample_rate=8000)
    sr, ch, bits, data = parse_wav(payload)
    assert (sr, ch, bits) == (8000, 1, 16)
    assert np.array_equal(np.frombuffer(data, np.int16), samples)

    # real encoders emit extra chunks (LIST/INFO) between fmt and data —
    # the walker must skip them, including odd-size word alignment
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad byte
    riff_body = payload[12:]
    fmt_chunk = riff_body[: 8 + 16]
    rest = riff_body[8 + 16 :]
    patched_body = fmt_chunk + extra + rest
    patched = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(patched_body), b"WAVE")
        + patched_body
    )
    sr2, _, _, data2 = parse_wav(patched)
    assert sr2 == 8000 and np.array_equal(
        np.frombuffer(data2, np.int16), samples
    )


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        parse_wav(b"OggS" + b"\x00" * 64)


def test_resize_nearest_known_mapping():
    # 4x2 -> 2x1: target (tx, ty) samples source (tx*4//2, ty*2//1)
    src = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(src, 2, 1)
    assert out.shape == (1, 2, 3)
    assert np.array_equal(out[0, 0], src[0, 0])
    assert np.array_equal(out[0, 1], src[0, 2])


def test_y4m_parser_contracts():
    """Real-format behaviors: header tags are order-independent, unknown
    tags skip, the colorspace default (C420) and any non-C444 stream are
    rejected, and a corrupt FRAME marker raises."""
    import numpy as np
    import pytest

    from crest_spark.operators.multimodal_codec import (
        _vid_geom,
        encode_y4m,
        parse_y4m,
    )

    payload = encode_y4m(123)
    w, h, n = _vid_geom(123)
    frames = list(parse_y4m(payload))
    assert len(frames) == n
    f0, Y, U, V = frames[0]
    assert f0 == 0 and Y.shape == (h, w) == U.shape == V.shape
    # closed-form spot check: Y[y=1][x=2] of frame 3
    _, Y3, _, _ = frames[3]
    assert Y3[1][2] == (123 + 7 * 3 + 2 * 2 + 3 * 1) % 256

    # reordered/extended header still parses
    reordered = (
        b"YUV4MPEG2 C444 XWEIRD H2 W3 F30:1\n"
        + b"FRAME\n"
        + bytes(range(6)) * 3
    )
    (idx, y, u, v), = list(parse_y4m(reordered))
    assert y.shape == (2, 3)

    with pytest.raises(ValueError, match="C420"):
        list(parse_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n" + b"\0" * 12))
    with pytest.raises(ValueError, match="FRAME"):
        list(parse_y4m(b"YUV4MPEG2 W1 H1 C444\nGRAME\n" + b"\0" * 3))


# --------------------------------------------------------------------- PNG
def test_png_roundtrip_all_filters():
    """The cycling filter schedule guarantees every image >= 5 rows
    exercises all five PNG filter types; reconstruction must be exact
    (filters chain on reconstructed bytes, so one wrong byte cascades)."""
    import numpy as np

    from crest_spark.operators.multimodal_codec import (
        _raster,
        decode_png,
        encode_png,
    )

    for doc_id in (0, 7, 31, 123, 499):
        rgb = _raster(doc_id)[:, :, ::-1]
        rast, ctype, n_chunks, fsum = decode_png(encode_png(rgb))
        assert np.array_equal(rast, rgb)
        assert ctype == 2 and n_chunks == 4
        assert fsum == sum(y % 5 for y in range(rgb.shape[0]))


def test_png_chunk_crc_validated():
    import pytest

    from crest_spark.operators.multimodal_codec import (
        _raster,
        decode_png,
        encode_png,
    )

    payload = bytearray(encode_png(_raster(5)[:, :, ::-1]))
    payload[60] ^= 0xFF  # corrupt one IDAT byte
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 32)


def test_docs_ids_spread_parallelizes_without_changing_rows(spark):
    """r14: ``_docs_ids(spread=True)`` hash-repartitions the key
    relation up to core count so per-row Python decode parallelizes
    past a single-file scan — rows must be untouched and the spread
    must actually widen the single-partition input."""
    from crest_spark.operators.multimodal_codec import _docs_ids

    sf = "/root/testdata/sf0.001"
    plain = _docs_ids(spark, sf)
    spread = _docs_ids(spark, sf, spread=True)
    assert plain.rdd.getNumPartitions() == 1
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert sorted(r["doc_id"] for r in spread.collect()) == sorted(
        r["doc_id"] for r in plain.collect()
    )
