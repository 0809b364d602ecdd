"""Real stdlib container codecs: PNG (struct+zlib) and WAV (RIFF+numpy).

These are the ``decode=real`` paths VERDICT r3 asked for — previously
honest NotImplementedError stubs, now actual encoders/decoders.  The
byte-level unit tests here complement the registered round-trip queries
(q_multimodal_png_roundtrip / q_multimodal_wav_roundtrip) that
hash-match DuckDB char-arithmetic oracles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sayn_spark.functions.multimodal import (
    _png_chunk,
    png_encode,
    png_parse,
    wav_encode,
    wav_parse,
)


def test_png_roundtrip_bytes():
    pixels = bytes(range(12))  # 4x3
    png = png_encode(pixels, 4, 3)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, depth, ch, out = png_parse(png, want_pixels=True)
    assert (w, h, depth, ch) == (4, 3, 8, 1)
    assert out == pixels


def test_png_parse_headers_only():
    png = png_encode(b"\x00" * 6, 2, 3)
    assert png_parse(png) == (2, 3, 8, 1)


def test_png_unfilters_sub_and_up():
    """Hand-built PNG using filter 1 (Sub) and 2 (Up) scanlines — the
    decoder must reverse them, not just strip the filter byte."""
    # target image rows: (10, 20, 30), (11, 22, 33)
    # Sub encoding of row0: first literal, then deltas vs left
    row0 = bytes([1, 10, 10, 10])
    # Up encoding of row1: deltas vs row0's reconstructed bytes
    row1 = bytes([2, 1, 2, 3])
    raw = row0 + row1
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    *_, pixels = png_parse(png, want_pixels=True)
    assert pixels == bytes([10, 20, 30, 11, 22, 33])


def test_png_rejects_non_png_magic():
    with pytest.raises(NotImplementedError, match="not PNG"):
        png_parse(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG SOI


def test_wav_roundtrip_bytes():
    samples = np.array([0, 1, -1, 32767, -32768, 26], dtype=np.int64)
    wav = wav_encode(samples, sample_rate=8000)
    sr, ch, bits, out = wav_parse(wav)
    assert (sr, ch, bits) == (8000, 1, 16)
    assert out.tolist() == samples.tolist()


def test_wav_parse_skips_extra_chunks():
    """RIFF chunk walk must skip LIST/odd-length chunks (word aligned),
    not assume fmt/data at fixed offsets."""
    samples = np.array([5, -5, 7], dtype=np.int64)
    wav = bytearray(wav_encode(samples))
    # splice a 3-byte (odd) LIST chunk between fmt and data
    insert_at = 12 + 8 + 16  # RIFF hdr + fmt chunk
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad to word
    wav[insert_at:insert_at] = extra
    sr, ch, bits, out = wav_parse(bytes(wav))
    assert (sr, ch, bits) == (16000, 1, 16)
    assert out.tolist() == [5, -5, 7]


def test_wav_rejects_non_riff():
    with pytest.raises(NotImplementedError, match="not RIFF"):
        wav_parse(b"ID3\x04" + b"\x00" * 64)  # MP3 with ID3 tag


def test_real_resize_nearest_neighbour(spark):
    """decode=real resize: PNG in, valid smaller PNG out, pixels are the
    nearest-neighbour subsample of the source."""
    from sayn_spark.functions.multimodal import resize_images

    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    df = spark.createDataFrame(
        [(1, bytearray(png_encode(src.tobytes(), 4, 4)))], "doc_id long, payload binary"
    )
    row = resize_images(df, 2, 2, decode="real").collect()[0]
    assert (row.width, row.height) == (2, 2)
    w, h, _d, _c, pixels = png_parse(bytes(row.payload), want_pixels=True)
    assert (w, h) == (2, 2)
    # ys = xs = [0, 2] -> rows 0,2 x cols 0,2
    assert list(pixels) == [0, 2, 8, 10]


def test_real_image_metadata_on_png_payloads(spark):
    from sayn_spark.functions.multimodal import decode_image_metadata

    df = spark.createDataFrame(
        [
            (1, bytearray(png_encode(b"\x01" * 6, 3, 2))),
            (2, bytearray(png_encode(b"\x02" * 8, 2, 4))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_metadata(df, decode="real").collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (3, 2, 1)
    assert (rows[2].width, rows[2].height, rows[2].channels) == (2, 4, 1)


def test_real_image_metadata_sniffs_all_formats(spark):
    """decode='real' magic-sniffs PNG / BMP / GIF / baseline-JPEG per
    row in ONE frame — the r8 consolidation of the codec family."""
    from sayn_spark.functions.multimodal import (
        bmp_encode,
        decode_image_metadata,
        gif_encode,
        jpeg_encode,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(png_encode(b"\x01" * 6, 3, 2))),
            (2, bytearray(bmp_encode(b"\x02" * 8, 4, 2))),
            (3, bytearray(gif_encode(b"\x03" * 10, 5, 2))),
            (4, bytearray(jpeg_encode(bytes(128), 16, 8))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_metadata(df, decode="real").collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (3, 2, 1)
    assert (rows[2].width, rows[2].height, rows[2].channels) == (4, 2, 3)
    assert (rows[3].width, rows[3].height, rows[3].channels) == (5, 2, 1)
    assert (rows[4].width, rows[4].height, rows[4].channels) == (16, 8, 1)


def test_bmp_roundtrip_all_pad_widths():
    """Row padding hits every case (width*3 % 4 in {0,1,2,3}) and the
    bottom-up flip restores row order exactly."""
    from sayn_spark.functions.multimodal import bmp_encode, bmp_parse

    for width in (1, 2, 3, 4, 5, 8):
        height = 3
        pixels = bytes((x * 7 + y * 31) % 256 for y in range(height) for x in range(width))
        payload = bmp_encode(pixels, width, height)
        w, h, bpp, got = bmp_parse(payload, want_pixels=True)
        assert (w, h, bpp) == (width, height, 24)
        assert got == pixels, f"width {width}"
        # file size matches the header's declaration
        import struct

        declared = struct.unpack("<I", payload[2:6])[0]
        assert declared == len(payload)


def test_bmp_parse_rejects_foreign_and_topdown():
    import pytest

    from sayn_spark.functions.multimodal import bmp_encode, bmp_parse

    with pytest.raises(NotImplementedError, match="not BMP"):
        bmp_parse(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    # top-down BMPs (negative height) are the documented boundary
    payload = bytearray(bmp_encode(bytes(6), 2, 3))
    import struct

    payload[22:26] = struct.pack("<i", -3)
    with pytest.raises(NotImplementedError, match="top-down"):
        bmp_parse(bytes(payload), want_pixels=True)


def test_lzw_roundtrips_every_regime():
    """The from-scratch GIF LZW must roundtrip literals, periodic data
    (dictionary growth through every code width), and enough symbols
    to force 12-bit CLEAR resets — and must actually compress."""
    import random

    from sayn_spark.functions.multimodal import lzw_compress, lzw_decompress

    rng = random.Random(7)
    cases = [b"", b"\x00", b"abc", b"a" * 50, bytes(range(256)) * 3]
    for n in (10, 1000, 5000):
        cases.append(bytes(rng.randrange(256) for _ in range(n)))
        cases.append((b"pattern123" * (n // 10 + 1))[:n])
    cases.append(bytes(rng.choice(b"abcd") for _ in range(200000)))  # resets
    for c in cases:
        assert lzw_decompress(lzw_compress(c)) == c, len(c)
    rep = b"ab" * 5000
    assert len(lzw_compress(rep)) < len(rep) // 10  # genuine compression


def test_gif_roundtrip_and_extension_skipping():
    from sayn_spark.functions.multimodal import gif_encode, gif_parse

    px = bytes((i * 37) % 256 for i in range(80 * 50))
    payload = gif_encode(px, 80, 50)
    w, h, nc, got = gif_parse(payload, want_pixels=True)
    assert (w, h, nc) == (80, 50, 256) and got == px
    # a graphic-control extension between the palette and the image
    # descriptor must be walked over, not choked on
    head, rest = payload[: 13 + 768], payload[13 + 768 :]
    ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    assert gif_parse(head + ext + rest, want_pixels=True)[3] == px


def test_gif_parse_boundaries():
    import pytest as _pytest

    from sayn_spark.functions.multimodal import gif_encode, gif_parse

    with _pytest.raises(NotImplementedError):
        gif_parse(b"NOTGIF" + b"\x00" * 20)
    payload = bytearray(gif_encode(b"\x01\x02\x03\x04", 2, 2))
    # flip the interlace bit in the image descriptor's packed flags
    payload[13 + 768 + 9] |= 0x40
    with _pytest.raises(NotImplementedError):
        gif_parse(bytes(payload), want_pixels=True)


# --- baseline JPEG (r8) -------------------------------------------------


def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant images round-trip BIT-EXACTLY through the lossy
    pipeline with the flat quant table: only the whole-number DC
    survives the FDCT, so IDCT + clamp returns every pixel — the
    property the registered oracle relies on."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    rng = np.random.default_rng(81)
    blocks = rng.integers(0, 256, size=(3, 5))
    img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    w, h, nc, px = jpeg_parse(jpeg_encode(img.tobytes(), 40, 24), want_pixels=True)
    assert (w, h, nc) == (40, 24, 1)
    assert np.frombuffer(px, dtype=np.uint8).reshape(24, 40).tolist() == img.tolist()


def test_jpeg_random_image_flat_quant_error_bound():
    """Arbitrary images with the flat table: every coefficient's
    quantize error is <= 0.5, so decoded pixels sit within a couple of
    gray levels — the AC encode/decode path (runs, categories, sign
    extension) exercised on dense coefficients."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    rng = np.random.default_rng(82)
    img = rng.integers(0, 256, size=(24, 32)).astype(np.uint8)
    _, _, _, px = jpeg_parse(jpeg_encode(img.tobytes(), 32, 24), want_pixels=True)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 32).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 2


def test_jpeg_std_quant_is_lossy_but_close_and_smaller():
    """The Annex K table: visibly lossy on noise, small error on a
    smooth gradient, and a smaller payload than the flat table on the
    same image (the compression actually compresses)."""
    import numpy as np

    from sayn_spark.functions.multimodal import (
        JPEG_STD_QUANT,
        jpeg_encode,
        jpeg_parse,
    )

    g = np.add.outer(np.arange(24) * 3, np.arange(32) * 2).astype(np.uint8)
    flat = jpeg_encode(g.tobytes(), 32, 24)
    std = jpeg_encode(g.tobytes(), 32, 24, quant=JPEG_STD_QUANT)
    assert len(std) < len(flat)
    _, _, _, px = jpeg_parse(std, want_pixels=True)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 32).astype(int)
    assert np.abs(got - g.astype(int)).max() <= 6


def test_jpeg_zrl_long_zero_runs():
    """A block whose only AC coefficient sits beyond index 16 forces
    ZRL (16-zero-run) symbols through both coder and decoder."""
    import numpy as np

    from sayn_spark.functions.multimodal import (
        _JPEG_ZIGZAG,
        _dct_matrix,
        jpeg_encode,
        jpeg_parse,
    )

    # craft pixels whose DCT has an isolated high-frequency component:
    # inverse-transform a coefficient plan, quantize-roundtrip safe
    C = _dct_matrix()
    coef = np.zeros((8, 8))
    coef[0, 0] = 8 * 40  # DC: mid-gray 168
    coef[7, 7] = 100.0  # zigzag index 63: 62 zeros before it
    block = C.T @ coef @ C + 128.0
    img = np.clip(np.round(block), 0, 255).astype(np.uint8)
    payload = jpeg_encode(img.tobytes(), 8, 8)
    _, _, _, px = jpeg_parse(payload, want_pixels=True)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8).astype(int)
    # re-quantization of a clipped block is not exact; bounded error
    assert np.abs(got - img.astype(int)).max() <= 3
    assert _JPEG_ZIGZAG[63] == 63


def test_jpeg_byte_stuffing_roundtrips():
    """An image whose entropy stream is KNOWN to contain an 0xFF byte
    (block values found by search, pinned here) must round-trip — the
    stuffed 0x00 is consumed by the reader, never decoded as data."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    for blocks in ([[180, 217, 226, 10]], [[103, 0, 242, 30]]):
        img = np.kron(np.array(blocks), np.ones((8, 8), dtype=np.int64)).astype(
            np.uint8
        )
        payload = jpeg_encode(img.tobytes(), 32, 8)
        scan = payload[payload.index(b"\xff\xda") + 2 :]
        assert b"\xff\x00" in scan  # stuffing actually present
        _, _, _, px = jpeg_parse(payload, want_pixels=True)
        assert np.frombuffer(px, dtype=np.uint8).reshape(8, 32).tolist() == img.tolist()


def test_jpeg_rejects_out_of_scope_and_bad_dims():
    import pytest as _pytest

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    img = bytes(64)
    payload = bytearray(jpeg_encode(img, 8, 8))
    sof = payload.index(b"\xff\xc0")
    # SOF0 rewritten to SOF2 makes the baseline scan header MALFORMED
    # under progressive rules (a DC scan must have Se = 0, not 63) —
    # since r11 progressive itself is in scope, so this is a corrupt
    # payload (ValueError), not an unimplemented feature
    payload[sof + 1] = 0xC2
    with _pytest.raises(ValueError):
        jpeg_parse(bytes(payload), want_pixels=True)
    # arithmetic-coded SOF9 stays a documented scope boundary
    payload[sof + 1] = 0xC9
    with _pytest.raises(NotImplementedError):
        jpeg_parse(bytes(payload), want_pixels=True)
    with _pytest.raises(ValueError):
        jpeg_encode(bytes(60), 10, 6)  # not multiples of 8
    with _pytest.raises(NotImplementedError):
        jpeg_parse(b"\x89PNG\r\n\x1a\n")


# --- property-based codec hardening (r8) --------------------------------


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_jpeg_block_constant_roundtrip_property(bw, bh, data):
    """PROPERTY: any block-constant grayscale image round-trips
    bit-exactly through the flat-quant baseline JPEG — the exactness
    the registered oracle relies on, over arbitrary dimensions and
    values (not just one seeded corpus)."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    vals = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=bw * bh,
            max_size=bw * bh,
        )
    )
    blocks = np.array(vals).reshape(bh, bw)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    w, h, nc, px = jpeg_parse(
        jpeg_encode(img.tobytes(), bw * 8, bh * 8), want_pixels=True
    )
    assert (w, h, nc) == (bw * 8, bh * 8, 1)
    assert np.frombuffer(px, dtype=np.uint8).reshape(h, w).tolist() == img.tolist()


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10**6))
def test_jpeg_arbitrary_image_flat_quant_error_property(seed):
    """PROPERTY: flat-quant error bound holds on arbitrary images —
    every coefficient's quantize error <= 0.5, so decoded pixels stay
    within a couple of gray levels of the original."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(8, 16)).astype(np.uint8)
    _, _, _, px = jpeg_parse(jpeg_encode(img.tobytes(), 16, 8), want_pixels=True)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 16).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 2


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(cut=st.integers(min_value=0, max_value=400), seed=st.integers(0, 1000))
def test_jpeg_parse_truncated_payload_never_hangs(cut, seed):
    """PROPERTY: jpeg_parse on a truncated valid payload either raises
    a clean error or returns — it must never loop forever or crash the
    interpreter (the robustness a crawl-facing decoder needs)."""
    import numpy as np

    from sayn_spark.functions.multimodal import jpeg_encode, jpeg_parse

    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(1, 2))
    img = np.kron(blocks, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    payload = jpeg_encode(img.tobytes(), 16, 8)
    trunc = payload[: min(cut, len(payload))]
    try:
        jpeg_parse(trunc, want_pixels=True)
    except (ValueError, NotImplementedError):
        pass  # the decoder's documented error contract (r9): malformed
        # bytes -> ValueError, out-of-scope features ->
        # NotImplementedError; anything else (IndexError, struct.error)
        # is a contract breach and fails this test


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(cut=st.integers(min_value=0, max_value=1200), seed=st.integers(0, 1000))
def test_jpeg_progressive_truncated_payload_never_hangs(cut, seed):
    """PROPERTY: the progressive decoder holds the same two-exception
    contract as baseline under truncation — a multi-scan stream cut at
    any byte (mid-header, mid-scan, between scans, before EOI) raises
    ValueError/NotImplementedError or returns; never a raw
    IndexError/KeyError/struct.error, never a hang."""
    import numpy as np

    from sayn_spark.functions.multimodal import (
        JPEG_STD_QUANT,
        jpeg_encode_progressive,
        jpeg_parse,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    payload = jpeg_encode_progressive(
        img.tobytes(), 16, 16, quant_luma=JPEG_STD_QUANT, restart_interval=2
    )
    trunc = payload[: min(cut, len(payload))]
    try:
        jpeg_parse(trunc, want_pixels=True)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(cut=st.integers(min_value=0, max_value=300), seed=st.integers(0, 1000))
def test_gif_parse_truncated_payload_never_hangs(cut, seed):
    """Same truncation property for the GIF walker + LZW decoder."""
    import numpy as np

    from sayn_spark.functions.multimodal import gif_encode, gif_parse

    rng = np.random.default_rng(seed)
    pixels = bytes(int(v) for v in rng.integers(0, 256, size=24))
    payload = gif_encode(pixels, 6, 4)
    trunc = payload[: min(cut, len(payload))]
    try:
        gif_parse(trunc, want_pixels=True)
    except Exception:
        pass
