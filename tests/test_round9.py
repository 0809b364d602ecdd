"""Round-9 additions: JPEG marker-walk robustness (ADVICE r8),
measured containment contract, dedup-task method promotions, color
JPEG, streaming semantic decontamination."""

import hashlib

import pytest


# -- jpeg_parse: fill bytes and standalone markers (ADVICE r8) -----------


def _gray_jpeg(w=16, h=8):
    from sayn_spark.functions.multimodal import jpeg_encode

    px = bytes(hashlib.md5(f"j{i}".encode()).digest()[0] for i in range(w * h))
    # block-constant so the default all-1s quant round-trips exactly
    blocks = [px[(by * (w // 8) + bx) % len(px)] for by in range(h // 8) for bx in range(w // 8)]
    img = bytearray(w * h)
    for by in range(h // 8):
        for bx in range(w // 8):
            v = blocks[by * (w // 8) + bx]
            for y in range(8):
                for x in range(8):
                    img[(by * 8 + y) * w + bx * 8 + x] = v
    return jpeg_encode(bytes(img), w, h)


def test_jpeg_parse_skips_fill_bytes_and_standalone_markers():
    """Spec-legal 0xFF fill bytes (T.81 B.1.1.2) and standalone TEM /
    RSTn markers between header segments must not derail the marker
    walk (they carry no length field)."""
    from sayn_spark.functions.multimodal import jpeg_parse

    payload = _gray_jpeg()
    w, h, nc, px = jpeg_parse(payload, want_pixels=True)
    # splice after SOI+APP0 (2 + 18 bytes): fill bytes, a TEM marker,
    # a standalone RST2, more fill bytes
    cut = 20
    assert payload[cut] == 0xFF  # next marker starts here
    spliced = (
        payload[:cut]
        + b"\xff\xff\xff"  # fill bytes before the next marker
        + b"\xff\x01"  # TEM (standalone, no length)
        + b"\xff\xd2"  # RST2 (standalone, no length)
        + payload[cut:]
    )
    w2, h2, nc2, px2 = jpeg_parse(spliced, want_pixels=True)
    assert (w2, h2, nc2) == (w, h, nc)
    assert px2 == px
