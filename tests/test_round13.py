"""Round-13 surfaces:

- mp4_parse played_ms: the edts/elst edit-list walk (v0 + v1 entry
  layouts, movie-timescale conversion deferred past the moov walk,
  empty-edit sentinel included in the sum) and its mp4_build witness.
- route_media_frame full-format dispatch: JPEG/PNG/GIF/BMP/WAV arms
  join MP4/WebP/MP3 so a mixed crawl's stills stop routing 'unknown'.
- wav_parse metadata mode (want_samples=False): headers-only frame
  count with no 16-bit restriction.
- bmp_parse metadata mode: header fields readable on compressed /
  non-24bpp / top-down payloads whose PIXEL decode stays out of scope.
- gif_meta: full-block frame count + summed GCE delays, headers only.
"""

import struct

import pytest

from sayn_spark.functions.multimodal import mp4_build, mp4_parse


def test_mp4_elst_played_time_roundtrip():
    """A two-segment edit list sums to the track's PLAYED time in both
    fullbox versions; tracks without an edit list report 0 (played ==
    media length, no separate signal)."""
    p = mp4_build(640, 360, 10000, video_duration_ms=8000,
                  video_n_samples=100,
                  video_edit_list=[(3000, 0), (2500, 500)])
    dur, n, tracks = mp4_parse(p)
    assert (dur, n) == (10000, 1)
    assert tracks[0] == ("vide", "avc1", 640, 360, 8000, 100, 5500)

    v1 = mp4_parse(mp4_build(640, 360, 10000, video_duration_ms=8000,
                             video_n_samples=100, version1=True,
                             video_edit_list=[(3000, 0), (2500, 500)]))
    assert v1[2][0] == tracks[0]

    # no elst -> played_ms 0, and the audio trak never gets one
    d2 = mp4_parse(mp4_build(320, 240, 7000, with_audio=True,
                             video_edit_list=[(1500, -1), (4000, 0)]))
    assert d2[2][0][6] == 5500  # empty-edit sentinel counts as played
    assert d2[2][1][6] == 0


def test_mp4_elst_movie_timescale_after_trak():
    """elst durations live on the MOVIE clock: a hand-built tree with
    mvhd timescale 500 placed AFTER the trak still converts correctly —
    the conversion must run after the full moov walk, not at the box."""

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag, payload):
        return box(tag, b"\x00\x00\x00\x00" + payload)

    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 500, 3000) + b"\x00" * 80)
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 4000)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 13)
    tkhd = full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, 6000)
                + b"\x00" * 16
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", 64 << 16, 48 << 16))
    # 1250 + 250 movie ticks at 500 ticks/s = 3000 ms played
    elst = full(b"elst", struct.pack(">I", 2)
                + struct.pack(">IiHH", 1250, 0, 1, 0)
                + struct.pack(">IiHH", 250, 100, 1, 0))
    trak = box(b"trak", tkhd + box(b"edts", elst) + box(b"mdia", mdhd + hdlr))
    payload = box(b"ftyp", b"isom" + bytes(4)) + box(b"moov", trak + mvhd)
    dur, n, tracks = mp4_parse(payload)
    assert (dur, n) == (6000, 1)
    assert tracks[0][4] == 4000  # media clock
    assert tracks[0][6] == 3000  # played, on the movie clock

    # a declared entry count overflowing the box is a loud truncation
    bad_elst = full(b"elst", struct.pack(">I", 99)
                    + struct.pack(">IiHH", 1250, 0, 1, 0))
    bad = box(b"ftyp", b"isom" + bytes(4)) + box(
        b"moov",
        mvhd + box(b"trak", tkhd + box(b"edts", bad_elst)
                   + box(b"mdia", mdhd + hdlr)),
    )
    with pytest.raises(ValueError, match="elst entries overflow"):
        mp4_parse(bad)


def test_route_media_frame_all_formats(spark):
    """The router types every format the module parses — JPEG, PNG,
    GIF (still + animated), BMP, WAV join MP4/WebP/MP3 — plus the
    unknown arm for NULL and garbage payloads; one mapInPandas stage,
    nothing shuffles."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from sayn_spark.functions.multimodal import (
        bmp_encode,
        gif_encode,
        gif_encode_animated,
        jpeg_encode,
        mp3_build,
        mp4_build,
        png_encode,
        route_media_frame,
        wav_encode,
        webp_build,
    )

    px64 = bytes(range(64))
    payloads = [
        (1, mp4_build(640, 360, 9000, video_duration_ms=8000,
                      video_n_samples=240,
                      video_edit_list=[(4000, 0), (1000, 500)])),
        (2, webp_build(100, 80, mode="lossy")),
        (3, mp3_build(43, 128, 44100, 2)),  # 43*1152/44100 s
        (4, jpeg_encode(px64, 8, 8)),
        (5, png_encode(px64, 8, 8)),
        (6, gif_encode(px64, 8, 8)),
        (7, gif_encode_animated(
            [(px64, 0, 0, 8, 8, 50, 0, None),
             (bytes(16), 2, 2, 4, 4, 25, 2, 0)], 8, 8)),
        (8, bmp_encode(px64, 8, 8)),
        (9, wav_encode([0] * 8000, 16000)),  # 500 ms mono
        (10, b"\x00nonsense\x00" * 4),
        (11, None),
    ]
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    df = spark.createDataFrame(payloads, schema)
    got = {
        r["doc_id"]: (
            r["media_type"], r["width"], r["height"], r["duration_ms"],
            r["is_animated"], r["n_frames"], r["fps_milli"],
        )
        for r in route_media_frame(df).collect()
    }
    assert got[1] == ("video/mp4", 640, 360, 5000, 0, 240, 30000)
    assert got[2] == ("image/webp", 100, 80, 0, 0, 1, 0)
    assert got[3] == ("audio/mpeg", 0, 0, 43 * 1152 * 1000 // 44100, 0, 0, 0)
    assert got[4] == ("image/jpeg", 8, 8, 0, 0, 1, 0)
    assert got[5] == ("image/png", 8, 8, 0, 0, 1, 0)
    assert got[6] == ("image/gif", 8, 8, 0, 0, 1, 0)
    assert got[7] == ("image/gif", 8, 8, 750, 1, 2, 0)
    assert got[8] == ("image/bmp", 8, 8, 0, 0, 1, 0)
    assert got[9] == ("audio/wav", 0, 0, 500, 0, 0, 0)
    assert got[10] == ("unknown", 0, 0, 0, 0, 0, 0)
    assert got[11] == ("unknown", 0, 0, 0, 0, 0, 0)
