"""parse_image_header decodes real format bytes — tested against
hand-assembled files, NOT the payload synthesizer (so a bug symmetric in
both would still be caught by these independent fixtures)."""

from __future__ import annotations

from sparksent.ext.multimodal import parse_image_header, synth_image_payload


def _png(w: int, h: int, depth: int = 8) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, 6, 0, 0, 0])
        + b"\xde\xad\xbe\xef"
    )


def test_png_header():
    assert parse_image_header(_png(1920, 1080, 16)) == ("png", 1920, 1080, 16)


def test_jpeg_header_with_skipped_segments():
    # SOI, APP1 (Exif, variable length), COM, DRI, then SOF2 (progressive)
    app1 = b"\xff\xe1" + (8).to_bytes(2, "big") + b"Exif\x00\x00"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    dri = b"\xff\xdd" + (4).to_bytes(2, "big") + b"\x00\x08"
    sof2 = b"\xff\xc2" + (17).to_bytes(2, "big") + bytes([12]) + (600).to_bytes(
        2, "big"
    ) + (800).to_bytes(2, "big") + bytes([3])
    assert parse_image_header(b"\xff\xd8" + app1 + com + dri + sof2 + b"junk") == (
        "jpeg",
        800,
        600,
        12,
    )


def test_jpeg_dht_not_mistaken_for_frame():
    # C4 (DHT) and CC (DAC) are in C0-CF but are NOT frame headers
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"\x00\x01\x02"
    sof0 = b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8]) + (10).to_bytes(
        2, "big"
    ) + (20).to_bytes(2, "big") + bytes([1])
    assert parse_image_header(b"\xff\xd8" + dht + sof0) == ("jpeg", 20, 10, 8)


def test_gif_header():
    assert parse_image_header(b"GIF87a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")) == (
        "gif",
        320,
        200,
        8,
    )


def test_garbage_and_truncation_degrade_per_record():
    assert parse_image_header(None) == (None, None, None, None)
    assert parse_image_header(b"") == (None, None, None, None)
    assert parse_image_header(b"not an image at all") == (None, None, None, None)
    assert parse_image_header(b"\x89PNG\r\n\x1a\nIH") == (None, None, None, None)
    # JPEG with no frame marker before the bytes run out
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == (
        "jpeg",
        None,
        None,
        None,
    )


def test_synthesizer_roundtrip():
    for mid in (0, 1, 2, 639, 640, 997):
        fmt, w, h, depth = parse_image_header(synth_image_payload(mid, b"body"))
        assert fmt == ("png", "jpeg", "gif")[mid % 3]
        assert (w, h) == (mid % 640 + 1, mid % 480 + 1)
        assert depth == 8


# ---------------------------------------------------------------------------
# real pixel decode (BMP / PPM)
# ---------------------------------------------------------------------------

import numpy as np
import pytest

from sparksent.ext.multimodal import (
    _synth_pixels,
    decode_bmp,
    decode_media,
    decode_ppm,
    synth_bmp_payload,
    synth_ppm_payload,
)


@pytest.mark.parametrize("mid", [0, 1, 2, 3, 4, 5, 15, 16, 47, 191, 9999])
def test_pixel_decode_roundtrip_both_formats(mid):
    """Every width mod 4 (BMP row padding) and both formats decode back
    to the synthesized pixel array bit-for-bit."""
    ref = _synth_pixels(mid)
    assert (decode_media(synth_bmp_payload(mid), "image/bmp") == ref).all()
    assert (
        decode_media(synth_ppm_payload(mid), "image/x-portable-pixmap") == ref
    ).all()


def test_bmp_decode_undoes_row_and_channel_order():
    """A hand-built 2x2 BMP with distinct corner pixels pins the
    bottom-up row flip and BGR->RGB swap independently of the synth."""
    # logical RGB image: [[red, green], [blue, white]]
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    h, w = 2, 2
    stride = (w * 3 + 3) & ~3  # 8
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    raster = rows.tobytes()
    payload = (
        b"BM" + (54 + len(raster)).to_bytes(4, "little") + bytes(4)
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + bytes(16)
        + raster
    )
    assert (decode_bmp(payload) == img).all()


def test_ppm_comment_and_whitespace_handling():
    img = _synth_pixels(7)
    h, w, _ = img.shape
    payload = (
        b"P6 # inline\n# a comment line\n " + f"{w}".encode()
        + b"\n# another\n" + f"{h}".encode() + b"  255\n" + img.tobytes()
    )
    assert (decode_ppm(payload) == img).all()


def test_decode_media_degrades_on_header_only_payloads():
    # Every format now reaches a REAL decoder.  The header-synth
    # fixtures carry no raster data: the 3-component JPEG header hits
    # decode_jpeg's multi-component variant gate (NotImplementedError
    # naming the feature), and truncated PNG/GIF fail as corrupt files
    # (ValueError) — per-record degradation, never a stub.
    with pytest.raises(NotImplementedError):
        decode_media(synth_image_payload(1, b"x"), "image/jpeg")
    with pytest.raises(ValueError):
        decode_media(synth_image_payload(3, b"x"), "image/png")
    with pytest.raises(ValueError):
        decode_media(synth_image_payload(2, b"x"), "image/gif")


# ---------------------------------------------------------------------------
# real PNG pixel decode (stdlib zlib)
# ---------------------------------------------------------------------------

from sparksent.ext.multimodal import decode_png, synth_png_payload


@pytest.mark.parametrize("mid", list(range(10)) + [15, 16, 47, 191, 9999])
def test_png_roundtrip_all_filters_both_color_types(mid):
    """ids 0..9 rotate the scanline filter through all five types on
    both RGB (even) and RGBA (odd, alpha dropped) payloads; larger ids
    cover every width/height residue class."""
    assert (decode_media(synth_png_payload(mid), "image/png")
            == _synth_pixels(mid)).all()


def test_png_payload_is_spec_valid():
    """The synthesized file is a real PNG: signature, IHDR dims readable
    by the independent header parser, CRCs correct per chunk."""
    import zlib

    payload = synth_png_payload(21)
    fmt, w, h, depth = parse_image_header(payload)
    assert (fmt, w, h, depth) == ("png", 21 % 16 + 1, 21 % 12 + 1, 8)
    pos = 8
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        assert crc == (zlib.crc32(ctype + body) & 0xFFFFFFFF), ctype
        pos += 12 + size
        if ctype == b"IEND":
            break


def test_gif_roundtrip():
    from sparksent.ext.multimodal import synth_gif_payload

    for mid in list(range(12)) + [191, 9999]:
        assert (decode_media(synth_gif_payload(mid), "image/gif")
                == _synth_pixels(mid)).all()


def test_lzw_codec_full_algorithm():
    """Byte-level LZW round trips through dictionary growth (code width
    9->12), the 4096-entry reset, and the KwKwK self-reference case."""
    import numpy as np

    from sparksent.ext.multimodal import _lzw_decode, _lzw_encode

    long_stream = [int(x) for x in (np.arange(6000) * 37 + np.arange(6000) ** 2 // 7) % 256]
    enc = _lzw_encode(long_stream, 8)
    assert len(enc) < len(long_stream)  # it actually compresses
    assert _lzw_decode(enc, 8) == long_stream
    kwk = [1, 1, 1, 1, 2, 2, 1, 1]  # forces code == next_code at decode
    assert _lzw_decode(_lzw_encode(kwk, 2), 2) == kwk


def test_gif_decode_skips_extension_blocks():
    """A graphic-control extension spliced before the image descriptor
    (the 89a-common layout) must be skipped by declared sub-block
    lengths."""
    from sparksent.ext.multimodal import synth_gif_payload

    payload = synth_gif_payload(9)
    # insert after header + LSD + 768-byte GCT
    cut = 6 + 7 + 768
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = payload[:cut] + gce + payload[cut:]
    assert (decode_media(spliced, "image/gif") == _synth_pixels(9)).all()


def test_gif_rejects_interlaced():
    from sparksent.ext.multimodal import decode_gif, synth_gif_payload

    payload = bytearray(synth_gif_payload(5))
    idesc = 6 + 7 + 768  # image descriptor offset
    assert payload[idesc] == 0x2C
    payload[idesc + 9] |= 0x40  # set interlace flag
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(payload))


def test_png_decode_rejects_unsupported_variants():
    payload = bytearray(synth_png_payload(4))
    # IHDR body starts at 8 (sig) + 8 (len+type); color_type is byte 9
    ihdr_body = 16
    payload[ihdr_body + 9] = 3  # palette
    with pytest.raises(NotImplementedError):
        decode_png(bytes(payload))
    payload = bytearray(synth_png_payload(4))
    payload[ihdr_body + 8] = 16  # 16-bit depth
    with pytest.raises(NotImplementedError):
        decode_png(bytes(payload))


# ---------------------------------------------------------------------------
# real JPEG baseline decode (huffman + IDCT)
# ---------------------------------------------------------------------------

from sparksent.ext.multimodal import decode_jpeg, synth_jpeg_payload


@pytest.mark.parametrize("mid", list(range(16)) + [191, 9999])
def test_jpeg_block_law_roundtrip(mid):
    """DC-only blocks survive the full baseline pipeline bit-exactly:
    huffman encode with byte stuffing -> entropy decode -> DC
    prediction -> dequant -> IDCT -> crop."""
    w, h = mid % 16 + 1, mid % 12 + 1
    x, y = np.arange(w)[None, :], np.arange(h)[:, None]
    want = ((mid * 3 + 7 * (x // 8) + 13 * (y // 8)) % 256).astype(np.uint8)
    got = decode_media(synth_jpeg_payload(mid), "image/jpeg")
    assert got.shape == (h, w, 3)
    assert (got == np.repeat(want[:, :, None], 3, axis=2)).all()


def _ref_idct(coefs):
    """INDEPENDENT reference IDCT (spec A.3.3 quadruple loop, natural
    order with row index = vertical frequency v) — deliberately not the
    decoder's matrix form, so an orientation or scale bug in _idct2d
    cannot cancel out of the comparison."""
    import math

    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * coefs[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y, x] = acc / 4
    return out


def test_idct_matches_independent_reference():
    """The decoder's matrix IDCT equals the spec quadruple-loop on
    asymmetric blocks — pins orientation (a transposed form passed the
    DC-only fixtures silently until this test existed)."""
    from sparksent.ext.multimodal import _idct2d

    rng = np.random.RandomState(3)
    for _ in range(5):
        coefs = [int(v) for v in rng.randint(-200, 200, 64)]
        assert np.allclose(_idct2d(coefs), _ref_idct(coefs), atol=1e-9)
    # explicit orientation probe: S(v=1, u=0) is a VERTICAL gradient
    coefs = [0] * 64
    coefs[8] = 60  # natural index v*8+u = 8 -> v=1, u=0
    img = _idct2d(coefs)
    assert np.allclose(img, img[:, :1])  # constant along x
    assert not np.allclose(img, img[:1, :])  # varying along y


def test_jpeg_dequant_uses_zigzag_ordered_table():
    """DQT entries are stored in ZIGZAG order (T.81 B.4.4.1): a
    non-flat table must scale the coefficient at zigzag index k by
    q[k], not by q[natural(k)]."""
    from sparksent.ext.multimodal import (
        _AC_LUM_BITS, _AC_LUM_VALS, _DC_LUM_BITS, _DC_LUM_VALS,
        _BitWriter, _encode_block, _huff_codes, _idct2d, _ZIGZAG,
        decode_jpeg,
    )

    # quantized coefficient 1 at zigzag index 2 (natural 8 = v=1,u=0);
    # quant table has 50 at zigzag index 2 and 1 elsewhere
    qtable = [1] * 64
    qtable[2] = 50
    coefs = [0] * 64
    coefs[_ZIGZAG[2]] = 1
    bwr = _BitWriter()
    _encode_block(
        bwr, coefs, 0,
        _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS),
        _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS),
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(qtable))
        + seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bwr.flush() + b"\xff\xd9"
    )
    got = decode_jpeg(payload)[:, :, 0]
    dequant = [0] * 64
    dequant[_ZIGZAG[2]] = 1 * 50
    want = np.clip(np.round(_ref_idct(dequant) + 128), 0, 255).astype(np.uint8)
    assert (got == want).all()
    assert got.std() > 1  # the gradient is actually visible, not flat


def test_jpeg_ac_entropy_path():
    """Nonzero AC coefficients, long zero runs (ZRL), and EOB all
    survive the huffman layer: hand-encode dense blocks, decode the
    file, and compare against the INDEPENDENT reference dequant+IDCT
    applied directly to the source coefficients — any entropy-layer or
    transform corruption (wrong run length, wrong category bits, missed
    stuffing, flipped orientation) breaks equality."""
    from sparksent.ext.multimodal import (
        _AC_LUM_BITS, _AC_LUM_VALS, _DC_LUM_BITS, _DC_LUM_VALS,
        _BitWriter, _encode_block, _huff_codes,
    )

    h = w = 16  # 2x2 blocks
    blocks = []
    rng = np.random.RandomState(7)
    for i in range(4):
        coefs = [0] * 64
        coefs[0] = int(rng.randint(-1000, 1000))
        # a few scattered ACs, including one forcing a >15 zero run
        for pos in (1, 5, 17, 40, 63):
            coefs[pos] = int(rng.randint(-30, 30)) or 7
        blocks.append(coefs)
    dc_codes = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bwr = _BitWriter()
    pred = 0
    for coefs in blocks:
        pred = _encode_block(bwr, coefs, pred, dc_codes, ac_codes)
    scan = bwr.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan + b"\xff\xd9"
    )
    got = decode_jpeg(payload)[:, :, 0]
    want = np.zeros((16, 16), dtype=np.uint8)
    for i, coefs in enumerate(blocks):
        by, bx = divmod(i, 2)
        block = np.clip(np.round(_ref_idct(coefs) + 128), 0, 255).astype(np.uint8)
        want[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    assert (got == want).all()


def test_jpeg_rejects_unsupported_variants():
    payload = bytearray(synth_jpeg_payload(3))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_jpeg_byte_stuffing_exercised():
    """At least one synthesized id must produce a stuffed FF00 in its
    entropy segment — otherwise the unstuffing path is dead code in the
    fixture corpus."""
    found = False
    for mid in range(300):
        p = synth_jpeg_payload(mid)
        sos = p.index(b"\xff\xda")
        scan = p[sos + 2 + int.from_bytes(p[sos + 2 : sos + 4], "big") : -2]
        if b"\xff\x00" in scan:
            found = True
            break
    assert found


# ---------------------------------------------------------------------------
# real video container demux (AVI)
# ---------------------------------------------------------------------------

from sparksent.ext.multimodal import parse_avi_index, synth_avi_payload


@pytest.mark.parametrize("mid", [0, 1, 2, 23, 24, 191, 9999])
def test_avi_demux_roundtrip(mid):
    """Container walk recovers the frame law exactly: counts, per-frame
    sizes/checksums, keyframe flags, and offsets consistent with
    word-aligned chunk layout."""
    meta, frames = parse_avi_index(synth_avi_payload(mid))
    n = mid % 24 + 2
    assert meta["n_frames"] == n
    assert (meta["width"], meta["height"]) == (mid % 16 + 1, mid % 12 + 1)
    off = 4
    for i, fr in enumerate(frames):
        size = (mid * 13 + i * 7) % 50 + 4
        assert fr["size"] == size
        assert fr["offset"] == off
        assert fr["checksum"] == sum((mid + i + j) % 256 for j in range(size)) % 997
        assert fr["is_key"] == (i % 4 == 0)
        off += 8 + size + (size & 1)


def test_avi_without_idx1_parses_with_unknown_keyflags():
    """AVIF_HASINDEX is optional per spec: stripping the idx1 chunk must
    still demux (offsets/sizes/checksums from the movi walk) with
    is_key unknown (None), not raise."""
    payload = synth_avi_payload(7)
    i = payload.rindex(b"idx1")
    stripped = payload[: i - 0]
    # idx1 is the last chunk before EOF; drop it and patch the RIFF size
    stripped = bytearray(payload[:i])
    stripped[4:8] = (len(stripped) - 8).to_bytes(4, "little")
    meta, frames = parse_avi_index(bytes(stripped))
    assert meta["n_frames"] == 7 % 24 + 2 == len(frames)
    assert all(fr["is_key"] is None for fr in frames)
    assert all(fr["size"] == (7 * 13 + i * 7) % 50 + 4 for i, fr in enumerate(frames))


def test_mjpeg_video_end_to_end():
    """Full video pipeline: AVI demux + per-frame baseline JPEG decode
    reproduces every frame of the block law bit-exactly."""
    from sparksent.ext.multimodal import decode_video_frames, synth_mjpeg_payload

    for mid in (0, 1, 5, 11, 191, 9999):
        meta, imgs = decode_video_frames(synth_mjpeg_payload(mid))
        n, w, h = mid % 6 + 2, mid % 16 + 1, mid % 12 + 1
        assert meta["n_frames"] == n == len(imgs)
        x, y = np.arange(w)[None, :], np.arange(h)[:, None]
        for f, img in enumerate(imgs):
            want = ((mid * 3 + 17 * f + 7 * (x // 8) + 13 * (y // 8)) % 256)
            assert img.shape == (h, w, 3)
            assert (img[:, :, 0] == want.astype(np.uint8)).all()


def test_video_decode_gates_on_codec_handler():
    """decode_video_frames must gate on the stream's declared handler,
    not sniff frame bytes — the raw-byte AVI clips raise a codec error
    NAMING the handler instead of mis-decoding or KeyError-ing."""
    from sparksent.ext.multimodal import decode_video_frames, synth_avi_payload

    with pytest.raises(NotImplementedError, match="codec"):
        decode_video_frames(synth_avi_payload(5))


def test_mjpeg_frames_are_standalone_jpegs():
    """MJPEG's defining property: every extracted frame payload is a
    complete, independently-decodable JFIF file."""
    from sparksent.ext.multimodal import parse_avi_index, synth_mjpeg_payload

    _, frames = parse_avi_index(synth_mjpeg_payload(9), keep_data=True)
    for fr in frames:
        assert fr["data"][:2] == b"\xff\xd8" and fr["data"][-2:] == b"\xff\xd9"
        assert decode_jpeg(fr["data"]).ndim == 3


def test_avi_idx1_mismatch_detected():
    """A corrupted idx1 offset must fail the cross-validation — the
    demuxer validates the index against the walked chunks rather than
    trusting either side."""
    payload = bytearray(synth_avi_payload(7))
    i = payload.rindex(b"idx1")
    # first entry's offset field (idx1 header 8 bytes, entry offset at +8)
    entry_off = i + 8 + 8
    payload[entry_off : entry_off + 4] = (9999).to_bytes(4, "little")
    with pytest.raises(ValueError):
        parse_avi_index(bytes(payload))


# ---------------------------------------------------------------------------
# real audio decode (WAV)
# ---------------------------------------------------------------------------

from sparksent.ext.multimodal import (
    _synth_samples,
    decode_wav,
    synth_wav_payload,
)


@pytest.mark.parametrize("mid", [0, 1, 7, 100, 799, 800, 12345])
def test_wav_roundtrip(mid):
    assert (decode_wav(synth_wav_payload(mid)) == _synth_samples(mid)).all()


def test_wav_skips_unknown_chunks_word_aligned():
    """A LIST chunk with an ODD declared size before the data chunk
    exercises the RIFF word-alignment rule."""
    samples = _synth_samples(5)
    data = samples.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"  # 3 + pad byte
    body = b"WAVE" + fmt + junk + b"data" + len(data).to_bytes(4, "little") + data
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert (decode_wav(payload) == samples).all()


def test_wav_rejects_non_pcm():
    bad = bytearray(synth_wav_payload(3))
    # fmt codec field lives right after "WAVE" + "fmt " + size (12+8)
    bad[20:22] = (85).to_bytes(2, "little")  # MP3 codec id
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_frame_decode_sampled_work_proportional_to_k(monkeypatch):
    """The sample->decode composition's entire point: entropy decode
    runs ONLY on the sampled frames.  Count decode_media calls through
    the batch stage directly (it's a plain generator) for a clip with
    n_frames > k and assert exactly min(k, n) decodes — where the
    full-decode stage (decode_video_stats) pays n."""
    import pandas as pd

    from sparksent.ext import multimodal as mm

    mid = 5  # n_frames = 5 % 6 + 2 = 7 > k = 4
    n = mid % mm.MJPEG_FRAMES_MOD + 2
    calls = []
    real = mm.decode_media
    monkeypatch.setattr(
        mm, "decode_media", lambda p, m: calls.append(m) or real(p, m)
    )
    batch = pd.DataFrame({"media_id": [mid]})
    out = pd.concat(list(mm.frame_decode_sampled_stats(iter([batch]), k=4)))
    assert len(calls) == min(4, n) == 4 < n
    assert list(out["frame_no"]) == [i * n // 4 for i in range(4)]
    # and the decoded stats agree with the full-decode stage's rows for
    # the same frames (same per-frame block law, real decode both ways)
    calls.clear()
    full = pd.concat(list(mm.decode_video_stats(iter([batch]))))
    assert len(calls) == n  # the contrast: full decode pays clip length
    merged = out.merge(
        full, on=["media_id", "frame_no"], suffixes=("", "_full")
    )
    assert len(merged) == 4
    assert (merged["sum_v"] == merged["sum_v_full"]).all()
    assert (merged["wsum_v"] == merged["wsum_v_full"]).all()


def test_frame_decode_sampled_short_clip_distinct_frames():
    """Clips with n_frames < k must sample DISTINCT frames: the old
    law fno = i*n//k decoded frame 0 twice for n=2, k=4 and never
    touched frame 1 (ADVICE r9) — the min(k, n) denominator covers the
    whole short clip exactly once."""
    import pandas as pd

    from sparksent.ext import multimodal as mm

    mid = 0  # n_frames = 0 % 6 + 2 = 2 < k = 4
    n = mid % mm.MJPEG_FRAMES_MOD + 2
    assert n == 2
    batch = pd.DataFrame({"media_id": [mid]})
    out = pd.concat(list(mm.frame_decode_sampled_stats(iter([batch]), k=4)))
    assert len(out) == n  # min(k, n) rows, not k
    assert sorted(out["frame_no"]) == list(range(n))  # every frame, once


def test_box_resample_identity_and_law():
    """scale=1 keeps the grid; a 2x downscale floor-averages each box —
    checked against a hand computation."""
    import numpy as np

    from sparksent.ext.multimodal import box_resample

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    same = box_resample(img, max_w=8, max_h=6)  # 6x4 fits in 8x6
    assert (same == img.astype(np.int64)).all()
    half = box_resample(img, max_w=3, max_h=2)  # exact 2x2 boxes
    assert half.shape == (2, 3, 3)
    for oy in range(2):
        for ox in range(3):
            box = img[2 * oy : 2 * oy + 2, 2 * ox : 2 * ox + 2].astype(np.int64)
            assert (half[oy, ox] == box.reshape(4, 3).sum(0) // 4).all()


def test_bilinear_resize_identity_edges_gradient():
    """Fixed-point bilinear: same-dims resize is the identity (all
    weights land on integer centers), a 1x1 image replicates, and a
    2-pixel gradient upscales monotonically with replicated borders."""
    import numpy as np

    from sparksent.ext.multimodal import bilinear_resize

    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    assert (bilinear_resize(img, ow=8, oh=6) == img.astype(np.int64)).all()

    one = np.full((1, 1, 3), 77, dtype=np.uint8)
    out1 = bilinear_resize(one, ow=8, oh=6)
    assert out1.shape == (6, 8, 3) and (out1 == 77).all()

    two = np.zeros((1, 2, 3), dtype=np.uint8)
    two[0, 1] = 200
    out2 = bilinear_resize(two, ow=8, oh=6)
    col = out2[0, :, 0]
    assert col[0] == 0 and col[-1] == 200  # borders replicate
    assert all(col[i] <= col[i + 1] for i in range(7))  # monotone blend
    assert (out2 == out2[0:1]).all()  # rows identical (1-row source)


def test_resample_kernels_value_bounds_property():
    """Property over arbitrary dims (hypothesis): both resample kernels
    are convex combinations (floor'd) of source pixels, so every output
    value must lie within [min-1, max] of the source channel (the -1
    absorbs the floor), and output dims must match the sizing laws."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from sparksent.ext.multimodal import (
        BILINEAR_OH,
        BILINEAR_OW,
        bilinear_resize,
        box_resample,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    def run(w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        lo, hi = int(img.min()), int(img.max())

        box = box_resample(img)
        scale = min(8 / w, 6 / h, 1.0)
        assert box.shape == (max(1, int(h * scale)), max(1, int(w * scale)), 3)
        assert box.min() >= lo - 1 and box.max() <= hi

        bil = bilinear_resize(img)
        assert bil.shape == (BILINEAR_OH, BILINEAR_OW, 3)
        assert bil.min() >= lo - 1 and bil.max() <= hi
        # box partitions the source: every source pixel contributes to
        # exactly one output cell, so per-channel output-cell sums
        # weighted by box counts reproduce the source sum exactly
        bx = np.arange(w, dtype=np.int64) * box.shape[1] // w
        by = np.arange(h, dtype=np.int64) * box.shape[0] // h
        cnt = np.zeros(box.shape[:2], dtype=np.int64)
        np.add.at(cnt, (by[:, None], bx[None, :]), 1)
        src_sum = img.astype(np.int64).sum(axis=(0, 1))
        # floor-mean loses < 1 per cell per channel
        lost = src_sum - (box * cnt[:, :, None]).sum(axis=(0, 1))
        assert (lost >= 0).all() and (lost < cnt.sum()).all()

    run()


def test_fused_signatures_match_per_modality(spark):
    """The fused one-decode-pass signature stage (ext/mmsig.py) must
    emit exactly the per-modality stages' signatures — same helpers by
    construction, but this pins the Spark-level plumbing (schema,
    array packing, slot order) across all three media modalities."""
    from pyspark.sql import functions as F

    from sparksent.ext.audiodup import audio_fingerprints
    from sparksent.ext.imagedup import image_phashes
    from sparksent.ext.mmsig import multimodal_signatures
    from sparksent.ext.videodup import video_frame_sigs
    from sparksent.tables import load_table

    from conftest import SF_DIR_SMALL

    docs = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id").limit(60)
    fused = {
        r.media_id: (tuple(r.img_hw), tuple(r.aud_hw), tuple(r.vid_sig))
        for r in multimodal_signatures(docs).collect()
    }
    img = {r.media_id: tuple(r.hw) for r in image_phashes(docs).collect()}
    aud = {r.media_id: tuple(r.hw) for r in audio_fingerprints(docs).collect()}
    vid = {
        r.media_id: tuple(x.fhash for x in r.s)
        for r in video_frame_sigs(docs)
        .groupBy("media_id")
        .agg(F.sort_array(F.collect_list(F.struct("slot", "fhash"))).alias("s"))
        .collect()
    }
    assert len(fused) == 60
    for mid, (ih, ah, vs) in fused.items():
        assert ih == img[mid], mid
        assert ah == aud[mid], mid
        assert vs == vid[mid], mid
