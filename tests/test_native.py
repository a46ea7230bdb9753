"""Native C++ host-runtime library parity vs pure-Python fallbacks."""
import numpy as np
import pytest

from splatloam_tpu.io import native
from splatloam_tpu.io.pointcloud import _lzf_decompress


def _lzf_compress_naive(payload: bytes) -> bytes:
    """Literal-only LZF stream (valid, uncompressed) for round-trips."""
    out = b""
    i = 0
    while i < len(payload):
        run = min(32, len(payload) - i)
        out += bytes([run - 1]) + payload[i:i + run]
        i += run
    return out


def test_lzf_python_fallback_roundtrip(rng):
    payload = rng.integers(0, 255, 999, dtype=np.uint8).tobytes()
    stream = _lzf_compress_naive(payload)
    assert _lzf_decompress(stream, len(payload)) == payload


def test_lzf_backref_parity():
    # literal 'abc' then a back-reference run (RLE-style overlap copy)
    stream = bytes([2]) + b"abc" + bytes([(7 << 5) | 0, 4, 0x00])
    py = _lzf_decompress(stream, 16)
    assert py == b"abc" + b"c" * 13
    if native.available():
        assert native.lzf_decompress(stream, 16) == py


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_lzf_parity(rng):
    payload = rng.integers(0, 255, 4096, dtype=np.uint8).tobytes()
    stream = _lzf_compress_naive(payload)
    assert native.lzf_decompress(stream, len(payload)) == payload


def test_read_files_batch(tmp_path, rng):
    paths = []
    for k in range(6):
        p = tmp_path / f"{k}.bin"
        p.write_bytes(bytes([k]) * (50 + 10 * k))
        paths.append(p)
    buf, sizes = native.read_files_batch(paths, stride=128)
    assert list(sizes) == [50, 60, 70, 80, 90, 100]
    for k in range(6):
        assert buf[k, 0] == k
        assert buf[k, int(sizes[k]):].sum() == 0  # zero padding


def test_filter_cloud(rng):
    xyzi = (rng.normal(size=(2000, 4)) * 10).astype(np.float32)
    xyzi[7, 0] = np.nan
    xyzi[9, 1] = np.inf
    out = native.filter_cloud(xyzi, 2.0, 25.0)
    r = np.linalg.norm(out, axis=1)
    assert np.all((r > 2.0) & (r <= 25.0))
    assert np.all(np.isfinite(out))
    # matches the numpy fallback path
    xyz = xyzi[:, :3]
    r2 = np.sum(xyz * xyz, axis=1)
    ok = np.isfinite(r2) & (r2 > 4.0) & (r2 <= 625.0)
    assert len(out) == int(ok.sum())


# ---------------------------------------------------------------------------
# LZ4 frame decoding (roslz4 / MCAP chunk format)
# ---------------------------------------------------------------------------

def _lz4_frame_literals(payload: bytes) -> bytes:
    """Minimal valid LZ4 frame holding `payload` as one STORED block."""
    import struct
    head = struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
    block = struct.pack("<I", 0x80000000 | len(payload)) + payload
    return head + block + struct.pack("<I", 0)


def _lz4_frame_compressed_block(block: bytes) -> bytes:
    import struct
    head = struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
    return head + struct.pack("<I", len(block)) + block + \
        struct.pack("<I", 0)


def test_lz4_frame_stored_roundtrip(rng):
    payload = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    frame = _lz4_frame_literals(payload)
    assert native.lz4_frame_decompress(frame, len(payload)) == payload
    assert native._lz4_frame_py(frame) == payload


def test_lz4_frame_match_block():
    """Hand-crafted block with a back-reference: 'abcd' x 5 encoded as a
    4-literal sequence + a match of 12 at offset 4, then a 4-literal
    tail (LZ4 requires the last sequence literal-only)."""
    # token: lit=4, matchlen=12-4=8 -> 0x48; literals 'abcd'; offset 4
    block = bytes([0x48]) + b"abcd" + bytes([0x04, 0x00])
    # tail: token lit=4, no match; literals 'abcd'
    block += bytes([0x40]) + b"abcd"
    frame = _lz4_frame_compressed_block(block)
    expected = b"abcd" * 5
    assert native.lz4_frame_decompress(frame, len(expected)) == expected
    assert native._lz4_frame_py(frame) == expected


def test_lz4_frame_native_matches_python(rng):
    if not native.available():
        pytest.skip("native library unavailable")
    payload = bytes(rng.integers(0, 4, 3000, dtype=np.uint8))  # repetitive
    frame = _lz4_frame_literals(payload)
    assert native.lz4_frame_decompress(frame, len(payload)) == \
        native._lz4_frame_py(frame)
