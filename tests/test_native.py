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
