#!/usr/bin/env python3
"""Generate the committed vendor-byte fixtures under tests/fixtures/.

These files are BYTE-EXACT constructions from the public format
specifications, written by THIS standalone script — it imports nothing
from splatloam_tpu, so the fixtures cannot co-evolve with the readers
they test (VERDICT r3 ask #6: the reader tests previously synthesized
their inputs with helpers living next to the readers).

Provenance of every layout:

* KITTI velodyne ``.bin``: little-endian float32 quadruples
  (x, y, z, reflectance) — KITTI odometry devkit readme ("Velodyne
  point clouds", devkit_odometry/readme.txt) and raw-data devkit
  (velodyne_points/data/*.bin).
* ROS1 ``.bag``: Bag Format 2.0, http://wiki.ros.org/Bags/Format/2.0 —
  "#ROSBAG V2.0\\n" magic, length-prefixed records with op codes
  BAG_HEADER=0x03 (padded to 4096 bytes), CHUNK=0x05, CONNECTION=0x07,
  MESSAGE_DATA=0x02, INDEX_DATA=0x04, CHUNK_INFO=0x06; chunk
  compression "none"/"bz2"/"lz4" (lz4 = LZ4 FRAME format v1.6.1,
  magic 0x184D2204 — encoded here as literal-only blocks, which every
  conformant decoder accepts).
* sensor_msgs/PointCloud2 serialization: ROS1 wire format (no CDR):
  Header(seq u32, stamp sec/nsec u32, frame_id string) + height/width
  u32 + fields[] (name string, offset u32, datatype u8, count u32) +
  is_bigendian u8(+3 pad? NO — ROS1 serialization is packed, no
  padding) + point_step/row_step u32 + data bytes + is_dense u8.
* Ouster point layout: ouster-ros ``ouster_ros::Point``
  (ouster-ros/include/ouster_ros/point.hpp): x f32@0, y f32@4, z f32@8
  (+4 pad), intensity f32@16, t u32@20, reflectivity u16@24, ring u16@26,
  ambient u16@28 (+2 pad), range u32@32, point_step 48 (SSE-aligned).
  Topic /ouster/points as recorded by the VBR/Newer-College datasets.
* Hesai point layout: HesaiLidar_ROS ``PointXYZIT``: x f32@0, y f32@4,
  z f32@8, intensity f32@12? — the shipped Pandar driver uses
  (x, y, z, intensity f32, timestamp f64, ring u16), serialized by PCL
  with alignment: x@0 y@4 z@8 (+pad) intensity@16, timestamp f64@24,
  ring u16@32, point_step 48 (PCL pads to 16-byte boundaries).  Topic
  /hesai/pandar as recorded by the Oxford-Spires dataset.
* ROS2 ``.db3``: rosbag2 sqlite3 storage plugin schema
  (topics(id, name, type, serialization_format, offered_qos_profiles),
  messages(id, topic_id, timestamp, data)) with CDR-encoded payloads
  (XCDR1 little-endian encapsulation header 00 01 00 00).
* MCAP: https://mcap.dev/spec — magic \\x89MCAP0\\r\\n both ends,
  records = opcode u8 + length u64; HEADER=0x01, FOOTER=0x02,
  SCHEMA=0x03, CHANNEL=0x04, MESSAGE=0x05, CHUNK=0x06, DATA_END=0x0F;
  chunk holds compressed records with uncompressed CRC32.
* PCD v0.7 ``binary_compressed``: pointclouds.org PCD file-format docs;
  body = u32 compressed size + u32 uncompressed size + LZF-compressed
  field-major (SoA) data.  LZF per Marc Lehmann's liblzf: literal runs
  (ctrl < 32) and back-references (ctrl >= 32).

Run:  python tools/make_fixtures.py   (regenerates tests/fixtures/)
"""
from __future__ import annotations

import bz2
import sqlite3
import struct
import zlib
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures"


# ---------------------------------------------------------------------------
# deterministic synthetic survey: a cylinder room, same for every format
# ---------------------------------------------------------------------------

def make_seq_cloud(seed: int, frame: int, n: int = 4000) -> np.ndarray:
    """Frame ``frame`` of a structured canyon sweep in SENSOR frame:
    two facade walls + ground + pillars, viewed from x = 0.35*frame —
    the multi-frame full-CLI vendor fixture (deterministic)."""
    rng = np.random.default_rng(seed * 1000 + frame)
    k = n // 4
    L, W2 = 30.0, 6.0
    pts = [
        np.stack([rng.uniform(-5, L, k), np.full(k, -W2),
                  rng.uniform(-1.6, 3.0, k)], -1),
        np.stack([rng.uniform(-5, L, k), np.full(k, W2),
                  rng.uniform(-1.6, 3.0, k)], -1),
        np.stack([rng.uniform(-5, L, k), rng.uniform(-W2, W2, k),
                  np.full(k, -1.6)], -1),
    ]
    m = n - 3 * k
    th = rng.uniform(-np.pi, np.pi, m)
    cx = 4.0 + 6.0 * (np.arange(m) % 4)
    cy = np.where(np.arange(m) % 2 == 0, -2.5, 2.5)
    pts.append(np.stack([cx + 0.5 * np.cos(th), cy + 0.5 * np.sin(th),
                         rng.uniform(-1.6, 1.0, m)], -1))
    world = np.concatenate(pts).astype(np.float32)
    world[:, 0] -= 0.35 * frame          # sensor moves +x through it
    d = np.linalg.norm(world, axis=1)
    return world[(d > 1.0) & (d < 40.0)]


def make_cloud(seed: int, n: int = 256) -> np.ndarray:
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-1.5, 2.0, n)
    r = rng.uniform(4.0, 25.0, n)
    return np.stack([r * np.cos(theta), r * np.sin(theta), z],
                    -1).astype(np.float32)


# ---------------------------------------------------------------------------
# LZ4 frame (literal-only) + LZF (literal-only) encoders
# ---------------------------------------------------------------------------

def _xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (Yann Collet's reference algorithm) — needed for the
    LZ4 frame header checksum; stdlib has no implementation."""
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    i, n = 0, len(data)
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<I", data, i + 4 * j)[0]
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12)
             + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        h = (h + struct.unpack_from("<I", data, i)[0] * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def lz4_frame(data: bytes) -> bytes:
    """Minimal LZ4 Frame (spec v1.6.1): FLG=0x40 (version 01), BD=0x70
    (4 MB max block size), header checksum HC = (xxh32(FLG+BD) >> 8) &
    0xff, one uncompressed block (highest bit of the size word set),
    EndMark."""
    flg, bd = 0x40, 0x70
    hc = (_xxh32(bytes([flg, bd])) >> 8) & 0xFF
    out = struct.pack("<I", 0x184D2204) + bytes([flg, bd, hc])
    out += struct.pack("<I", len(data) | 0x80000000) + data
    out += struct.pack("<I", 0)                            # EndMark
    return out


def lzf_compress_literal(data: bytes) -> bytes:
    """LZF with only literal runs (ctrl byte = len-1 < 32) — valid LZF
    output per liblzf's format, no back-references."""
    out = bytearray()
    for i in range(0, len(data), 32):
        run = data[i:i + 32]
        out.append(len(run) - 1)
        out += run
    return bytes(out)


# ---------------------------------------------------------------------------
# PointCloud2 payloads
# ---------------------------------------------------------------------------

_PC2_DT = {"f32": 7, "f64": 8, "u32": 6, "u16": 4, "u8": 2}  # datatype enum


def ouster_points_data(xyz: np.ndarray) -> tuple[list, int, bytes]:
    """ouster_ros::Point records, point_step 48 (see module docstring)."""
    fields = [("x", 0, "f32"), ("y", 4, "f32"), ("z", 8, "f32"),
              ("intensity", 16, "f32"), ("t", 20, "u32"),
              ("reflectivity", 24, "u16"), ("ring", 26, "u16"),
              ("ambient", 28, "u16"), ("range", 32, "u32")]
    step = 48
    buf = bytearray(len(xyz) * step)
    for i, p in enumerate(xyz):
        o = i * step
        struct.pack_into("<fff", buf, o, *p)
        struct.pack_into("<f", buf, o + 16, float(i % 255))
        struct.pack_into("<I", buf, o + 20, i * 1000)
        struct.pack_into("<HHH", buf, o + 24, i % 65535, i % 128, 100)
        struct.pack_into("<I", buf, o + 32,
                         int(np.linalg.norm(p) * 1000))
    return fields, step, bytes(buf)


def hesai_points_data(xyz: np.ndarray) -> tuple[list, int, bytes]:
    """Hesai Pandar PointXYZIT records, PCL-aligned point_step 48."""
    fields = [("x", 0, "f32"), ("y", 4, "f32"), ("z", 8, "f32"),
              ("intensity", 16, "f32"), ("timestamp", 24, "f64"),
              ("ring", 32, "u16")]
    step = 48
    buf = bytearray(len(xyz) * step)
    for i, p in enumerate(xyz):
        o = i * step
        struct.pack_into("<fff", buf, o, *p)
        struct.pack_into("<f", buf, o + 16, float(i % 255))
        struct.pack_into("<d", buf, o + 24, 1.5e9 + i * 1e-4)
        struct.pack_into("<H", buf, o + 32, i % 32)
    return fields, step, bytes(buf)


def _ros1_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def ros1_pc2_message(xyz, sec, nsec, frame_id=b"os_sensor",
                     layout=ouster_points_data) -> bytes:
    """ROS1 (non-CDR) serialization of sensor_msgs/PointCloud2."""
    fields, step, data = layout(xyz)
    out = bytearray()
    out += struct.pack("<I", 0)                     # Header.seq
    out += struct.pack("<II", sec, nsec)            # Header.stamp
    out += _ros1_string(frame_id)                   # Header.frame_id
    out += struct.pack("<II", 1, len(xyz))          # height, width
    out += struct.pack("<I", len(fields))           # fields[]
    for name, off, kind in fields:
        out += _ros1_string(name.encode())
        out += struct.pack("<IBI", off, _PC2_DT[kind], 1)
    out += struct.pack("<B", 0)                     # is_bigendian
    out += struct.pack("<II", step, step * len(xyz))
    out += struct.pack("<I", len(data)) + data      # data[]
    out += struct.pack("<B", 1)                     # is_dense
    return bytes(out)


# ---------------------------------------------------------------------------
# ROS1 bag writer (Bag Format 2.0)
# ---------------------------------------------------------------------------

def _bag_header(fields: dict) -> bytes:
    out = b"".join(struct.pack("<I", len(k) + 1 + len(v)) + k + b"=" + v
                   for k, v in fields.items())
    return struct.pack("<I", len(out)) + out


def _bag_record(header: dict, data: bytes) -> bytes:
    return _bag_header(header) + struct.pack("<I", len(data)) + data


def write_ros1_bag(path: Path, clouds, stamps, topic=b"/ouster/points",
                   compression=b"lz4", layout=ouster_points_data):
    conn_header = {
        b"op": b"\x07", b"conn": struct.pack("<I", 0), b"topic": topic}
    conn_data = _bag_header({
        b"topic": topic,
        b"type": b"sensor_msgs/PointCloud2",
        b"md5sum": b"1158d486dd51d683ce2f1be655c3c181",
        b"message_definition": b"# abridged for fixture\n",
    })

    msgs = bytearray()
    index_entries = []
    for xyz, (sec, nsec) in zip(clouds, stamps):
        t = struct.pack("<II", sec, nsec)
        hdr = {b"op": b"\x02", b"conn": struct.pack("<I", 0), b"time": t}
        index_entries.append((sec, nsec, len(msgs)))
        msgs += _bag_record(hdr, ros1_pc2_message(xyz, sec, nsec,
                                                  layout=layout))

    chunk_plain = _bag_record(conn_header, conn_data) + bytes(msgs)
    if compression == b"bz2":
        comp = bz2.compress(chunk_plain)
    elif compression == b"lz4":
        comp = lz4_frame(chunk_plain)
    else:
        comp = chunk_plain

    out = bytearray(b"#ROSBAG V2.0\n")
    # BAG_HEADER (op=0x03), padded to 4096 bytes with spaces (spec)
    bag_hdr = _bag_header({
        b"op": b"\x03",
        b"index_pos": struct.pack("<Q", 0),
        b"conn_count": struct.pack("<I", 1),
        b"chunk_count": struct.pack("<I", 1),
    })
    pad = 4096 - len(bag_hdr) - 4
    out += bag_hdr + struct.pack("<I", pad) + b" " * pad
    chunk_hdr = {b"op": b"\x05", b"compression": compression,
                 b"size": struct.pack("<I", len(chunk_plain))}
    chunk_pos = len(out)
    out += _bag_record(chunk_hdr, comp)
    # INDEX_DATA (op=0x04) for connection 0 — after the chunk (spec)
    idx = b"".join(struct.pack("<IIII", s, ns, off, 0)[:12]
                   for s, ns, off in index_entries)
    out += _bag_record({b"op": b"\x04", b"ver": struct.pack("<I", 1),
                        b"conn": struct.pack("<I", 0),
                        b"count": struct.pack("<I", len(index_entries))},
                       idx)
    # CONNECTION again in the index section + CHUNK_INFO (op=0x06)
    out += _bag_record(conn_header, conn_data)
    ci = struct.pack("<II", 0, len(index_entries))
    out += _bag_record({b"op": b"\x06", b"ver": struct.pack("<I", 1),
                        b"chunk_pos": struct.pack("<Q", chunk_pos),
                        b"start_time": struct.pack("<II", *stamps[0]),
                        b"end_time": struct.pack("<II", *stamps[-1]),
                        b"count": struct.pack("<I", 1)}, ci)
    path.write_bytes(bytes(out))


# ---------------------------------------------------------------------------
# ROS2: CDR PointCloud2 + sqlite3 bag + MCAP
# ---------------------------------------------------------------------------

def cdr_pc2_message(xyz, sec, nsec, frame_id=b"PandarXT-32",
                    layout=hesai_points_data) -> bytes:
    """XCDR1 little-endian serialization (4-byte encapsulation header
    00 01 00 00, then aligned CDR)."""
    fields, step, data = layout(xyz)
    out = bytearray(b"\x00\x01\x00\x00")
    base = 4  # alignment is relative to the encapsulation payload start

    def align(k):
        while (len(out) - base) % k:
            out.append(0)

    def u32(v):
        align(4); out.extend(struct.pack("<I", v))

    def i32(v):
        align(4); out.extend(struct.pack("<i", v))

    def u8(v):
        out.append(v)

    def string(s):
        u32(len(s) + 1); out.extend(s + b"\x00")

    i32(sec); u32(nsec); string(frame_id)          # std_msgs/Header
    u32(1); u32(len(xyz))                          # height, width
    u32(len(fields))
    for name, off, kind in fields:
        string(name.encode())
        u32(off); u8(_PC2_DT[kind]); u32(1)
    u8(0)                                          # is_bigendian
    u32(step); u32(step * len(xyz))
    u32(len(data)); out.extend(data)               # data[]
    u8(1)                                          # is_dense
    return bytes(out)


def write_ros2_db3(path: Path, clouds, stamps, topic="/hesai/pandar"):
    db = sqlite3.connect(path)
    db.executescript("""
        CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT NOT NULL,
          type TEXT NOT NULL, serialization_format TEXT NOT NULL,
          offered_qos_profiles TEXT NOT NULL);
        CREATE TABLE messages(id INTEGER PRIMARY KEY,
          topic_id INTEGER NOT NULL, timestamp INTEGER NOT NULL,
          data BLOB NOT NULL);
    """)
    db.execute("INSERT INTO topics VALUES (1, ?, "
               "'sensor_msgs/msg/PointCloud2', 'cdr', '')", (topic,))
    for xyz, (sec, nsec) in zip(clouds, stamps):
        db.execute("INSERT INTO messages(topic_id, timestamp, data) "
                   "VALUES (1, ?, ?)",
                   (sec * 10**9 + nsec,
                    cdr_pc2_message(xyz, sec, nsec)))
    db.commit()
    db.close()


def _mcap_rec(op: int, body: bytes) -> bytes:
    return struct.pack("<BQ", op, len(body)) + body


def _mcap_str(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def write_mcap(path: Path, clouds, stamps, topic=b"/ouster/points"):
    """Chunked MCAP (spec at mcap.dev): header, schema, channel, one
    uncompressed chunk of message records with CRC, data end, footer."""
    out = bytearray(b"\x89MCAP0\r\n")
    out += _mcap_rec(0x01, _mcap_str(b"ros2") + _mcap_str(b"fixture"))
    schema = _mcap_rec(0x03, struct.pack("<H", 1)
                       + _mcap_str(b"sensor_msgs/msg/PointCloud2")
                       + _mcap_str(b"ros2msg") + _mcap_str(b""))
    channel = _mcap_rec(0x04, struct.pack("<HH", 1, 1)
                        + _mcap_str(topic) + _mcap_str(b"cdr")
                        + struct.pack("<I", 0))
    records = schema + channel
    t0 = t1 = None
    for xyz, (sec, nsec) in zip(clouds, stamps):
        ts = sec * 10**9 + nsec
        t0 = ts if t0 is None else t0
        t1 = ts
        payload = cdr_pc2_message(xyz, sec, nsec,
                                  layout=ouster_points_data)
        records += _mcap_rec(0x05, struct.pack("<HIQQ", 1, 0, ts, ts)
                             + payload)
    chunk_body = (struct.pack("<QQQ", t0, t1, len(records))
                  + struct.pack("<I", zlib.crc32(records))
                  + _mcap_str(b"")          # compression = none
                  + struct.pack("<Q", len(records)) + records)
    out += _mcap_rec(0x06, chunk_body)
    out += _mcap_rec(0x0F, struct.pack("<I", 0))        # DATA_END
    out += _mcap_rec(0x02, struct.pack("<QQI", 0, 0, 0))  # FOOTER
    out += b"\x89MCAP0\r\n"
    path.write_bytes(bytes(out))


# ---------------------------------------------------------------------------
# PCD v0.7 binary_compressed (LZF), Ouster-style fields
# ---------------------------------------------------------------------------

def write_pcd_lzf(path: Path, xyz: np.ndarray):
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z intensity\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F F\n"
        "COUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary_compressed\n").encode()
    intens = (np.arange(n) % 255).astype(np.float32)
    # binary_compressed stores fields SoA (all x, then all y, ...)
    soa = np.concatenate([xyz[:, 0], xyz[:, 1], xyz[:, 2],
                          intens]).astype("<f4").tobytes()
    comp = lzf_compress_literal(soa)
    body = struct.pack("<II", len(comp), len(soa)) + comp
    path.write_bytes(header + body)


# ---------------------------------------------------------------------------


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    expected = {}

    # KITTI velodyne frame: x, y, z, reflectance float32 quadruples
    kitti = make_cloud(1)
    refl = (np.arange(len(kitti)) % 100 / 100.0).astype(np.float32)
    xyzi = np.concatenate([kitti, refl[:, None]], axis=1)
    (OUT / "kitti_0000000000.bin").write_bytes(
        xyzi.astype("<f4").tobytes())
    expected["kitti_xyz"] = kitti

    stamps = [(1600000000 + i, 250000000 * i) for i in range(3)]
    clouds = [make_cloud(10 + i) for i in range(3)]
    expected["bag_t"] = np.array([s + ns * 1e-9 for s, ns in stamps])
    for i, c in enumerate(clouds):
        expected[f"bag_xyz_{i}"] = c

    write_ros1_bag(OUT / "ouster_lz4.bag", clouds, stamps,
                   compression=b"lz4")
    write_ros1_bag(OUT / "ouster_bz2.bag", clouds, stamps,
                   compression=b"bz2")
    write_ros2_db3(OUT / "hesai.db3", clouds, stamps)
    write_mcap(OUT / "ouster.mcap", clouds, stamps)
    write_pcd_lzf(OUT / "ouster_lzf.pcd", clouds[0])

    # multi-frame full-CLI sequence (VBR layout: /ouster/points, LZ4)
    seq_stamps = [(1700000000 + i, 100000000 * i) for i in range(6)]
    seq_clouds = [make_seq_cloud(7, i) for i in range(6)]
    write_ros1_bag(OUT / "vbr_seq.bag", seq_clouds, seq_stamps,
                   topic=b"/ouster/points", compression=b"lz4")
    expected["seq_t"] = np.array([s + ns * 1e-9 for s, ns in seq_stamps])
    expected["seq_n"] = np.array([len(c) for c in seq_clouds])

    np.savez(OUT / "expected.npz", **expected)
    print(f"fixtures written to {OUT}")


if __name__ == "__main__":
    main()
