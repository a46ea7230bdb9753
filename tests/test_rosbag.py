"""Rosbag reader tests against synthetically-written ROS1/ROS2 bags."""
import bz2
import sqlite3
import struct

import numpy as np

from splatloam_tpu.io.rosbag import (BagSequenceReader, Ros1Bag, Ros2Bag,
                                     parse_cdr_pointcloud2,
                                     parse_ros1_pointcloud2)

# ---------------------------------------------------------------------------
# minimal writers (test-only)
# ---------------------------------------------------------------------------


def _hdr(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k.encode() + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _record(header: dict, data: bytes) -> bytes:
    h = _hdr(header)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) \
        + data


def _pc2_fields():
    # (name, offset, datatype(7=f32), count)
    return [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
            ("intensity", 12, 7, 1)]


def _ros1_pc2_payload(xyz: np.ndarray, sec: int, nsec: int) -> bytes:
    n = len(xyz)
    data = np.zeros((n, 4), "<f4")
    data[:, :3] = xyz
    out = struct.pack("<I", 0)                     # header.seq
    out += struct.pack("<II", sec, nsec)           # stamp
    frame = b"lidar"
    out += struct.pack("<I", len(frame)) + frame   # frame_id
    out += struct.pack("<II", 1, n)                # height, width
    fields = _pc2_fields()
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        nb = name.encode()
        out += struct.pack("<I", len(nb)) + nb
        out += struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)                    # is_bigendian
    out += struct.pack("<II", 16, 16 * n)          # point_step, row_step
    raw = data.tobytes()
    out += struct.pack("<I", len(raw)) + raw
    out += struct.pack("<B", 1)                    # is_dense
    return out


def write_ros1_bag(path, clouds, timestamps, topic="/points",
                   compression="none"):
    conn_id = 0
    conn_inner = _hdr({"topic": topic.encode(),
                       "type": b"sensor_msgs/PointCloud2",
                       "md5sum": b"0" * 32,
                       "message_definition": b""})
    chunk_payload = b""
    chunk_payload += _record({"op": b"\x07", "conn": struct.pack(
        "<I", conn_id), "topic": topic.encode()}, conn_inner)
    for xyz, ts in zip(clouds, timestamps):
        sec, nsec = int(ts), int((ts % 1) * 1e9)
        t = struct.pack("<II", sec, nsec)
        chunk_payload += _record(
            {"op": b"\x02", "conn": struct.pack("<I", conn_id), "time": t},
            _ros1_pc2_payload(xyz, sec, nsec))
    if compression == "bz2":
        comp = bz2.compress(chunk_payload)
    elif compression == "lz4":
        # minimal valid LZ4 frame: one stored block (roslz4-compatible)
        comp = (struct.pack("<I", 0x184D2204) + bytes([0x40, 0x40, 0x00])
                + struct.pack("<I", 0x80000000 | len(chunk_payload))
                + chunk_payload + struct.pack("<I", 0))
    else:
        comp = chunk_payload
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03",
                         "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 1),
                         "chunk_count": struct.pack("<I", 1)}, b" " * 8))
        f.write(_record({"op": b"\x05",
                         "compression": compression.encode(),
                         "size": struct.pack("<I", len(chunk_payload))},
                        comp))
        # index-section connection record + chunk info
        f.write(_record({"op": b"\x07", "conn": struct.pack("<I", conn_id),
                         "topic": topic.encode()}, conn_inner))
        f.write(_record({"op": b"\x06",
                         "ver": struct.pack("<I", 1),
                         "chunk_pos": struct.pack("<Q", 13),
                         "start_time": struct.pack("<Q", 0),
                         "end_time": struct.pack("<Q", 0),
                         "count": struct.pack("<I", 1)},
                        struct.pack("<II", conn_id, len(clouds))))


def _cdr_pc2_payload(xyz: np.ndarray, sec: int, nsec: int) -> bytes:
    n = len(xyz)
    data = np.zeros((n, 4), "<f4")
    data[:, :3] = xyz

    buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation

    def align(k):
        rem = (len(buf) - 4) % k
        if rem:
            buf.extend(b"\x00" * (k - rem))

    def u32(v):
        align(4)
        buf.extend(struct.pack("<I", v))

    def i32(v):
        align(4)
        buf.extend(struct.pack("<i", v))

    def u8(v):
        buf.extend(struct.pack("<B", v))

    def string(s):
        b = s.encode() + b"\x00"
        u32(len(b))
        buf.extend(b)

    i32(sec)
    u32(nsec)
    string("lidar")
    u32(1)          # height
    u32(n)          # width
    u32(4)          # n fields
    for name, off, dt, cnt in _pc2_fields():
        string(name)
        u32(off)
        u8(dt)
        u32(cnt)
    u8(0)           # is_bigendian
    u32(16)         # point_step
    u32(16 * n)     # row_step
    raw = data.tobytes()
    u32(len(raw))
    buf.extend(raw)
    u8(1)           # is_dense
    return bytes(buf)


def write_ros2_bag(path, clouds, timestamps, topic="/points"):
    db = sqlite3.connect(path)
    db.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
               "type TEXT, serialization_format TEXT, "
               "offered_qos_profiles TEXT)")
    db.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
               "topic_id INTEGER, timestamp INTEGER, data BLOB)")
    db.execute("INSERT INTO topics VALUES (1, ?, "
               "'sensor_msgs/msg/PointCloud2', 'cdr', '')", (topic,))
    for xyz, ts in zip(clouds, timestamps):
        sec, nsec = int(ts), int((ts % 1) * 1e9)
        db.execute("INSERT INTO messages(topic_id, timestamp, data) "
                   "VALUES (1, ?, ?)",
                   (int(ts * 1e9), _cdr_pc2_payload(xyz, sec, nsec)))
    db.commit()
    db.close()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _clouds(rng, n_msgs=3, n_pts=100):
    return ([rng.normal(size=(n_pts, 3)).astype(np.float32) * 5
             for _ in range(n_msgs)],
            [10.0 + 0.1 * i for i in range(n_msgs)])


def test_ros1_bag_roundtrip(tmp_path, rng):
    clouds, ts = _clouds(rng)
    path = tmp_path / "test.bag"
    write_ros1_bag(path, clouds, ts)
    bag = Ros1Bag(path)
    assert bag.count_for_topic("/points") == 3
    msgs = list(bag.messages("/points"))
    assert len(msgs) == 3
    for raw, cloud, t in zip(msgs, clouds, ts):
        xyz, stamp = parse_ros1_pointcloud2(raw)
        np.testing.assert_allclose(xyz, cloud, rtol=1e-6)
        assert abs(stamp - t) < 1e-6


def test_ros1_bag_bz2(tmp_path, rng):
    clouds, ts = _clouds(rng, n_msgs=2)
    path = tmp_path / "test_bz2.bag"
    write_ros1_bag(path, clouds, ts, compression="bz2")
    reader = BagSequenceReader([path], "/points")
    assert reader.message_count == 2
    out = list(reader)
    np.testing.assert_allclose(out[0][0], clouds[0], rtol=1e-6)
    np.testing.assert_allclose(out[1][0], clouds[1], rtol=1e-6)


def test_ros1_bag_lz4(tmp_path, rng):
    clouds, ts = _clouds(rng, n_msgs=2)
    path = tmp_path / "test_lz4.bag"
    write_ros1_bag(path, clouds, ts, compression="lz4")
    reader = BagSequenceReader([path], "/points")
    assert reader.message_count == 2
    out = list(reader)
    np.testing.assert_allclose(out[0][0], clouds[0], rtol=1e-6)
    np.testing.assert_allclose(out[1][0], clouds[1], rtol=1e-6)


def test_ros2_bag_roundtrip(tmp_path, rng):
    clouds, ts = _clouds(rng)
    path = tmp_path / "test.db3"
    write_ros2_bag(path, clouds, ts)
    bag = Ros2Bag(path)
    assert bag.count_for_topic("/points") == 3
    for raw, cloud, t in zip(bag.messages("/points"), clouds, ts):
        xyz, stamp = parse_cdr_pointcloud2(raw)
        np.testing.assert_allclose(xyz, cloud, rtol=1e-6)
        assert abs(stamp - t) < 1e-3


def test_bag_sequence_multi_file(tmp_path, rng):
    c1, t1 = _clouds(rng, n_msgs=2)
    c2, t2 = _clouds(rng, n_msgs=2)
    write_ros1_bag(tmp_path / "a.bag", c1, t1)
    write_ros1_bag(tmp_path / "b.bag", c2, t2)
    reader = BagSequenceReader([tmp_path / "a.bag", tmp_path / "b.bag"],
                               "/points")
    assert reader.message_count == 4
    out = list(reader)
    assert len(out) == 4
    np.testing.assert_allclose(out[3][0], c2[1], rtol=1e-6)


def test_rosbag_pointcloud_reader(tmp_path, rng):
    from splatloam_tpu.config import (PointCloudReaderConfig,
                                      PointCloudReaderType)
    from splatloam_tpu.io.pointcloud import PointCloudReader_ROSBAG
    clouds, ts = _clouds(rng)
    write_ros1_bag(tmp_path / "seq.bag", clouds, ts)
    cfg = PointCloudReaderConfig(
        cloud_folder=str(tmp_path), rosbag_topic="/points",
        cloud_format=PointCloudReaderType.rosbag)
    reader = PointCloudReader_ROSBAG(cfg)
    assert len(reader) == 3
    xyz, t = next(reader)
    assert xyz.shape == (100, 3)
    assert abs(t - 10.0) < 1e-6


# ---------------------------------------------------------------------------
# MCAP (modern ROS2 container; the reference reads these via rosbags)
# ---------------------------------------------------------------------------

def _mcap_record(op: int, body: bytes) -> bytes:
    import struct
    return bytes([op]) + struct.pack("<Q", len(body)) + body


def _mcap_string(s: str) -> bytes:
    import struct
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def write_mcap_bag(path, clouds, timestamps, topic="/points",
                   chunked=False):
    import struct
    magic = b"\x89MCAP0\r\n"
    recs = []
    recs.append(_mcap_record(0x01, _mcap_string("ros2") +
                             _mcap_string("test")))          # Header
    schema = (struct.pack("<H", 1)
              + _mcap_string("sensor_msgs/msg/PointCloud2")
              + _mcap_string("ros2msg") + _mcap_string(""))
    recs.append(_mcap_record(0x03, schema))                  # Schema
    chan = (struct.pack("<HH", 1, 1) + _mcap_string(topic)
            + _mcap_string("cdr") + struct.pack("<I", 0))
    recs.append(_mcap_record(0x04, chan))                    # Channel
    msgs = []
    for xyz, ts in zip(clouds, timestamps):
        sec, nsec = int(ts), int((ts - int(ts)) * 1e9)
        payload = _cdr_pc2_payload(xyz, sec, nsec)
        body = (struct.pack("<HIQQ", 1, 0, int(ts * 1e9), int(ts * 1e9))
                + payload)
        msgs.append(_mcap_record(0x05, body))                # Message
    if chunked:
        inner = b"".join(msgs)
        chunk = (struct.pack("<QQQI", 0, 0, len(inner), 0)
                 + _mcap_string("") + struct.pack("<Q", len(inner))
                 + inner)
        recs.append(_mcap_record(0x06, chunk))               # Chunk
    else:
        recs.extend(msgs)
    recs.append(_mcap_record(0x0F, struct.pack("<I", 0)))    # DataEnd
    recs.append(_mcap_record(0x02, struct.pack("<QQI", 0, 0, 0)))  # Footer
    with open(path, "wb") as f:
        f.write(magic + b"".join(recs) + magic)


def test_mcap_bag_roundtrip(tmp_path, rng):
    from splatloam_tpu.io.rosbag import McapBag, BagSequenceReader
    clouds, stamps = _clouds(rng)
    path = tmp_path / "seq.mcap"
    write_mcap_bag(path, clouds, stamps)
    bag = McapBag(path)
    assert bag.count_for_topic("/points") == len(clouds)
    reader = BagSequenceReader([path], "/points")
    assert reader.message_count == len(clouds)
    for (xyz, ts), ref_xyz, ref_ts in zip(reader, clouds, stamps):
        np.testing.assert_allclose(xyz, ref_xyz, atol=1e-6)
        assert abs(ts - ref_ts) < 1e-6


def test_mcap_bag_chunked(tmp_path, rng):
    from splatloam_tpu.io.rosbag import BagSequenceReader
    clouds, stamps = _clouds(rng)
    path = tmp_path / "seq.mcap"
    write_mcap_bag(path, clouds, stamps, chunked=True)
    reader = BagSequenceReader([path], "/points")
    assert reader.message_count == len(clouds)
    got = list(reader)
    assert len(got) == len(clouds)
    np.testing.assert_allclose(got[-1][0], clouds[-1], atol=1e-6)
