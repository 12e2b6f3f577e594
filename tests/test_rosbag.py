"""rosbag 2.0 reader + converter tests.

The fixture below WRITES a spec-conformant rosbag V2.0 file (chunked
records, connection records, bz2-compressed variant) so the reader is
validated against the container format itself — no ROS needed. Format ref:
http://wiki.ros.org/Bags/Format/2.0 (≙ what `rosbag::Bag` emits and
`OdometryManager::LoadBag`, `odometry_manager.cpp:97-126`, consumes).
"""

import bz2
import struct

import numpy as np
import pytest

from ctrlvio_tpu.io import rosbag

_u32 = struct.Struct("<I")


def _hdr(**fields) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += _u32.pack(len(f)) + f
    return out


def _record(header: bytes, data: bytes) -> bytes:
    return _u32.pack(len(header)) + header + _u32.pack(len(data)) + data


def _time(t_ns: int) -> bytes:
    return struct.pack("<II", t_ns // 1_000_000_000, t_ns % 1_000_000_000)


def _ros_header(t_ns: int, frame_id: b"") -> bytes:
    return (_u32.pack(7) + _time(t_ns) + _u32.pack(len(frame_id)) + frame_id)


def _imu_msg(t_ns, gyro, accel) -> bytes:
    return (_ros_header(t_ns, b"imu")
            + np.zeros(4).tobytes() + np.zeros(9).tobytes()
            + np.asarray(gyro, np.float64).tobytes() + np.zeros(9).tobytes()
            + np.asarray(accel, np.float64).tobytes() + np.zeros(9).tobytes())


def _image_msg(t_ns, img: np.ndarray) -> bytes:
    h, w = img.shape
    return (_ros_header(t_ns, b"cam") + _u32.pack(h) + _u32.pack(w)
            + _u32.pack(5) + b"mono8" + b"\x00" + _u32.pack(w)
            + _u32.pack(h * w) + img.tobytes())


def _conn_record(cid, topic, msg_type) -> bytes:
    data = _hdr(topic=topic.encode(), type=msg_type.encode(),
                md5sum=b"0" * 32, message_definition=b"")
    return _record(_hdr(op=b"\x07", conn=_u32.pack(cid),
                        topic=topic.encode()), data)


def _msg_record(cid, t_ns, payload) -> bytes:
    t = struct.pack("<Q", (t_ns % 1_000_000_000) << 32 | (t_ns // 1_000_000_000))
    return _record(_hdr(op=b"\x02", conn=_u32.pack(cid), time=t), payload)


def write_bag_chunks(path, chunks, compression=b"none"):
    """chunks: list of chunk message lists [(cid, topic, type, t_ns,
    payload), ...]; every chunk re-declares the connections it uses (what
    rosbag record does, so chunks stay self-contained)."""
    blobs = []
    n_conn = set()
    for msgs in chunks:
        chunk = b""
        seen = set()
        for cid, topic, mtype, t_ns, payload in msgs:
            if cid not in seen:
                chunk += _conn_record(cid, topic, mtype)
                seen.add(cid)
                n_conn.add(cid)
            chunk += _msg_record(cid, t_ns, payload)
        raw = chunk
        if compression == b"bz2":
            raw = bz2.compress(chunk)
        elif compression == b"lz4":
            from ctrlvio_tpu.io import lz4

            raw = lz4.compress_frame(chunk)
        blobs.append((len(chunk), raw))
    with open(path, "wb") as f:
        f.write(rosbag.MAGIC)
        # bag header record (padded to 4096 with spaces, per spec)
        bh = _hdr(op=b"\x03", index_pos=struct.pack("<Q", 0),
                  conn_count=_u32.pack(len(n_conn)),
                  chunk_count=_u32.pack(len(blobs)))
        pad = 4096 - len(bh)
        f.write(_record(bh, b" " * pad))
        for size, raw in blobs:
            f.write(_record(
                _hdr(op=b"\x05", compression=compression,
                     size=_u32.pack(size)), raw))


def write_bag(path, msgs, compression=b"none"):
    """msgs: list of (cid, topic, type, t_ns, payload). One chunk."""
    write_bag_chunks(path, [msgs], compression)


@pytest.fixture
def small_bag(tmp_path):
    rng = np.random.default_rng(0)
    msgs = []
    t0 = 1_500_000_000_000_000_000
    imu_t = [t0 + int(5e6) * k for k in range(40)]
    gyros = rng.normal(size=(40, 3))
    accels = rng.normal(size=(40, 3)) + [0, 0, 9.8]
    for k, t in enumerate(imu_t):
        msgs.append((0, "/imu0", "sensor_msgs/Imu", t,
                     _imu_msg(t, gyros[k], accels[k])))
    imgs = rng.integers(0, 255, size=(2, 32, 48), dtype=np.uint8)
    img_t = [t0 + int(1e8) * k for k in range(2)]
    for k, t in enumerate(img_t):
        msgs.append((1, "/cam0/image_raw", "sensor_msgs/Image", t,
                     _image_msg(t, imgs[k])))
    msgs.sort(key=lambda m: m[3])
    path = tmp_path / "seq.bag"
    write_bag(path, msgs)
    return path, imu_t, gyros, accels, img_t, imgs


def test_read_messages_roundtrip(small_bag):
    path, imu_t, gyros, accels, img_t, imgs = small_bag
    got = list(rosbag.read_messages(str(path)))
    assert len(got) == 42
    topics = {t for t, _, _, _ in got}
    assert topics == {"/imu0", "/cam0/image_raw"}
    # bag-time field decoding
    ts = [t for _, t, _, _ in got]
    assert ts == sorted(ts)
    assert ts[0] == imu_t[0]


def test_parse_imu_and_image(small_bag):
    path, imu_t, gyros, accels, img_t, imgs = small_bag
    k = 0
    for topic, t_ns, raw, conn in rosbag.read_messages(str(path), ["/imu0"]):
        m = rosbag.parse_imu(raw)
        assert m.t_ns == imu_t[k]
        np.testing.assert_allclose(m.gyro, gyros[k])
        np.testing.assert_allclose(m.accel, accels[k])
        k += 1
    assert k == len(imu_t)
    k = 0
    for topic, t_ns, raw, conn in rosbag.read_messages(
            str(path), ["/cam0/image_raw"]):
        m = rosbag.parse_image(raw)
        assert m.t_ns == img_t[k]
        np.testing.assert_array_equal(m.image, imgs[k])
        k += 1
    assert k == 2


def test_bz2_chunk(tmp_path):
    t0 = 1_600_000_000_000_000_000
    msgs = [(0, "/imu0", "sensor_msgs/Imu", t0,
             _imu_msg(t0, [1, 2, 3], [4, 5, 6]))]
    path = tmp_path / "c.bag"
    write_bag(path, msgs, compression=b"bz2")
    got = list(rosbag.read_messages(str(path)))
    assert len(got) == 1
    m = rosbag.parse_imu(got[0][2])
    np.testing.assert_allclose(m.gyro, [1, 2, 3])


def test_bag_to_sequence(small_bag, tmp_path):
    path, imu_t, gyros, accels, img_t, imgs = small_bag
    seq = rosbag.bag_to_sequence(str(path), "/imu0", "/cam0/image_raw")
    assert len(seq.imu_t_ns) == len(imu_t)
    np.testing.assert_allclose(seq.gyro, gyros)
    assert seq.images.shape == (2, 32, 48)
    np.testing.assert_array_equal(seq.frame_t_ns, img_t)
    # npz round trip
    out = tmp_path / "seq.npz"
    rosbag.bag_to_npz(str(path), str(out), "/imu0", "/cam0/image_raw")
    from ctrlvio_tpu.io import dataset
    seq2 = dataset.load_sequence(str(out))
    np.testing.assert_array_equal(seq2.images, seq.images)
    np.testing.assert_array_equal(seq2.imu_t_ns, seq.imu_t_ns)


def test_color_and_compressed_image():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(16, 24, 3), dtype=np.uint8)
    t0 = 7**20
    raw = (_ros_header(t0 % (10**18), b"cam") + _u32.pack(16) + _u32.pack(24)
           + _u32.pack(4) + b"bgr8" + b"\x00" + _u32.pack(24 * 3)
           + _u32.pack(img.size) + img.tobytes())
    m = rosbag.parse_image(raw)
    assert m.image.shape == (16, 24)
    # compressed (png keeps grayscale exact)
    from io import BytesIO

    from PIL import Image as PILImage
    gray = np.asarray(PILImage.fromarray(img).convert("L"))
    buf = BytesIO()
    PILImage.fromarray(gray).save(buf, format="png")
    payload = buf.getvalue()
    raw_c = (_ros_header(123, b"cam") + _u32.pack(3) + b"png"
             + _u32.pack(len(payload)) + payload)
    mc = rosbag.parse_compressed_image(raw_c)
    np.testing.assert_array_equal(mc.image, gray)
