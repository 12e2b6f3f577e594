"""Pure-python LZ4 codec: xxh32 vectors, block/frame round trips, and an
lz4-compressed multi-chunk rosbag through the reader (the TUM-era bag
format the reference replays via roslz4, `odometry_manager.cpp:97-126`)."""

import numpy as np
import pytest

from ctrlvio_tpu.io import lz4, rosbag


def test_xxh32_known_vectors():
    assert lz4.xxh32(b"") == 0x02CC5D05
    assert lz4.xxh32(b"a") == 0x550D7456
    assert lz4.xxh32(b"abc") == 0x32D153FF
    # seed changes the hash
    assert lz4.xxh32(b"abc", seed=1) != lz4.xxh32(b"abc")
    # >16-byte path (stripe accumulator loop)
    assert lz4.xxh32(bytes(range(64))) == lz4.xxh32(bytes(range(64)))


def test_block_handcrafted():
    # literals 'abcd', then match offset 4 len 8 -> 'abcd' * 3, tail 'xyzzy'
    blk = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x50]) \
        + b"xyzzy"
    assert lz4.decompress_block(blk) == b"abcdabcdabcd" + b"xyzzy"


@pytest.mark.parametrize("data", [
    b"",
    b"short",
    b"a" * 1000,                                  # overlapping match (RLE)
    b"the quick brown fox " * 64,                 # periodic
    np.random.default_rng(0).bytes(5000),         # incompressible
    np.random.default_rng(1).bytes(200_000),      # multi-block frame
    (b"0123456789abcdef" * 5000)[:70_001],        # compressible multi-block
])
def test_block_and_frame_roundtrip(data):
    assert lz4.decompress_block(lz4.compress_block(data)) == data
    assert lz4.decompress_frame(lz4.compress_frame(data)) == data


def test_frame_detects_corruption():
    f = bytearray(lz4.compress_frame(b"hello world, hello world, hello"))
    f[12] ^= 0xFF  # flip a literal byte -> content checksum must trip
    with pytest.raises(ValueError):
        lz4.decompress_frame(bytes(f))


def test_compression_actually_compresses():
    data = b"needle in a haystack " * 400
    assert len(lz4.compress_frame(data)) < len(data) // 4


def test_lz4_bag_multichunk(tmp_path):
    """An lz4-frame-compressed, multi-chunk, image-carrying bag round-trips
    through the reader and the converter (≙ rosbag's lz4 chunk path)."""
    from tests.test_rosbag import (_image_msg, _imu_msg, write_bag_chunks)

    rng = np.random.default_rng(0)
    t0 = 1_500_000_000_000_000_000
    chunks = []
    imgs = rng.integers(0, 255, size=(3, 24, 32), dtype=np.uint8)
    img_t = []
    for c in range(3):
        msgs = []
        for k in range(10):
            t = t0 + int(5e6) * (10 * c + k)
            msgs.append((0, "/imu0", "sensor_msgs/Imu", t,
                         _imu_msg(t, [c, k, 0], [0, 0, 9.8])))
        ti = t0 + int(1e8) * c
        img_t.append(ti)
        msgs.append((1, "/cam0/image_raw", "sensor_msgs/Image", ti,
                     _image_msg(ti, imgs[c])))
        msgs.sort(key=lambda m: m[3])
        chunks.append(msgs)
    path = tmp_path / "c.bag"
    write_bag_chunks(path, chunks, compression=b"lz4")

    got = list(rosbag.read_messages(str(path)))
    assert len(got) == 33
    seq = rosbag.bag_to_sequence(str(path), "/imu0", "/cam0/image_raw")
    assert len(seq.imu_t_ns) == 30
    np.testing.assert_array_equal(seq.images, imgs)
    np.testing.assert_array_equal(seq.frame_t_ns, img_t)
