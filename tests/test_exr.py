"""EXR reader/writer: roundtrips across compressions/dtypes, a
byte-level known-answer file built independently of the writer, and the
envmap IO integration."""

import struct
import zlib

import numpy as np
import pytest

from vqnerf_release_tpu.data.exr import (_interleave_predict,
                                         _unpredict_deinterleave,
                                         read_exr, write_exr)


@pytest.mark.parametrize("comp", ["none", "zips", "zip"])
@pytest.mark.parametrize("dtype", [np.float16, np.float32])
def test_roundtrip(tmp_path, comp, dtype):
    rs = np.random.RandomState(0)
    arr = (rs.rand(33, 17, 3) * 5).astype(np.float32)
    p = tmp_path / "t.exr"
    write_exr(str(p), arr, compression=comp, dtype=dtype)
    back = read_exr(str(p))
    np.testing.assert_array_equal(
        back, arr.astype(dtype).astype(np.float32))


def test_roundtrip_rgba_and_gray(tmp_path):
    rs = np.random.RandomState(1)
    rgba = rs.rand(8, 6, 4).astype(np.float32)
    write_exr(str(tmp_path / "a.exr"), rgba, dtype=np.float32)
    np.testing.assert_array_equal(read_exr(str(tmp_path / "a.exr")), rgba)
    gray = rs.rand(5, 7).astype(np.float32)
    write_exr(str(tmp_path / "g.exr"), gray, dtype=np.float32)
    np.testing.assert_array_equal(read_exr(str(tmp_path / "g.exr")), gray)


def test_zip_prepass_inverse():
    rs = np.random.RandomState(2)
    raw = rs.randint(0, 256, size=1001, dtype=np.uint8).tobytes()
    assert _unpredict_deinterleave(_interleave_predict(raw)) == raw


def test_known_answer_uncompressed(tmp_path):
    """A 1x2 RGB FLOAT file built byte-by-byte from the spec (not via
    write_exr): channels stored alphabetically B,G,R per scanline."""
    def attr(name, atype, payload):
        return (name.encode() + b"\x00" + atype.encode() + b"\x00"
                + struct.pack("<i", len(payload)) + payload)

    chlist = b""
    for n in ("B", "G", "R"):
        chlist += (n.encode() + b"\x00" + struct.pack("<i", 2)
                   + bytes(4) + struct.pack("<ii", 1, 1))
    chlist += b"\x00"
    box = struct.pack("<4i", 0, 0, 1, 0)  # 2 wide, 1 tall
    header = (attr("channels", "chlist", chlist)
              + attr("compression", "compression", b"\x00")
              + attr("dataWindow", "box2i", box)
              + attr("displayWindow", "box2i", box)
              + attr("lineOrder", "lineOrder", b"\x00")
              + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
              + attr("screenWindowCenter", "v2f",
                     struct.pack("<2f", 0, 0))
              + attr("screenWindowWidth", "float",
                     struct.pack("<f", 1.0))
              + b"\x00")
    # pixel (R,G,B): col0 = (1,2,3), col1 = (4,5,6); stored B row, G row,
    # R row
    data = struct.pack("<6f", 3, 6, 2, 5, 1, 4)
    chunk = struct.pack("<ii", 0, len(data)) + data
    blob = (struct.pack("<ii", 20000630, 2) + header
            + struct.pack("<Q", 8 + len(header) + 8) + chunk)
    p = tmp_path / "ka.exr"
    p.write_bytes(blob)

    img = read_exr(str(p))
    np.testing.assert_array_equal(
        img, np.asarray([[[1, 2, 3], [4, 5, 6]]], np.float32))


def test_zip_multiblock(tmp_path):
    """ZIP blocks are 16 scanlines; heights that straddle block
    boundaries must reassemble correctly."""
    rs = np.random.RandomState(3)
    arr = rs.rand(37, 4, 3).astype(np.float32)  # 3 blocks: 16+16+5
    write_exr(str(tmp_path / "z.exr"), arr, compression="zip",
              dtype=np.float32)
    np.testing.assert_array_equal(read_exr(str(tmp_path / "z.exr")), arr)


def test_read_envmap_exr(tmp_path):
    from vqnerf_release_tpu.data import io as vio
    rs = np.random.RandomState(4)
    env = rs.rand(8, 16, 3).astype(np.float32)
    write_exr(str(tmp_path / "probe.exr"), env, dtype=np.float32)
    got = vio.read_envmap(str(tmp_path / "probe.exr"))
    np.testing.assert_array_equal(got, env)
    got4 = vio.read_envmap(str(tmp_path / "probe.exr"), new_h=4)
    assert got4.shape == (4, 8, 3)
