"""Native BLOSC1/LZ4 decoder tests (reference-file interop).

The reference persists HDF5 through H5pySimple with the BLOSC filter
(`InformationForDrivingSystems.md:12-16`); this image has no blosc codec, so
`native.blosc_decompress` decodes filter-32001 chunks. We synthesize valid
BLOSC1 chunks (memcpy, stored-stream, shuffled, and real LZ4 sequences) and
check byte-exact round trips.
"""

import struct

import numpy as np
import pytest

from babelbrain_tpu.native import blosc_decompress, lz4_decompress, native_available

pytestmark = pytest.mark.skipif(
    not native_available("blosc"), reason="native toolchain unavailable"
)


def lz4_compress_literals(data: bytes) -> bytes:
    """Minimal valid LZ4 block: one all-literals sequence."""
    n = len(data)
    out = bytearray()
    if n < 15:
        out.append(n << 4)
    else:
        out.append(0xF0)
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data
    return bytes(out)


def lz4_compress_rle(byte: int, n: int) -> bytes:
    """LZ4 block encoding n copies of one byte via an overlapping match."""
    assert n >= 5
    mlen = n - 1 - 4  # stored minus the 4-byte minimum
    out = bytearray()
    token_m = min(mlen, 15)
    out.append((1 << 4) | token_m)
    out.append(byte)  # 1 literal
    out += struct.pack("<H", 1)  # offset 1 -> RLE
    if token_m == 15:
        rem = mlen - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    return bytes(out)


def make_blosc_chunk(payload: bytes, typesize: int, blocksize: int,
                     shuffle: bool, codec_blocks) -> bytes:
    """Assemble a BLOSC1 chunk; codec_blocks(block)->list of stream bytes."""
    nbytes = len(payload)
    nblocks = (nbytes + blocksize - 1) // blocksize
    flags = (1 << 5) | (0x1 if shuffle else 0)
    blocks = []
    for j in range(nblocks):
        blk = payload[j * blocksize : j * blocksize + blocksize]
        if shuffle and typesize > 1 and len(blk) % typesize == 0:
            a = np.frombuffer(blk, np.uint8).reshape(-1, typesize)
            blk = a.T.tobytes()
        blocks.append(codec_blocks(blk))
    header = bytes([2, 1, flags, typesize]) + struct.pack(
        "<III", nbytes, blocksize, 0
    )
    bstart_pos = 16 + 4 * nblocks
    bstarts, body = [], b""
    for streams in blocks:
        bstarts.append(bstart_pos + len(body))
        for raw, stored in streams:
            body += struct.pack("<i", len(stored)) + stored
    chunk = header + struct.pack(f"<{nblocks}I", *bstarts) + body
    # patch cbytes
    return chunk[:12] + struct.pack("<I", len(chunk)) + chunk[16:]


def test_lz4_literals_roundtrip():
    data = bytes(range(256)) * 3
    assert lz4_decompress(lz4_compress_literals(data), len(data)) == data


def test_lz4_rle_roundtrip():
    data = b"\x7f" * 1000
    assert lz4_decompress(lz4_compress_rle(0x7F, 1000), 1000) == data


def test_memcpy_chunk():
    payload = np.arange(100, dtype=np.float64).tobytes()
    chunk = bytes([2, 1, 0x2, 8]) + struct.pack(
        "<III", len(payload), len(payload), 16 + len(payload)
    ) + payload
    assert blosc_decompress(chunk) == payload


def test_stored_streams_no_shuffle():
    payload = np.random.default_rng(0).bytes(1024)
    chunk = make_blosc_chunk(
        payload, typesize=8, blocksize=256, shuffle=False,
        codec_blocks=lambda blk: [(blk, blk)],  # cbytes==neblock -> stored raw
    )
    assert blosc_decompress(chunk) == payload


def test_split_streams_with_shuffle_lz4():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 50, 512, dtype=np.uint8).tobytes()
    typesize = 4

    def enc(blk):
        per = len(blk) // typesize
        return [
            (s, lz4_compress_literals(s))
            for s in (blk[i * per : (i + 1) * per] for i in range(typesize))
        ]

    chunk = make_blosc_chunk(payload, typesize, 256, True, enc)
    assert blosc_decompress(chunk) == payload


def test_uneven_last_block():
    payload = np.random.default_rng(2).bytes(700)  # 256+256+188
    chunk = make_blosc_chunk(
        payload, typesize=1, blocksize=256, shuffle=False,
        codec_blocks=lambda blk: [(blk, lz4_compress_literals(blk))],
    )
    assert blosc_decompress(chunk) == payload


def test_reference_calibration_data_loaded():
    # the extracted Pichardo map (decoded with this decoder) is sane
    from babelbrain_tpu.materials.ct_mapping import _pichardo_map

    rho, fmhz, sos, att = _pichardo_map()
    assert np.all(np.diff(rho) > 0) and np.all(np.diff(fmhz) > 0)
    assert 1000 < sos.min() < sos.max() < 5000
    assert 0 < att.min() < att.max() < 1000


class TestBloscEncoder:
    """Native BLOSC1/LZ4 *encoder* (`native.blosc_compress`): output must
    follow c-blosc 1.x layout rules (shuffle + per-typesize stream split)
    so the reference's stock readers decode it; round-tripped through the
    decoder already validated against reference-produced chunks."""

    def test_round_trip_dtypes(self):
        from babelbrain_tpu.native import blosc_compress

        rng = np.random.default_rng(3)
        cases = [
            (rng.normal(size=(32, 33, 17)).astype(np.float32) * 50).round(2),
            np.arange(123457, dtype=np.uint32),
            rng.integers(0, 9, (64, 64), dtype=np.uint8),
            np.zeros(100000, np.float64),
            np.array([], np.float32),
            np.array([1.5], np.float32),
        ]
        for arr in cases:
            raw = arr.tobytes()
            chunk = blosc_compress(raw, typesize=arr.dtype.itemsize)
            assert blosc_decompress(chunk) == raw

    def test_compresses_structured_data(self):
        from babelbrain_tpu.native import blosc_compress

        arr = np.arange(250000, dtype=np.float32)  # ramp: shuffle-friendly
        chunk = blosc_compress(arr.tobytes(), typesize=4)
        assert len(chunk) < arr.nbytes / 10

    def test_h5_blosc_write_read(self, tmp_path):
        from babelbrain_tpu.pipeline.io import load_dict_h5, save_dict_h5

        rng = np.random.default_rng(1)
        d = {
            "p_amp": rng.normal(size=(30, 31, 32)).astype(np.float32),
            "MaterialMap": rng.integers(0, 9, (30, 31, 32)).astype(np.uint32),
            "x_vec": np.arange(300.0),
            "scalar": 2.5,
        }
        p = str(tmp_path / "blosc.h5")
        save_dict_h5(d, p, compression="blosc")
        back = load_dict_h5(p)
        for k in ("p_amp", "MaterialMap", "x_vec"):
            np.testing.assert_array_equal(back[k], d[k])
        assert back["scalar"] == 2.5
        # the dataset genuinely carries filter 32001
        import h5py

        with h5py.File(p, "r") as f:
            dcpl = f["p_amp"].id.get_create_plist()
            assert dcpl.get_filter(0)[0] == 32001


def test_async_saver_waits_and_reraises(tmp_path):
    """FileManager-style background saves (`BabelBrain/FileManager.py:127-152`):
    submissions return immediately, wait() joins and surfaces errors."""
    import numpy as np
    from babelbrain_tpu.pipeline.io import AsyncSaver, load_dict_h5

    p1 = str(tmp_path / "a.h5")
    with AsyncSaver() as s:
        s.save_dict_h5({"x": np.arange(5)}, p1)
        s.save_nifti(str(tmp_path / "b.nii.gz"),
                     np.zeros((4, 4, 4), np.float32), np.eye(4))
        s.wait(p1)
        assert np.array_equal(np.asarray(load_dict_h5(p1)["x"]), np.arange(5))
    import os
    assert os.path.isfile(str(tmp_path / "b.nii.gz"))

    s2 = AsyncSaver()
    s2.save_dict_h5({"x": np.arange(3)}, "/nonexistent-dir/zz/c.h5")
    import pytest
    with pytest.raises(Exception):
        s2.wait()
