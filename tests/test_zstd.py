"""From-scratch RFC 8878 zstd codec: differential tests vs pyarrow's
bundled (C) zstd, plus real reference-mask tiles.

The reference writes its feature masks with GDAL COMPRESS=ZSTD
(reference prepare_feature_masks.py:44-45); these tests prove the
pure-Python decoder in functions/zstd.py is bit-exact on exactly that
class of data, and on adversarial fuzz covering every block/literal/
sequence-table mode pyarrow's encoder emits at levels 1..22.
"""
import glob
import random

import numpy as np
import pyarrow as pa
import pytest

from spatial_aez_ray.functions import zstd
from spatial_aez_ray.sources import geotiff


def test_store_mode_roundtrip():
    for payload in [b"", b"a", b"hello world" * 100, bytes(70000),
                    np.random.RandomState(0).bytes(200000)]:
        assert zstd.decompress(zstd.compress(payload)) == payload


def test_store_mode_decodes_with_pyarrow():
    # our store-mode frames are spec-valid: the C decoder accepts them
    payload = b"spatial" * 999
    frame = zstd.compress(payload)
    out = pa.Codec("zstd").decompress(frame, decompressed_size=len(payload))
    assert bytes(out) == payload


def test_differential_fuzz_vs_pyarrow():
    rng = random.Random(7)
    nprng = np.random.RandomState(7)
    words = [bytes([rng.randint(97, 122) for _ in range(rng.randint(2, 9))])
             for _ in range(50)]
    checked = 0
    for lvl in [1, 3, 12, 22]:
        codec = pa.Codec("zstd", compression_level=lvl)
        for trial in range(8):
            n = rng.choice([1, 7, 300, 5000, 70000, 200000])
            kind = trial % 4
            if kind == 0:
                data = nprng.randint(0, 256, n, dtype=np.uint8).tobytes()
            elif kind == 1:  # sparse mask-like (exercises RLE + long matches)
                a = np.zeros(n, np.uint8)
                a[nprng.randint(0, max(n, 1), n // 15 or 1)] = 255
                data = a.tobytes()
            elif kind == 2:  # text-like (Huffman + FSE tables)
                data = b" ".join(rng.choice(words) for _ in range(n // 5 + 1))[:n]
            else:  # periodic (repeat offsets)
                base = nprng.randint(0, 256, 97, dtype=np.uint8).tobytes()
                data = (base * (n // 97 + 1))[:n]
            comp = bytes(codec.compress(data))
            assert zstd.decompress(comp, max_output_size=len(data)) == data, \
                (lvl, trial, n, kind)
            checked += 1
    assert checked == 32


def test_zero_bit_fse_weight_tail():
    """Regression: two-symbol alphabets make the Huffman-weight FSE stream
    end in a long run of 0-bit state updates; decoding must continue at
    pos==0 until an update would overflow (not stop at pos==0)."""
    a = np.zeros(60000, np.uint8)
    a[np.random.RandomState(1).randint(0, 60000, 3000)] = 255
    data = a.tobytes()
    comp = bytes(pa.Codec("zstd", compression_level=1).compress(data))
    assert zstd.decompress(comp, max_output_size=len(data)) == data


REAL_MASKS = sorted(glob.glob("/root/reference/masks/*_1km_mask._tif"))


@pytest.mark.skipif(not REAL_MASKS, reason="reference masks not present")
def test_real_reference_mask_tiles_bit_exact():
    """Every non-sparse tile of a sample of real GDAL-written ZSTD masks
    decodes bit-identically to the C zstd decoder."""
    codec = pa.Codec("zstd")
    sample = REAL_MASKS[:3] + REAL_MASKS[len(REAL_MASKS) // 2:len(REAL_MASKS) // 2 + 2]
    tiles_checked = 0
    for path in sample:
        r = geotiff.GeoTiffReader(path)
        tile_bytes = r.tile_w * r.tile_h * r.nbits // 8
        with open(path, "rb") as f:
            for off, cnt in zip(r._offsets, r._counts):
                if not off or not cnt:
                    continue
                f.seek(off)
                raw = f.read(cnt)
                truth = bytes(codec.decompress(raw, decompressed_size=tile_bytes))
                assert zstd.decompress(raw, max_output_size=tile_bytes) == truth
                tiles_checked += 1
        r.close()
    assert tiles_checked > 20


@pytest.mark.skipif(not REAL_MASKS, reason="reference masks not present")
def test_real_mask_reads_end_to_end():
    """GeoTiffReader.read_all() on a real ZSTD mask via the codec chain:
    the Afghanistan 1 km mask popcount equals the independently-decoded
    ground truth."""
    r = geotiff.GeoTiffReader("/root/reference/masks/AFG_129_1km_mask._tif")
    assert r.compression == 50000 and r.nbits == 1
    arr = r.read_all()
    assert arr.shape == (r.height, r.width)
    assert int(arr.sum()) == 901345  # pyarrow-zstd-verified popcount
    r.close()


def test_content_checksum_verified():
    """Frames with the checksum flag carry XXH64 low-32 of the decoded
    content; the decoder verifies it and rejects corruption."""
    import struct
    payload = bytes(range(256)) * 5  # > 32 bytes: exercises the lane path
    # single-segment frame with the checksum flag: FHD 0x64 = FCS code 1
    # (2-byte content size, value+256) | single_segment | checksum
    frame = struct.pack("<I", 0xFD2FB528) + bytes([0x60 | 0x04])
    frame += struct.pack("<H", len(payload) - 256)
    frame += (1 | (0 << 1) | (len(payload) << 3)).to_bytes(3, "little")
    frame += payload
    frame += struct.pack("<I", zstd.xxh64(payload) & 0xFFFFFFFF)
    assert zstd.decompress(frame) == payload
    bad = bytearray(frame)
    bad[20] ^= 0xFF  # flip a payload byte
    with pytest.raises(zstd.ZstdError, match="checksum"):
        zstd.decompress(bytes(bad))


def test_xxh64_known_vectors():
    # public xxHash reference vectors, seed 0
    assert zstd.xxh64(b"") == 0xEF46DB3751D8E999
    assert zstd.xxh64(b"a") == 0xD24EC4F1A98C6E5B


def test_corrupt_input_raises_zstd_error_only():
    """Truncations and random byte corruptions of valid frames either
    decode (a flip can land in don't-care bits) or raise ZstdError —
    never a bare IndexError/struct.error, never an unbounded allocation
    (output capped by max_output_size)."""
    rng = random.Random(11)
    nprng = np.random.RandomState(11)
    a = np.zeros(30000, np.uint8)
    a[nprng.randint(0, 30000, 2000)] = nprng.randint(1, 255)
    data = a.tobytes()
    comp = bytearray(pa.Codec("zstd", compression_level=3).compress(data))
    for trial in range(300):
        bad = bytearray(comp)
        if trial % 2:
            bad = bad[:rng.randrange(1, len(bad))]          # truncate
        else:
            for _ in range(rng.randrange(1, 4)):            # corrupt
                bad[rng.randrange(len(bad))] ^= rng.randrange(1, 256)
        try:
            out = zstd.decompress(bytes(bad),
                                  max_output_size=len(data) + 1024)
            assert len(out) <= len(data) + 1024
        except zstd.ZstdError:
            pass
