"""Native GeoTIFF reader/writer tests (floodplanet_code_tpu/geo)."""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from floodplanet_code_tpu.geo import tiff

pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits

REFERENCE_DATA = "/root/reference/CSDAP_complete"


def _first_reference_scene() -> str | None:
    if not os.path.isdir(REFERENCE_DATA):
        return None
    import glob

    scenes = glob.glob(os.path.join(REFERENCE_DATA, "*", "S1", "*.tif"))
    return sorted(scenes)[0] if scenes else None


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shape,dtype",
        [
            ((33, 47), np.uint8),
            ((3, 40, 50), np.uint16),
            ((7, 21, 35), np.float32),
            ((17, 19), np.int16),
            ((1, 8, 8), np.float64),
        ],
    )
    def test_write_read(self, tmp_path, shape, dtype, rng):
        if np.issubdtype(dtype, np.floating):
            arr = rng.standard_normal(shape).astype(dtype)
        else:
            arr = rng.integers(0, 100, shape).astype(dtype)
        path = str(tmp_path / "x.tif")
        tiff.imwrite(path, arr)
        back = tiff.imread(path)
        np.testing.assert_array_equal(back, arr.squeeze() if shape[0] == 1 and len(shape) == 3 else arr)

    def test_hwc_write(self, tmp_path, rng):
        hwc = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
        path = str(tmp_path / "x.tif")
        tiff.imwrite(path, hwc, planar_as_chw=False)
        back = tiff.imread(path)
        np.testing.assert_array_equal(back, np.transpose(hwc, (2, 0, 1)))


class TestWindowedRead:
    def test_window_equals_slice(self, tmp_path, rng):
        arr = rng.integers(0, 255, (5, 300, 400)).astype(np.uint8)
        path = str(tmp_path / "big.tif")
        tiff.imwrite(path, arr)
        win = tiff.read_window(path, 123, 45, 100, 222)
        np.testing.assert_array_equal(win, arr[:, 123:223, 45:267])

    def test_full_window(self, tmp_path, rng):
        arr = rng.standard_normal((2, 64, 64)).astype(np.float32)
        path = str(tmp_path / "f.tif")
        tiff.imwrite(path, arr)
        np.testing.assert_array_equal(tiff.read_window(path, 0, 0, 64, 64), arr)

    def test_out_of_bounds_raises(self, tmp_path, rng):
        arr = rng.integers(0, 9, (10, 10)).astype(np.uint8)
        path = str(tmp_path / "s.tif")
        tiff.imwrite(path, arr)
        with pytest.raises(IOError):
            tiff.read_window(path, 5, 5, 10, 10)

    def test_over_4gb_forced_classic_raises(self, tmp_path):
        # Zero-copy logical 4.9 GB canvas: with bigtiff=False the guard
        # must fire before any pixel materialization (classic TIFF offsets
        # are 32-bit). The default (bigtiff=None) instead transparently
        # writes BigTIFF — covered by TestBigTIFF without the 4.9 GB.
        big = np.broadcast_to(np.zeros((1, 1), np.uint8), (70000, 70000))
        with pytest.raises(ValueError, match="32-bit strip"):
            tiff.imwrite(str(tmp_path / "big.tif"), big, bigtiff=False)


class TestBigTIFF:
    """BigTIFF (version 43, 64-bit offsets) write + native read.

    Forced on small arrays so CI never touches 4 GB; the auto switch
    (`bigtiff=None` past 2**32 bytes) produces byte-identical structure.
    Parity target: tifffile's transparent BigTIFF handling used by the
    reference (utils/utils_image.py:530-533).
    """

    @pytest.mark.parametrize(
        "shape,dtype",
        [((33, 47), np.uint8), ((3, 40, 50), np.uint16), ((2, 21, 35), np.float32)],
    )
    def test_round_trip(self, tmp_path, shape, dtype, rng):
        if np.issubdtype(dtype, np.floating):
            arr = rng.standard_normal(shape).astype(dtype)
        else:
            arr = rng.integers(0, 100, shape).astype(dtype)
        path = str(tmp_path / "big.tif")
        tiff.imwrite(path, arr, bigtiff=True)
        with open(path, "rb") as handle:
            header = handle.read(4)
        assert struct.unpack("<H", header[2:4])[0] == 43
        np.testing.assert_array_equal(tiff.imread(path), arr)

    def test_windowed_read(self, tmp_path, rng):
        arr = rng.integers(0, 255, (4, 120, 90)).astype(np.uint8)
        path = str(tmp_path / "big.tif")
        tiff.imwrite(path, arr, bigtiff=True)
        win = tiff.read_window(path, 37, 11, 50, 60)
        np.testing.assert_array_equal(win, arr[:, 37:87, 11:71])

    def test_corrupt_tag_count_rejected(self, tmp_path, rng):
        # BigTIFF counts are u64: a crafted count of 2^61 on an 8-byte
        # type wraps esz*count to 0, which would bypass a post-multiply
        # size guard and drive a 2^61-iteration over-read. The reader
        # must bound count BEFORE multiplying and fail cleanly.
        arr = rng.integers(0, 9, (8, 8)).astype(np.uint8)
        path = str(tmp_path / "c.tif")
        tiff.imwrite(path, arr, bigtiff=True)
        with open(path, "rb") as fh:
            data = bytearray(fh.read())
        n = struct.unpack_from("<Q", data, 16)[0]
        patched = False
        for i in range(n):
            off = 24 + 20 * i
            tag, typ = struct.unpack_from("<HH", data, off)
            if tag == 273:  # StripOffsets, LONG8 (esz 8)
                struct.pack_into("<Q", data, off + 4, 1 << 61)
                patched = True
                break
        assert patched
        with open(path, "wb") as fh:
            fh.write(data)
        with pytest.raises(IOError):
            tiff.imread(path)

    @pytest.mark.slow
    def test_auto_switch_past_4gb(self, tmp_path):
        # 66000x66000 uint8 = 4.36 GB: bigtiff=None must auto-switch to
        # BigTIFF and the native reader must window-read strips that live
        # past the 4 GB offset mark. Slow lane: ~4.4 GB RSS + disk.
        h = w = 66000
        arr = np.zeros((h, w), np.uint8)
        arr[-1, -3:] = (7, 8, 9)
        path = str(tmp_path / "auto.tif")
        try:
            tiff.imwrite(path, arr)
            with open(path, "rb") as fh:
                assert struct.unpack("<H", fh.read(4)[2:4])[0] == 43
            win = tiff.read_window(path, h - 1, w - 3, 1, 3)
            np.testing.assert_array_equal(win, arr[-1:, -3:])
        finally:
            if os.path.exists(path):
                os.remove(path)

    def test_geo_tag_passthrough(self, tmp_path, rng):
        src = _first_reference_scene()
        if src is None:
            pytest.skip("reference scenes unavailable")
        arr = rng.integers(0, 2, (64, 64)).astype(np.uint8)
        path = str(tmp_path / "mask_big.tif")
        tiff.imwrite(path, arr, geo_from=src, bigtiff=True)
        with tiff.TiffFile(path) as got, tiff.TiffFile(src) as want:
            assert {t[0] for t in got.geo_tags()} == {
                t[0] for t in want.geo_tags()
            }


class TestCompression:
    @pytest.mark.parametrize(
        "compression", ["tiff_lzw", "tiff_adobe_deflate", "packbits"]
    )
    def test_pil_written_compressed(self, tmp_path, compression, rng):
        arr = rng.integers(0, 255, (137, 211)).astype(np.uint8)
        path = str(tmp_path / f"{compression}.tif")
        Image.fromarray(arr).save(path, compression=compression)
        np.testing.assert_array_equal(tiff.imread(path), arr)


class TestGeoPassthrough:
    def test_geo_tags_copied(self, tmp_path, rng):
        src_candidates = []
        if os.path.isdir(REFERENCE_DATA):
            import glob

            src_candidates = glob.glob(
                os.path.join(REFERENCE_DATA, "*", "S1", "*.tif")
            )
        if not src_candidates:
            pytest.skip("reference sample scenes unavailable")
        src = src_candidates[0]
        with tiff.TiffFile(src) as handle:
            h, w = handle.info.height, handle.info.width
            src_tags = handle.geo_tags()
        assert src_tags, "reference scene should carry geo tags"
        mask = rng.integers(0, 2, (h, w)).astype(np.uint8)
        out = str(tmp_path / "mask.tif")
        tiff.imwrite(out, mask, geo_from=src)
        with tiff.TiffFile(out) as handle:
            dst_tags = handle.geo_tags()
        assert [t[:3] for t in src_tags] == [t[:3] for t in dst_tags]
        assert all(a[3] == b[3] for a, b in zip(src_tags, dst_tags))


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA), reason="reference sample data unavailable"
)
class TestRealReferenceScenes:
    def test_label_matches_pil(self):
        import glob

        labels = sorted(
            glob.glob(os.path.join(REFERENCE_DATA, "*", "labels", "*.tif"))
        )
        assert labels
        path = labels[0]
        ours = tiff.imread(path)
        theirs = np.array(Image.open(path))
        np.testing.assert_array_equal(ours, theirs)

    def test_multiband_planar_scenes(self):
        import glob

        s1 = sorted(glob.glob(os.path.join(REFERENCE_DATA, "*", "S1", "*.tif")))
        assert s1
        img = tiff.imread(s1[0])
        nfo = tiff.info(s1[0])
        assert img.shape == (2, nfo.height, nfo.width)
        assert img.dtype == np.float32
        # windowed read consistency
        win = tiff.read_window(s1[0], 10, 20, 30, 40)
        np.testing.assert_array_equal(win, img[:, 10:40, 20:60])


class TestTiledTiff:
    def _write_tiled(self, path, arr, tile=(16, 16)):
        """Hand-assemble a minimal tiled single-band TIFF."""
        h, w = arr.shape
        th, tw = tile
        tiles_y, tiles_x = -(-h // th), -(-w // tw)
        payloads = []
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                block = np.zeros((th, tw), arr.dtype)
                ys, xs = ty * th, tx * tw
                sub = arr[ys : ys + th, xs : xs + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                payloads.append(block.tobytes())
        n = len(payloads)
        tags = []  # (tag, type, count, values)
        header_size = 8
        entry_count = 10
        ifd_size = 2 + entry_count * 12 + 4
        ext = bytearray()
        ext_base = header_size + ifd_size

        def add(tag, typ, values):
            tags.append((tag, typ, values))

        offsets_pos = []
        data_base = None

        add(256, 4, [w])
        add(257, 4, [h])
        add(258, 3, [8])
        add(259, 3, [1])
        add(262, 3, [1])
        add(277, 3, [1])
        add(322, 4, [tw])
        add(323, 4, [th])
        # tile offsets/counts appended below once layout known
        sizes = {3: 2, 4: 4}
        ext_needed = 0
        for tag, typ, values in tags:
            if len(values) * sizes[typ] > 4:
                ext_needed += len(values) * sizes[typ]
        off_array_bytes = 4 * n if n > 1 else 0
        cnt_array_bytes = 4 * n if n > 1 else 0
        data_base = ext_base + ext_needed + off_array_bytes + cnt_array_bytes
        tile_offsets = []
        acc = data_base
        for p in payloads:
            tile_offsets.append(acc)
            acc += len(p)
        add(324, 4, tile_offsets)
        add(325, 4, [len(p) for p in payloads])
        tags.sort(key=lambda t: t[0])

        out = bytearray()
        out += b"II" + struct.pack("<HI", 42, 8)
        out += struct.pack("<H", entry_count)
        ext_cursor = ext_base
        ext_data = bytearray()
        for tag, typ, values in tags:
            packed = b"".join(
                struct.pack("<H" if typ == 3 else "<I", v) for v in values
            )
            if len(packed) <= 4:
                field = packed.ljust(4, b"\x00")
            else:
                field = struct.pack("<I", ext_cursor)
                ext_data += packed
                ext_cursor += len(packed)
            out += struct.pack("<HHI", tag, typ, len(values)) + field
        out += struct.pack("<I", 0)
        out += ext_data
        assert len(out) == data_base
        for p in payloads:
            out += p
        with open(path, "wb") as fh:
            fh.write(bytes(out))

    def test_tiled_read(self, tmp_path, rng):
        arr = rng.integers(0, 255, (50, 70)).astype(np.uint8)
        path = str(tmp_path / "tiled.tif")
        self._write_tiled(path, arr)
        nfo = tiff.info(path)
        assert nfo.tile_width == 16 and nfo.tile_height == 16
        np.testing.assert_array_equal(tiff.imread(path), arr)
        win = tiff.read_window(path, 7, 9, 31, 44)
        np.testing.assert_array_equal(win, arr[7:38, 9:53])
