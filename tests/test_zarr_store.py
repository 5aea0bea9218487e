"""zarr v2 / Blosc / LZ4 interop layer tests (data/zarr_store.py).

The reference persists preprocessing caches through zarr + Blosc(lz4,
BITSHUFFLE) (reference datasets/__main__.py:161-242, corpus_loading.py:143-162);
zarr/blosc are absent from this image, so the codecs here are validated against
scalar oracle implementations of the published formats plus round-trips, and
the store layer against the reference's documented layout. A differential
check against a real zarr/blosc build is queued for artifacts day."""

import numpy as np
import pytest

from allophant_tpu.data import zarr_store as zs


def _random_bytes(rng, size, repetitive=False) -> bytes:
    if repetitive:
        base = rng.integers(0, 8, size // 4 + 1, dtype=np.uint8).tobytes()
        return (base * 4)[:size]
    return rng.integers(0, 256, size, dtype=np.uint8).tobytes()


class TestLz4:
    def test_known_literal_only_block(self):
        # Token 0x50: 5 literals, final sequence (no match).
        assert zs.lz4_decompress_block(b"\x50hello", 5) == b"hello"

    def test_known_match_block(self):
        # "abcd" literals then an 8-byte match at offset 4 -> "abcd" * 3,
        # followed by the mandatory trailing literal-only sequence "tail5".
        block = b"\x44abcd\x04\x00" + b"\x50tail5"
        assert zs.lz4_decompress_block(block, 17) == b"abcdabcdabcdtail5"

    def test_overlapping_match_rle(self):
        # Offset 1 match replicates the previous byte (RLE semantics).
        block = b"\x1b" + b"a" + b"\x01\x00" + b"\x50bcdef"
        assert zs.lz4_decompress_block(block, 21) == b"a" * 16 + b"bcdef"

    @pytest.mark.parametrize("size", [0, 1, 13, 100, 5000])
    @pytest.mark.parametrize("repetitive", [False, True])
    def test_round_trip(self, size, repetitive):
        rng = np.random.default_rng(size + repetitive)
        data = _random_bytes(rng, size, repetitive)
        assert zs.lz4_decompress_block(zs.lz4_compress_block(data), size) == data

    def test_compresses_repetitive_data(self):
        data = b"0123456789abcdef" * 400
        assert len(zs.lz4_compress_block(data)) < len(data) // 4

    @pytest.mark.parametrize("use_native", [True, False])
    def test_malformed_blocks_rejected(self, monkeypatch, use_native):
        """Both decoders reject corrupt blocks (out-of-range match offsets,
        literal overruns) instead of silently decoding garbage — the fallback
        must share the native decoder's malformed-input contract."""
        if not use_native:
            monkeypatch.setattr(zs, "_NATIVE_LZ4", None)
            monkeypatch.setattr(zs, "_NATIVE_LZ4_FAILED", True)
        elif zs._native_lz4() is None:
            pytest.skip("native decoder unavailable")
        # Match offset 10 with only 4 bytes decoded so far.
        bad_offset = b"\x44abcd\x0a\x00" + b"\x50tail5"
        with pytest.raises(ValueError):
            zs.lz4_decompress_block(bad_offset, 17)
        # Literal run longer than the remaining input.
        truncated_literals = b"\xf0\x20abc"
        with pytest.raises(ValueError):
            zs.lz4_decompress_block(truncated_literals, 100)
        # Match run overflowing the declared output size.
        overflow = b"\x4fabcd\x04\x00\xff\x10" + b"\x50tail5"
        with pytest.raises(ValueError):
            zs.lz4_decompress_block(overflow, 12)

    def test_native_decoder_active_and_matches_python_fallback(self, monkeypatch):
        """The C++ decoder (native/src/lz4_codec.cpp) must be in use — silent
        fallback would hide native regressions — and agree byte-for-byte with
        the pure-Python implementation on the same blocks."""
        assert zs._native_lz4() is not None, "native lz4 decoder failed to build"
        rng = np.random.default_rng(5)
        blocks = [
            zs.lz4_compress_block(_random_bytes(rng, size, repetitive))
            for size in (0, 7, 500, 20_000)
            for repetitive in (False, True)
        ]
        sizes = [0, 0, 7, 7, 500, 500, 20_000, 20_000]
        native = [zs.lz4_decompress_block(block, size) for block, size in zip(blocks, sizes)]
        monkeypatch.setattr(zs, "_NATIVE_LZ4", None)
        monkeypatch.setattr(zs, "_NATIVE_LZ4_FAILED", True)
        python = [zs.lz4_decompress_block(block, size) for block, size in zip(blocks, sizes)]
        assert native == python


class TestShuffles:
    @pytest.mark.parametrize("typesize", [1, 2, 4, 8])
    @pytest.mark.parametrize("size", [0, 64, 256, 1000])
    def test_byte_shuffle_round_trip(self, typesize, size):
        rng = np.random.default_rng(typesize * 1000 + size)
        data = _random_bytes(rng, size)
        assert zs.byte_unshuffle(zs.byte_shuffle(data, typesize), typesize) == data

    def test_byte_shuffle_planes(self):
        # Elements [0x0102, 0x0304] (<u2 little endian: 02 01 04 03) shuffle to
        # low-byte plane then high-byte plane.
        data = np.array([0x0102, 0x0304], "<u2").tobytes()
        assert zs.byte_shuffle(data, 2) == bytes([0x02, 0x04, 0x01, 0x03])

    @staticmethod
    def _scalar_bitshuffle(data: bytes, typesize: int) -> bytes:
        """Direct transcription of bitshuffle's scalar reference
        (bshuf_trans_bit_elem_scal: byte transpose, then per byte-plane an
        LSB-first bit transpose over groups of 8 elements)."""
        n = len(data) // typesize
        out = bytearray()
        for plane_index in range(typesize):
            plane = [data[j * typesize + plane_index] for j in range(n)]
            for bit in range(8):
                for group in range(n // 8):
                    value = 0
                    for k in range(8):
                        value |= ((plane[group * 8 + k] >> bit) & 1) << k
                    out.append(value)
        return bytes(out)

    @pytest.mark.parametrize("typesize", [1, 2, 4, 8])
    def test_bit_shuffle_matches_scalar_oracle(self, typesize):
        rng = np.random.default_rng(typesize)
        data = _random_bytes(rng, 64 * typesize)
        assert zs.bit_shuffle(data, typesize) == self._scalar_bitshuffle(data, typesize)

    @pytest.mark.parametrize("typesize", [1, 4, 8])
    @pytest.mark.parametrize("size_elems", [0, 8, 64, 100])
    def test_bit_shuffle_round_trip_with_tail(self, typesize, size_elems):
        # Non-multiple-of-8 element counts exercise the copied tail.
        rng = np.random.default_rng(typesize * 17 + size_elems)
        data = _random_bytes(rng, size_elems * typesize)
        assert zs.bit_unshuffle(zs.bit_shuffle(data, typesize), typesize) == data


class TestBloscFrames:
    def test_memcpy_round_trip(self):
        data = b"some raw uncompressed bytes" * 3
        frame = zs.blosc_compress_memcpy(data, 4)
        assert zs.blosc_decompress(frame) == data

    @pytest.mark.parametrize("shuffle", [0, 1, 2])
    @pytest.mark.parametrize("typesize", [4, 8])
    def test_lz4_round_trip(self, shuffle, typesize):
        rng = np.random.default_rng(shuffle * 10 + typesize)
        data = _random_bytes(rng, 40_000, repetitive=True)
        frame = zs.blosc_compress_lz4(data, typesize, shuffle)
        assert zs.blosc_decompress(frame) == data

    def test_multi_block_with_leftover(self):
        rng = np.random.default_rng(0)
        data = _random_bytes(rng, 10_000, repetitive=True)
        # Small blocksize forces several blocks plus a smaller leftover block.
        frame = zs.blosc_compress_lz4(data, 8, shuffle=1, blocksize=4096)
        assert zs.blosc_decompress(frame) == data

    def test_split_streams_path(self):
        # typesize 8 <= MAX_SPLITS and blocksize/typesize >= 128 with
        # byteshuffle -> typesize-split streams (the zarr default-compressor
        # layout for int64 lengths).
        data = np.arange(4096, dtype="<i8").tobytes()
        frame = zs.blosc_compress_lz4(data, 8, shuffle=1, blocksize=8192)
        assert zs.blosc_decompress(frame) == data

    def test_incompressible_streams_stored_raw(self):
        rng = np.random.default_rng(1)
        data = _random_bytes(rng, 9000)  # random: lz4 cannot compress
        frame = zs.blosc_compress_lz4(data, 4, shuffle=0)
        assert zs.blosc_decompress(frame) == data


class TestVlenArray:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        items = [rng.standard_normal(n).astype("<f4") for n in (3, 0, 17, 1)]
        encoded = zs.vlen_array_encode(items, np.dtype("<f4"))
        decoded = zs.vlen_array_decode(encoded, np.dtype("<f4"))
        assert len(decoded) == len(items)
        for ours, theirs in zip(decoded, items):
            np.testing.assert_array_equal(ours, theirs)

    def test_layout_is_numcodecs_vlen_array(self):
        # Header: item count <u4; per item: byte length <u4 + raw bytes.
        items = [np.array([1.5], "<f4"), np.zeros(0, "<f4")]
        encoded = zs.vlen_array_encode(items, np.dtype("<f4"))
        assert encoded[:4] == np.uint32(2).tobytes()
        assert encoded[4:8] == np.uint32(4).tobytes()
        assert encoded[8:12] == np.array([1.5], "<f4").tobytes()
        assert encoded[12:16] == np.uint32(0).tobytes()


class TestZarrArrays:
    def test_plain_array_round_trip(self, tmp_path):
        writer = zs.ZarrDirectoryWriter(str(tmp_path))
        values = np.arange(1300, dtype="<i8") * 7
        writer.write_plain("train/es", "lengths", values, chunk_size=512)
        read = zs.read_array(str(tmp_path / "train" / "es" / "lengths"))
        np.testing.assert_array_equal(read, values)

    def test_vlen_array_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        writer = zs.ZarrDirectoryWriter(str(tmp_path))
        items = [rng.standard_normal(rng.integers(0, 50)).astype("<f4") for _ in range(700)]
        writer.write_vlen("train/es", "features", items, chunk_size=512)
        read = zs.read_array(str(tmp_path / "train" / "es" / "features"))
        assert len(read) == len(items)
        for ours, theirs in zip(read, items):
            np.testing.assert_array_equal(ours, theirs)

    def test_reads_reference_compression_settings(self, tmp_path):
        """A store whose chunks use the reference's exact codec settings —
        features: Blosc lz4 + BITSHUFFLE over vlen float32; lengths: the zarr
        default Blosc lz4 + byte-SHUFFLE over int64 (split streams)."""
        import json
        import os

        rng = np.random.default_rng(3)
        group = tmp_path / "dev" / "de"
        features_dir = group / "features"
        lengths_dir = group / "lengths"
        os.makedirs(features_dir)
        os.makedirs(lengths_dir)
        items = [rng.standard_normal(rng.integers(1, 80) * 4).astype("<f4") for _ in range(40)]
        payload = zs.vlen_array_encode(items, np.dtype("<f4"))
        with open(features_dir / ".zarray", "w") as file:
            json.dump(
                {
                    "zarr_format": 2, "shape": [40], "chunks": [40], "dtype": "|O",
                    "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 2, "blocksize": 0},
                    "fill_value": 0, "order": "C",
                    "filters": [{"id": "vlen-array", "dtype": "<f4"}],
                },
                file,
            )
        with open(features_dir / "0", "wb") as file:
            file.write(zs.blosc_compress_lz4(payload, 1, shuffle=2))

        lengths = np.asarray([item.size // 4 for item in items], "<i8")
        with open(lengths_dir / ".zarray", "w") as file:
            json.dump(
                {
                    "zarr_format": 2, "shape": [40], "chunks": [40], "dtype": "<i8",
                    "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "blocksize": 0},
                    "fill_value": 0, "order": "C", "filters": None,
                },
                file,
            )
        with open(lengths_dir / "0", "wb") as file:
            file.write(zs.blosc_compress_lz4(lengths.tobytes(), 8, shuffle=1))

        read_features = zs.read_array(str(features_dir))
        for ours, theirs in zip(read_features, items):
            np.testing.assert_array_equal(ours, theirs)
        np.testing.assert_array_equal(zs.read_array(str(lengths_dir)), lengths)


class TestPreprocessedStoreInterop:
    def _build_store(self, root, feature_size=3):
        rng = np.random.default_rng(0)
        writer = zs.ZarrDirectoryWriter(str(root))
        writer.write_attrs("", {"feature_size": feature_size})
        expected = {}
        for split in ("train", "dev"):
            expected[split] = {}
            for language in ("es", "it"):
                frames = rng.integers(2, 9, size=5)
                features = [
                    rng.standard_normal(int(n) * feature_size).astype("<f4") for n in frames
                ]
                writer.write_vlen(f"{split}/{language}", "features", features)
                writer.write_plain(
                    f"{split}/{language}", "lengths", frames.astype("<i8")
                )
                expected[split][language] = (frames, features)
        return expected

    def test_read_preprocessed_layout(self, tmp_path):
        expected = self._build_store(tmp_path)
        data = zs.read_preprocessed_zarr(
            str(tmp_path), {"train": ["es", "it"], "dev": ["es"]}, lengths_only=False
        )
        train_lengths = np.concatenate(
            [expected["train"]["es"][0], expected["train"]["it"][0]]
        )
        np.testing.assert_array_equal(data["train"].lengths, train_lengths)
        assert len(data["train"].features) == 10
        first = expected["train"]["es"][1][0].reshape(-1, 3)
        np.testing.assert_array_equal(data["train"].features[0], first)
        assert data["dev"].lengths.size == 5

    def test_auto_detection_through_store_api(self, tmp_path):
        """store.preprocessed_features_or_lengths routes zarr-layout caches
        (detected by .zgroup) through the interop reader — the production
        train/predict `-f`/`-l` flags then accept a reference user's cache."""
        from allophant_tpu.data.store import preprocessed_features_or_lengths

        expected = self._build_store(tmp_path)
        data = preprocessed_features_or_lengths(
            str(tmp_path), {"dev": ["es", "it"]}, lengths_only=True
        )
        np.testing.assert_array_equal(
            data["dev"].lengths,
            np.concatenate([expected["dev"]["es"][0], expected["dev"]["it"][0]]),
        )
