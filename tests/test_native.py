"""Native packing library: parity with the numpy/jax reference packers."""

import numpy as np
import pytest

from autoround_tpu.export.packing import pack_rows as np_pack
from autoround_tpu.export.packing import unpack_rows as np_unpack
from autoround_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


class TestNativeParity:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_pack_rows_matches_numpy(self, lib, bits):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 2 ** bits, (64, 256), dtype=np.uint8)
        np.testing.assert_array_equal(native.pack_rows(codes, bits),
                                      np_pack(codes, bits))

    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_unpack_roundtrip(self, lib, bits):
        rng = np.random.default_rng(1)
        codes = rng.integers(0, 2 ** bits, (16, 200), dtype=np.uint8)
        words = native.pack_rows(codes, bits)
        out = native.unpack_rows(words, bits, 200)
        np.testing.assert_array_equal(out, codes)

    def test_pack_w4_planes_matches_jax(self, lib):
        rng = np.random.default_rng(2)
        codes = rng.integers(0, 16, (32, 2048), dtype=np.uint8)
        got = native.pack_w4_planes_np(codes, 128)
        import jax.numpy as jnp
        from autoround_tpu.ops.qmatmul import pack_w4_planes
        want = np.asarray(pack_w4_planes(jnp.asarray(codes.astype(np.int32)),
                                         128))
        np.testing.assert_array_equal(got, want)

    def test_gptq_qweight_matches(self, lib):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 16, (32, 256), dtype=np.uint8)
        out = np.empty((256 * 4 // 32, 32), np.int32)
        lib.pack_gptq_qweight(np.ascontiguousarray(codes), 32, 256, 4, out)
        want = np_pack(codes, 4).T
        np.testing.assert_array_equal(out, np.ascontiguousarray(want))

    def test_large_throughput_sane(self, lib):
        import time
        rng = np.random.default_rng(4)
        codes = rng.integers(0, 16, (4096, 4096), dtype=np.uint8)
        t0 = time.perf_counter()
        native.pack_rows(codes, 4)
        dt = time.perf_counter() - t0
        assert dt < 2.0  # 16M codes well under 2 s
