"""Int8-MXU serving path: W8A8 / W4A8 schemes pack and serve through the
quantized-compute kernels (role of the reference's int8 serving backends,
``inference/backend.py:209-650`` W8A8 entries and the triton fused
dequant-matmul family ``triton_utils/kernels.py:123``).

On CPU the kernels run their XLA reference paths — these tests pin the
wiring (kind tagging, fusion, dispatch, TP sharding), while numeric
behaviour of the Pallas kernels is pinned by the same-function TPU
parity checks in the kernels' ``*_ref`` contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoround_tpu import AutoRound
from autoround_tpu.models import llama
from autoround_tpu.ops.qmatmul_int8 import (
    pack_w8, quantize_rows, w4a8_matmul, w4a8_matmul_ref, w8a8_matmul,
    w8a8_matmul_ref)
from autoround_tpu.serve import QuantizedLlama


@pytest.fixture(scope="module")
def cfg_params():
    cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                            intermediate_size=1024, num_layers=2,
                            num_heads=4, num_kv_heads=2, rope_theta=1e4,
                            dtype=jnp.float32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _quantize(cfg, params, scheme):
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    return AutoRound((params, cfg), scheme=scheme, iters=0).quantize(ids)


class TestKernelRefs:
    def test_w8a8_ref_matches_manual(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 512), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.float32)
        wi, ws = pack_w8(w)
        y = w8a8_matmul(x, wi, ws)
        xi, xs = quantize_rows(x)
        manual = (xi.astype(np.int32) @ np.asarray(wi, np.int32).T
                  ).astype(np.float32) * np.asarray(xs)[:, None] \
            * np.asarray(ws)[None, :]
        np.testing.assert_allclose(np.asarray(y), manual, rtol=1e-5)

    def test_w8a8_close_to_dense(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 512), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.float32)
        wi, ws = pack_w8(w)
        y = np.asarray(w8a8_matmul(x, wi, ws))
        dense = np.asarray(x) @ np.asarray(w).T
        rms = np.sqrt(np.mean((y - dense) ** 2)) / np.sqrt(
            np.mean(dense ** 2))
        assert rms < 0.02, rms

    def test_w4a8_matches_its_ref(self):
        from autoround_tpu.ops.qmatmul_int8 import pack_w4_bytes
        codes = jax.random.randint(jax.random.PRNGKey(2), (256, 1024),
                                   0, 16, jnp.int32)
        scales = jax.random.uniform(jax.random.PRNGKey(3), (256, 8),
                                    jnp.float32, 0.01, 0.02)
        qw = pack_w4_bytes(codes)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 1024), jnp.float32)
        y = np.asarray(w4a8_matmul(x, qw, scales, 128))
        r = np.asarray(w4a8_matmul_ref(x, qw, scales, 128))
        np.testing.assert_allclose(y, r, rtol=1e-4, atol=1e-4)

    def test_w4a8_group256_correct(self):
        """group_size=256 must produce correct output on every backend:
        the Pallas kernel pairs byte tiles at a hard 128, so g!=128 must
        route to the (group-size-agnostic) ref path (ADVICE r4)."""
        from autoround_tpu.ops.qmatmul_int8 import pack_w4_bytes
        rng = np.random.default_rng(5)
        O, K, g = 256, 1024, 256
        codes = rng.integers(0, 16, (O, K)).astype(np.int32)
        scales = rng.uniform(0.01, 0.02, (O, K // g)).astype(np.float32)
        x = rng.normal(size=(4, K)).astype(np.float32)
        xi, xs = quantize_rows(jnp.asarray(x))
        w = (codes - 8) * np.repeat(scales, g, axis=1)
        want = (np.asarray(xi, np.float32) @ w.T) * np.asarray(xs)[:, None]
        got = np.asarray(w4a8_matmul(
            jnp.asarray(x), pack_w4_bytes(jnp.asarray(codes)),
            jnp.asarray(scales), g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_w4_bytes_pack_roundtrip(self):
        from autoround_tpu.ops.qmatmul_int8 import (pack_w4_bytes,
                                                    unpack_w4_bytes)
        codes = jax.random.randint(jax.random.PRNGKey(7), (64, 512),
                                   0, 16, jnp.int32)
        rt = unpack_w4_bytes(pack_w4_bytes(codes))
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(codes))

    def test_w4a8_ref_dequant_math(self):
        """The byte-layout ref reproduces explicit (code-8)*scale dequant
        + per-token int8 activation quantization."""
        from autoround_tpu.ops.qmatmul_int8 import pack_w4_bytes
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 16, (32, 256)).astype(np.int32)
        scales = rng.uniform(0.01, 0.02, (32, 2)).astype(np.float32)
        x = rng.normal(size=(3, 256)).astype(np.float32)
        xi, xs = quantize_rows(jnp.asarray(x))
        w = (codes - 8) * np.repeat(scales, 128, axis=1)
        want = (np.asarray(xi, np.float32) @ w.T) * np.asarray(xs)[:, None]
        got = np.asarray(w4a8_matmul_ref(
            jnp.asarray(x), pack_w4_bytes(jnp.asarray(codes)),
            jnp.asarray(scales), 128))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestEngineInt8:
    @pytest.mark.parametrize("scheme,kind", [("W8A8", "w8a8"),
                                             ("W4A8", "w4a8")])
    def test_packs_with_kind(self, cfg_params, scheme, kind):
        cfg, params = cfg_params
        res = _quantize(cfg, params, scheme)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        base = {k: v for k, v in eng.packed_kinds.items()
                if not k.endswith(("qkv", "gate_up"))}
        assert base, "nothing packed"
        assert set(base.values()) == {kind}
        # fused entries carry the same kind
        fused = {k: v for k, v in eng.packed_kinds.items()
                 if k.endswith(("qkv", "gate_up"))}
        assert fused and set(fused.values()) == {kind}

    @pytest.mark.parametrize("scheme", ["W8A8", "W4A8"])
    def test_decode_close_to_qdq_model(self, cfg_params, scheme):
        """Packed serving (dynamic int8 acts) tracks the qdq dense model."""
        cfg, params = cfg_params
        res = _quantize(cfg, params, scheme)
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 12), 0, 128)
        logits, cache = eng.prefill(ids)
        ref = llama.model_fwd(res.params, ids, cfg)[:, -1]
        rms = float(jnp.sqrt(jnp.mean((logits - ref) ** 2))
                    / jnp.sqrt(jnp.mean(ref ** 2)))
        assert rms < 0.05, rms
        # a couple of greedy decode steps stay aligned
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lg2, cache = eng.decode_step(tok, cache)
        full = jnp.concatenate([ids, tok[:, None]], axis=1)
        ref2 = llama.model_fwd(res.params, full, cfg)[:, -1]
        rms2 = float(jnp.sqrt(jnp.mean((lg2 - ref2) ** 2))
                     / jnp.sqrt(jnp.mean(ref2 ** 2)))
        assert rms2 < 0.05, rms2

    def test_generate_scan_runs_w8a8(self, cfg_params):
        cfg, params = cfg_params
        res = _quantize(cfg, params, "W8A8")
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 0, 128)
        toks = eng.generate_scan(ids, max_new_tokens=4)
        assert toks.shape == (2, 4)
        toks2 = eng.generate(ids, max_new_tokens=4)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


class TestTPInt8:
    def test_tp_w8a8_matches_single(self, cfg_params):
        from autoround_tpu.serve.tp_engine import TPQuantizedLlama
        cfg, params = cfg_params
        res = _quantize(cfg, params, "W8A8")
        eng = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        from jax.sharding import Mesh
        mesh = Mesh(devs, ("dp", "tp"))
        tp_eng = TPQuantizedLlama.from_engine(eng, mesh)
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 10), 0, 128)
        lg_tp, _ = tp_eng.prefill(ids)
        lg_1, _ = eng.prefill(ids)
        # per-shard act quantization differs from the global one; compare
        # with a tolerance scaled to the logit magnitude
        rms = float(jnp.sqrt(jnp.mean((lg_tp - lg_1) ** 2))
                    / jnp.sqrt(jnp.mean(lg_1 ** 2)))
        assert rms < 0.05, rms


class TestServeA8Mode:
    def test_from_quantize_result_serve_a8(self):
        """Opt-in throughput mode: W4A16 layers repack to the byte-pair
        int8-MXU kind; outputs stay close to exact-A16 serving."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from autoround_tpu import AutoRound
        from autoround_tpu.models import llama
        from autoround_tpu.serve import QuantizedLlama
        cfg = llama.LlamaConfig(vocab_size=128, hidden_size=1024,
                                intermediate_size=1024, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=1e4, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
        res = AutoRound((params, cfg), scheme="W4A16", iters=0,
                        donate_params=False).quantize(ids)
        exact = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64)
        a8 = QuantizedLlama.from_quantize_result(res, cfg, max_seq=64,
                                                 serve_a8=True)
        assert set(a8.packed_kinds.values()) == {"w4a8"}
        prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 128)
        le, _ = exact.prefill(prompt)
        la, _ = a8.prefill(prompt)
        le, la = np.asarray(le, np.float32), np.asarray(la, np.float32)
        denom = max(1e-6, float(np.abs(le).max()))
        assert float(np.abs(le - la).max()) / denom < 0.06
